package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}
import graft.text.TextAnalysisQueries.{cleanTokens, countIn, qualityScore, qualityScoreCte, stopList}

/** Classifier-evaluation metrics for the training-data pipeline: once a
  * corpus is scored (quality, language), the pipeline needs to know how
  * good the scorer IS before gating data on it — ROC-AUC, a calibration
  * (reliability) table, and inter-rater agreement (Cohen's kappa).
  *
  * Scale discipline shared by all three: the corpus is touched once by a
  * pure narrow scoring scan; everything downstream operates on a BOUNDED
  * relation (distinct 6-dp scores <= 1e6+1, calibration bins <= 11, a 2x2
  * confusion table), so the exact pairwise AUC join and all divisions are
  * constant-cost at any corpus size. All counts are exact integers; the
  * only float steps are final divisions on identical IEEE operand orders,
  * rounded to 6 — the same cross-engine determinism contract as the rest
  * of the surface.
  */
object EvalQueries extends QueryPack {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** The langid heuristic's english-vote (text_langid's 0.15 threshold). */
  private def predEn: Column = {
    val toks = cleanTokens(col("text"))
    countIn(toks, Stopwords.reachable.filter(_.nonEmpty)).cast("double") /
      size(toks) >= 0.15
  }

  /** (gold binary label, quality score) — the scoring scan all three
    * metrics start from: is quality_score a good English detector?
    */
  private def labeled(s: SparkSession, d: String): DataFrame =
    docs(s, d).select((col("lang") === "en").as("y"),
      qualityScore.as("sc"), predEn.as("pred_en"))

  /** Exact Mann-Whitney ROC-AUC over a (y: boolean, sc) relation — public
    * so specs can feed planted score distributions.
    */
  def aucOf(lab: DataFrame): DataFrame = {
    val g = lab
      .groupBy(col("sc"))
      .agg(count(when(col("y"), 1)).as("p"),
        count(when(!col("y"), 1)).as("n"))
      .transform(graft.CacheScope.persisted(_))
    val conc = g.select(col("sc").as("sa"), col("p").as("pa"))
      .join(broadcast(g.select(col("sc").as("sb"), col("n").as("nb"))),
        col("sa") > col("sb"))
      .agg(coalesce(sum(col("pa") * col("nb")), lit(0L)).as("c"))
    val ties = g.agg(coalesce(sum(col("p") * col("n")), lit(0L)).as("t"))
    val tot = g.agg(sum(col("p")).as("np"), sum(col("n")).as("nn"),
      count(lit(1)).as("n_scores"))
    tot.crossJoin(broadcast(conc)).crossJoin(broadcast(ties))
      .select(col("np").as("n_pos"), col("nn").as("n_neg"),
        col("n_scores"),
        round((col("c").cast("double") +
          lit(0.5) * col("t").cast("double")) /
          (col("np").cast("double") * col("nn").cast("double")), 6)
          .as("auc"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact ROC-AUC of quality_score against the gold language label,
    // by the Mann-Whitney pair count: AUC = (#(pos > neg) + 0.5 * ties)
    // / (P * N). No global rank window (banned at scale): per-score
    // (p, n) counts are one bounded-output shuffle, and the pairwise
    // count is an inequality join over that bounded relation with the
    // smaller side broadcast — the Skyline prefix-max pattern.
    "text_eval_auc" -> ((s, d) => aucOf(labeled(s, d))),

    // DeLong variance of the AUC — the error bar that turns "AUC 0.71"
    // into "AUC 0.71 ± 0.02", i.e. whether two model versions actually
    // differ. The structural components ride the SAME bounded per-score
    // relation as text_eval_auc: every positive at score s shares the
    // placement V10(s) = (#neg below + ½·#neg tied)/N, so the variance
    // over positives is a p(s)-weighted sum over score buckets — two
    // more triangular broadcast joins (cum-below / cum-above), never a
    // global rank window. Placements and the AUC are 9dp-pinned into
    // DECIMAL before the squared-deviation sums, so the variance
    // arithmetic is exact and identical across engines; doubles appear
    // only in the final sqrt/ratios.
    "text_eval_auc_delong" -> ((s, d) => {
      val lab = labeled(s, d)
      val g = lab.groupBy(col("sc"))
        .agg(count(when(col("y"), 1)).as("p"),
          count(when(!col("y"), 1)).as("n"))
        .transform(graft.CacheScope.persisted(_))
      def cum(v: String, lower: Boolean, as: String) = {
        val cond = if (lower) col("sb") < col("sa") else col("sb") > col("sa")
        g.select(col("sc").as("sa"))
          .join(broadcast(g.select(col("sc").as("sb"), col(v).as("v"))),
            cond, "left")
          .groupBy(col("sa"))
          .agg(coalesce(sum(col("v")), lit(0L)).as(as))
      }
      val conc = g.select(col("sc").as("sa"), col("p").as("pa"))
        .join(broadcast(g.select(col("sc").as("sb"), col("n").as("nb"))),
          col("sa") > col("sb"))
        .agg(coalesce(sum(col("pa") * col("nb")), lit(0L)).as("c"))
      val ties = g.agg(coalesce(sum(col("p") * col("n")), lit(0L)).as("t"))
      val tot = g.agg(sum(col("p")).as("np"), sum(col("n")).as("nn"))
      val dec9 = DecimalType(10, 9)
      val base = tot.crossJoin(broadcast(conc)).crossJoin(broadcast(ties))
        .withColumn("auc9",
          round((col("c").cast("double") + lit(0.5) * col("t").cast("double")) /
            (col("np").cast("double") * col("nn").cast("double")), 9).cast(dec9))
      val per = g
        .join(cum("n", lower = true, "cn"), col("sc") === col("sa")).drop("sa")
        .join(cum("p", lower = false, "cp"), col("sc") === col("sa")).drop("sa")
        .crossJoin(broadcast(base))
        .select(col("p"), col("n"), col("np"), col("nn"), col("c"), col("t"),
          col("auc9"),
          round((col("cn").cast("double") + lit(0.5) * col("n")) /
            col("nn").cast("double"), 9).cast(dec9).as("v10"),
          round((col("cp").cast("double") + lit(0.5) * col("p")) /
            col("np").cast("double"), 9).cast(dec9).as("v01"))
      per.agg(min(col("np")).as("np"), min(col("nn")).as("nn"),
          min(col("c")).as("c"), min(col("t")).as("t"),
          min(col("auc9")).as("auc9"),
          sum((col("v10") - col("auc9")) * (col("v10") - col("auc9")) *
            col("p").cast(DecimalType(7, 0))).as("sum10"),
          sum((col("v01") - col("auc9")) * (col("v01") - col("auc9")) *
            col("n").cast(DecimalType(7, 0))).as("sum01"))
        .select(col("np").as("n_pos"), col("nn").as("n_neg"),
          round((col("c").cast("double") + lit(0.5) * col("t").cast("double")) /
            (col("np").cast("double") * col("nn").cast("double")), 6).as("auc"),
          col("auc9").cast("double").as("auc9d"),
          sqrt(col("sum10").cast("double") /
              ((col("np") - 1).cast("double") * col("np").cast("double")) +
            col("sum01").cast("double") /
              ((col("nn") - 1).cast("double") * col("nn").cast("double")))
            .as("se0"))
        .select(col("n_pos"), col("n_neg"), col("auc"),
          round(col("se0"), 6).as("auc_se"),
          round((col("auc9d") - lit(0.5)) / col("se0"), 4).as("z_vs_half"),
          round(col("auc") - lit(1.96) * col("se0"), 6).as("ci_lo"),
          round(col("auc") + lit(1.96) * col("se0"), 6).as("ci_hi"))
    }),

    // Average precision (area under the precision-recall curve, step
    // interpolation) — the ranking metric that, unlike AUC, collapses
    // under class imbalance exactly when a curation gate would: at a 1%
    // positive rate an AUC of 0.95 can hide a precision of 0.1 at every
    // usable threshold. AP = Σ_buckets (p_b / P) · precision@(score >= b),
    // computed tie-safely over the SAME bounded per-score relation as
    // text_eval_auc: cumulative counts come from the triangular
    // broadcast join (b.sc >= a.sc) — never an unpartitioned window —
    // per-bucket contributions are round(,9)-pinned into exact DECIMAL,
    // and only the final /P runs in double.
    "text_eval_avgprec" -> ((s, d) => avgPrecOf(labeled(s, d))),

    // Expected calibration error over the same decile bins as
    // text_eval_calibration — the one-number summary of "is 0.8 really
    // 80%". Because the quality score is 6dp-pinned, conf and accuracy
    // share the integer-scaled form |p_b·10⁶ − Σs6_b|, so
    // ECE = Σ_b |·| / (N·10⁶) is EXACT integers until one final
    // division; MCE is the max over ≤ 11 bins of per-bin exact ratios.
    // One bounded aggregation.
    "text_eval_ece" -> ((s, d) => {
      val lab = labeled(s, d).select(col("y"),
        round(col("sc") * lit(1000000.0), 0).cast("long").as("s6"),
        floor(col("sc") * 10).cast("int").as("bin"))
      val b = lab.groupBy("bin")
        .agg(count(lit(1)).as("nb"),
          sum(when(col("y"), 1L).otherwise(0L)).as("pb"),
          sum(col("s6")).as("sb"))
      b.agg(count(lit(1)).as("n_bins"), sum(col("nb")).as("n"),
          sum(abs(col("pb") * lit(1000000L) - col("sb"))).as("num"),
          max(abs(col("pb") * lit(1000000L) - col("sb")).cast("double") /
            (col("nb").cast("double") * lit(1000000.0))).as("mce0"))
        .select(col("n_bins"), col("n"),
          round(col("num").cast("double") /
            (col("n").cast("double") * lit(1000000.0)), 6).as("ece"),
          round(col("mce0"), 6).as("mce"))
    }),

    // Brier score with the Murphy decomposition (reliability −
    // resolution + uncertainty): the proper-scoring-rule view of the
    // same calibration question. The raw score is exact integers
    // ((s6 − y·10⁶)² summed as DECIMAL) over one scan; the
    // decomposition terms are per-bin exact ratios 12dp-pinned before
    // the ≤ 11-element decimal sums. WaveTwentyOneSpec checks Murphy's
    // identity ties the four numbers together.
    "text_eval_brier" -> ((s, d) => {
      val lab = labeled(s, d).select(
        when(col("y"), 1L).otherwise(0L).as("y1"),
        round(col("sc") * lit(1000000.0), 0).cast("long").as("s6"),
        floor(col("sc") * 10).cast("int").as("bin"))
        .transform(graft.CacheScope.persisted(_))
      val tot = lab.agg(count(lit(1)).as("n"), sum(col("y1")).as("a"),
        sum(((col("s6") - col("y1") * lit(1000000L)) *
          (col("s6") - col("y1") * lit(1000000L)))
          .cast(DecimalType(26, 0))).as("sq"))
      val b = lab.groupBy("bin")
        .agg(count(lit(1)).as("nb"), sum(col("y1")).as("pb"),
          sum(col("s6")).as("sb"))
      val terms = b.crossJoin(broadcast(tot))
        .select(col("n"), col("a"), col("sq"),
          round(((col("pb") * lit(1000000L) - col("sb"))
              .cast(DecimalType(14, 0)) *
            (col("pb") * lit(1000000L) - col("sb"))
              .cast(DecimalType(14, 0))).cast("double") /
            (col("nb").cast("double") * lit(1e12)), 12)
            .cast(DecimalType(20, 12)).as("rel_t"),
          round(((col("pb") * col("n") - col("a") * col("nb"))
              .cast(DecimalType(16, 0)) *
            (col("pb") * col("n") - col("a") * col("nb"))
              .cast(DecimalType(16, 0))).cast("double") /
            (col("nb").cast("double") * col("n").cast("double") *
              col("n").cast("double")), 12)
            .cast(DecimalType(20, 12)).as("res_t"))
      terms.groupBy(col("n"), col("a"), col("sq"))
        .agg(sum(col("rel_t")).as("rel0"), sum(col("res_t")).as("res0"))
        .select(col("n"),
          round(col("sq").cast("double") /
            (col("n").cast("double") * lit(1e12)), 6).as("brier"),
          round(col("rel0").cast("double") / col("n").cast("double"), 6)
            .as("reliability"),
          round(col("res0").cast("double") / col("n").cast("double"), 6)
            .as("resolution"),
          round(col("a").cast("double") *
            (col("n") - col("a")).cast("double") /
            (col("n").cast("double") * col("n").cast("double")), 6)
            .as("uncertainty"))
    }),

    // Cumulative gains / lift table over the score deciles — the
    // "how much better than random is targeting the top-k%" readout a
    // curation gate reads before picking its threshold. Cumulative
    // counts ride the triangular broadcast join over the bounded bin
    // relation (the avgprec pattern, never an unpartitioned window);
    // gain and lift are exact integer ratios with one final division
    // each (lift = pos_cum·N / (n_cum·P) keeps it a single-divide).
    "text_eval_lift" -> ((s, d) => {
      val lab = labeled(s, d)
      val b = lab.groupBy(floor(col("sc") * 10).cast("int").as("bin"))
        .agg(count(lit(1)).as("nb"),
          sum(when(col("y"), 1L).otherwise(0L)).as("pb"))
        .transform(graft.CacheScope.persisted(_))
      val cum = b.select(col("bin"))
        .join(broadcast(b.select(col("bin").as("b2"), col("nb"), col("pb"))),
          col("b2") >= col("bin"))
        .groupBy("bin")
        .agg(sum(col("nb")).as("n_cum"), sum(col("pb")).as("pos_cum"))
      val tot = b.agg(sum(col("nb")).as("nn"), sum(col("pb")).as("pp"))
      cum.crossJoin(broadcast(tot))
        .select(col("bin"), col("n_cum"), col("pos_cum"),
          round(col("pos_cum").cast("double") / col("pp").cast("double"), 6)
            .as("gain"),
          round((col("pos_cum") * col("nn")).cast("double") /
            (col("n_cum") * col("pp")).cast("double"), 6).as("lift"))
    }),

    // Calibration / reliability table: decile bins of the score vs the
    // observed positive rate — the "is 0.8 really 80%?" check before a
    // threshold gate. Constant output (<= 11 bins); the mean score goes
    // through an exact decimal sum (6-dp inputs).
    "text_eval_calibration" -> ((s, d) =>
      labeled(s, d)
        .groupBy(floor(col("sc") * 10).cast("int").as("bin"))
        .agg(count(lit(1)).as("n"),
          round(graft.relational.Det.dsum(col("sc"), 6) /
            count(lit(1)), 6).as("mean_score"),
          round(count(when(col("y"), 1)).cast("double") / count(lit(1)), 6)
            .as("frac_pos"))),

    // CCNet-style held-out perplexity: train a Laplace-smoothed unigram
    // LM on a deterministic 90% md5 split of the corpus, score the 10%
    // holdout per document — ppl = exp(mean token NLL), with
    // P(w) = (n_train(w)+1) / (N_train + V + 1) so OOV tokens get the
    // +1 UNK mass instead of -inf. High-ppl docs are the gibberish the
    // perplexity gate drops; n_oov is reported because OOV density is
    // WHY a doc scored high. Scale shape: one corpus token scan feeds
    // both sides; the vocab agg is the only corpus-sized shuffle; the
    // holdout-vs-vocab left join is AQE-broadcast while the vocab fits
    // and degrades to a shuffle join at web-corpus vocab sizes; corpus
    // totals cross as a broadcast 1-row aggregate. Determinism: per-token
    // NLL is round(-ln(p), 9) as DECIMAL(18,9) (exact order-independent
    // sum — text_unigram_logprob's discipline), and the final exp runs on
    // one identical IEEE quotient in both engines, rounded to 4.
    "text_perplexity" -> ((s, d) => perplexityOf(docs(s, d),
      (conv(substring(md5(col("doc_id").cast("string")), 1, 8),
        16, 10).cast("long") % 100) >= 90)),

    // Cohen's kappa between the langid heuristic's english vote and the
    // gold label — chance-corrected agreement from one 2x2 confusion
    // aggregation (a single row of exact counts; po/pe arithmetic is
    // identical IEEE ops in both engines).
    "text_eval_kappa" -> ((s, d) => {
      val nn = col("n11") + col("n10") + col("n01") + col("n00")
      val po = (col("n11") + col("n00")).cast("double") / nn.cast("double")
      val pe = ((col("n11") + col("n10")).cast("double") *
        (col("n11") + col("n01")).cast("double") +
        (col("n01") + col("n00")).cast("double") *
          (col("n10") + col("n00")).cast("double")) /
        (nn.cast("double") * nn.cast("double"))
      labeled(s, d)
        .agg(count(when(col("pred_en") && col("y"), 1)).as("n11"),
          count(when(col("pred_en") && !col("y"), 1)).as("n10"),
          count(when(!col("pred_en") && col("y"), 1)).as("n01"),
          count(when(!col("pred_en") && !col("y"), 1)).as("n00"))
        .select(col("n11"), col("n10"), col("n01"), col("n00"),
          round(po, 6).as("po"),
          round((po - pe) / (lit(1.0) - pe), 6).as("kappa"))
    }))

  /** Average-precision body — public so WaveElevenSpec can replay it
    * against a driver-side sklearn-style computation on planted scores.
    */
  def avgPrecOf(lab: DataFrame): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(20, 9)
    val g = lab.groupBy(col("sc"))
      .agg(count(when(col("y"), 1)).as("p"),
        count(when(!col("y"), 1)).as("n"))
      .transform(graft.CacheScope.persisted(_))
    val cum = g.select(col("sc").as("sa"), col("p").as("pa"))
      .join(broadcast(g.select(col("sc").as("sb"), col("p").as("pb"),
        col("n").as("nb"))), col("sb") >= col("sa"))
      .groupBy("sa", "pa")
      .agg(sum(col("pb")).as("cp"), sum(col("nb")).as("cn"))
    val contrib = round(col("pa").cast("double") * col("cp").cast("double") /
      (col("cp") + col("cn")).cast("double"), 9).cast(dec)
    val tot = g.agg(sum(col("p")).as("np"), sum(col("n")).as("nn"),
      count(lit(1)).as("n_scores"))
    val sap = cum.agg(sum(contrib).as("sap"))
    tot.crossJoin(broadcast(sap))
      .select(col("np").as("n_pos"), col("nn").as("n_neg"), col("n_scores"),
        round(col("sap").cast("double") / col("np").cast("double"), 6)
          .as("avg_prec"))
  }

  /** The perplexity eval body (see the text_perplexity registration for
    * the full design notes): train on documents where `held` is false,
    * score the held split per doc. Public so PerplexitySpec can plant an
    * explicit train/holdout partition with a hand-computable LM.
    */
  def perplexityOf(documents: DataFrame, held: Column): DataFrame = {
    val dec = org.apache.spark.sql.types.DecimalType(18, 9)
    val tok = documents
      .select(col("doc_id"), held.as("held"),
        explode(cleanTokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .transform(graft.CacheScope.persisted(_))
    val vocab = tok.filter(!col("held"))
      .groupBy("tok").agg(count(lit(1)).as("n"))
      .transform(graft.CacheScope.persisted(_))
    val tot = vocab.agg(sum(col("n")).as("nn"), count(lit(1)).as("v"))
    val nll = round(-log(
      (coalesce(col("n"), lit(0L)) + lit(1L)).cast("double") /
        (col("nn") + col("v") + lit(1L)).cast("double")), 9).cast(dec)
    tok.filter(col("held"))
      .join(vocab, Seq("tok"), "left")
      .crossJoin(broadcast(tot))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("n").isNull, 1)).as("n_oov"),
        sum(nll).as("snll"))
      .select(col("doc_id"), col("n_tokens"), col("n_oov"),
        round(exp(col("snll").cast("double") / col("n_tokens")), 4)
          .as("ppl"))
  }

  /** Shared oracle scan: (y, sc, pred_en) per doc — quality score via the
    * shared CTE, langid vote inline.
    */
  private def labeledSql: String =
    s"""$qualityScoreCte, pred AS (
       |  SELECT doc_id,
       |         CAST(len(list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +'),
       |                              x -> x IN $stopList)) AS DOUBLE) /
       |           len(string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +')) >= 0.15 AS pred_en,
       |         lang = 'en' AS y
       |  FROM documents
       |), lab AS (
       |  SELECT p.y AS y, q.quality_score AS sc, p.pred_en AS pred_en
       |  FROM pred p JOIN qscore q USING (doc_id)
       |)""".stripMargin

  override val oracles: Map[String, String] = Map(

    "text_eval_auc" ->
      s"""WITH $labeledSql, g AS (
         |  SELECT sc, count(CASE WHEN y THEN 1 END) AS p,
         |         count(CASE WHEN NOT y THEN 1 END) AS n
         |  FROM lab GROUP BY sc
         |), conc AS (
         |  SELECT COALESCE(sum(a.p * b.n), 0) AS c FROM g a, g b WHERE a.sc > b.sc
         |), ties AS (SELECT COALESCE(sum(p * n), 0) AS t FROM g),
         |tot AS (SELECT CAST(sum(p) AS BIGINT) AS np, CAST(sum(n) AS BIGINT) AS nn,
         |               count(*) AS n_scores FROM g)
         |SELECT np AS n_pos, nn AS n_neg, n_scores,
         |       round((CAST(c AS DOUBLE) + 0.5 * CAST(t AS DOUBLE)) /
         |             (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)), 6) AS auc
         |FROM tot, conc, ties""".stripMargin,

    "text_eval_auc_delong" ->
      s"""WITH $labeledSql, g AS (
         |  SELECT sc, count(CASE WHEN y THEN 1 END) AS p,
         |         count(CASE WHEN NOT y THEN 1 END) AS n
         |  FROM lab GROUP BY sc
         |), cumn AS (
         |  SELECT a.sc, CAST(COALESCE(sum(b.n), 0) AS BIGINT) AS cn
         |  FROM g a LEFT JOIN g b ON b.sc < a.sc GROUP BY 1
         |), cump AS (
         |  SELECT a.sc, CAST(COALESCE(sum(b.p), 0) AS BIGINT) AS cp
         |  FROM g a LEFT JOIN g b ON b.sc > a.sc GROUP BY 1
         |), conc AS (
         |  SELECT CAST(COALESCE(sum(a.p * b.n), 0) AS BIGINT) AS c
         |  FROM g a, g b WHERE a.sc > b.sc
         |), ties AS (SELECT CAST(COALESCE(sum(p * n), 0) AS BIGINT) AS t FROM g),
         |tot AS (SELECT CAST(sum(p) AS BIGINT) AS np,
         |               CAST(sum(n) AS BIGINT) AS nn FROM g),
         |base AS (
         |  SELECT np, nn, c, t,
         |         CAST(round((CAST(c AS DOUBLE) + 0.5 * CAST(t AS DOUBLE)) /
         |                    (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)), 9)
         |              AS DECIMAL(10,9)) AS auc9
         |  FROM tot CROSS JOIN conc CROSS JOIN ties
         |), per AS (
         |  SELECT g.p, g.n, b.np, b.nn, b.c, b.t, b.auc9,
         |         CAST(round((cn.cn + 0.5 * g.n) / CAST(b.nn AS DOUBLE), 9)
         |              AS DECIMAL(10,9)) AS v10,
         |         CAST(round((cp.cp + 0.5 * g.p) / CAST(b.np AS DOUBLE), 9)
         |              AS DECIMAL(10,9)) AS v01
         |  FROM g JOIN cumn cn ON cn.sc = g.sc
         |         JOIN cump cp ON cp.sc = g.sc CROSS JOIN base b
         |), m AS (
         |  SELECT min(np) AS np, min(nn) AS nn, min(c) AS c, min(t) AS t,
         |         min(auc9) AS auc9,
         |         sum((v10 - auc9) * (v10 - auc9) * CAST(p AS DECIMAL(7,0))) AS sum10,
         |         sum((v01 - auc9) * (v01 - auc9) * CAST(n AS DECIMAL(7,0))) AS sum01
         |  FROM per
         |), f AS (
         |  SELECT np AS n_pos, nn AS n_neg,
         |         round((CAST(c AS DOUBLE) + 0.5 * CAST(t AS DOUBLE)) /
         |               (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)), 6) AS auc,
         |         CAST(auc9 AS DOUBLE) AS auc9d,
         |         sqrt(CAST(sum10 AS DOUBLE) / ((np - 1) * CAST(np AS DOUBLE)) +
         |              CAST(sum01 AS DOUBLE) / ((nn - 1) * CAST(nn AS DOUBLE))) AS se0
         |  FROM m
         |)
         |SELECT n_pos, n_neg, auc, round(se0, 6) AS auc_se,
         |       round((auc9d - 0.5) / se0, 4) AS z_vs_half,
         |       round(auc - 1.96 * se0, 6) AS ci_lo,
         |       round(auc + 1.96 * se0, 6) AS ci_hi
         |FROM f""".stripMargin,

    "text_eval_lift" ->
      s"""WITH $labeledSql, b AS (
         |  SELECT CAST(floor(sc * 10) AS INT) AS bin, count(*) AS nb,
         |         CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pb
         |  FROM lab GROUP BY 1
         |), cum AS (
         |  SELECT a.bin, CAST(sum(o.nb) AS BIGINT) AS n_cum,
         |         CAST(sum(o.pb) AS BIGINT) AS pos_cum
         |  FROM b a JOIN b o ON o.bin >= a.bin GROUP BY 1
         |), tot AS (
         |  SELECT CAST(sum(nb) AS BIGINT) AS nn, CAST(sum(pb) AS BIGINT) AS pp
         |  FROM b
         |)
         |SELECT bin, n_cum, pos_cum,
         |       round(CAST(pos_cum AS DOUBLE) / CAST(pp AS DOUBLE), 6) AS gain,
         |       round(CAST(pos_cum * nn AS DOUBLE) /
         |             CAST(n_cum * pp AS DOUBLE), 6) AS lift
         |FROM cum CROSS JOIN tot""".stripMargin,

    "text_eval_ece" ->
      s"""WITH $labeledSql, l2 AS (
         |  SELECT y, CAST(round(sc * 1000000.0, 0) AS BIGINT) AS s6,
         |         CAST(floor(sc * 10) AS INT) AS bin
         |  FROM lab
         |), b AS (
         |  SELECT bin, count(*) AS nb,
         |         CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pb,
         |         CAST(sum(s6) AS BIGINT) AS sb
         |  FROM l2 GROUP BY 1
         |)
         |SELECT count(*) AS n_bins, CAST(sum(nb) AS BIGINT) AS n,
         |       round(CAST(sum(abs(pb * 1000000 - sb)) AS DOUBLE) /
         |             (CAST(sum(nb) AS DOUBLE) * 1000000.0), 6) AS ece,
         |       round(max(CAST(abs(pb * 1000000 - sb) AS DOUBLE) /
         |             (CAST(nb AS DOUBLE) * 1000000.0)), 6) AS mce
         |FROM b""".stripMargin,

    "text_eval_brier" ->
      s"""WITH $labeledSql, l2 AS (
         |  SELECT CASE WHEN y THEN 1 ELSE 0 END AS y1,
         |         CAST(round(sc * 1000000.0, 0) AS BIGINT) AS s6,
         |         CAST(floor(sc * 10) AS INT) AS bin
         |  FROM lab
         |), tot AS (
         |  SELECT count(*) AS n, CAST(sum(y1) AS BIGINT) AS a,
         |         CAST(sum(CAST((s6 - y1 * 1000000) * (s6 - y1 * 1000000)
         |                       AS DECIMAL(26,0))) AS DECIMAL(36,0)) AS sq
         |  FROM l2
         |), b AS (
         |  SELECT bin, count(*) AS nb, CAST(sum(y1) AS BIGINT) AS pb,
         |         CAST(sum(s6) AS BIGINT) AS sb
         |  FROM l2 GROUP BY 1
         |), terms AS (
         |  SELECT t.n, t.a, t.sq,
         |         CAST(round(CAST(CAST(pb * 1000000 - sb AS DECIMAL(14,0)) *
         |                         CAST(pb * 1000000 - sb AS DECIMAL(14,0)) AS DOUBLE) /
         |                    (CAST(nb AS DOUBLE) * 1e12), 12)
         |              AS DECIMAL(20,12)) AS rel_t,
         |         CAST(round(CAST(CAST(pb * t.n - t.a * nb AS DECIMAL(16,0)) *
         |                         CAST(pb * t.n - t.a * nb AS DECIMAL(16,0)) AS DOUBLE) /
         |                    (CAST(nb AS DOUBLE) * CAST(t.n AS DOUBLE) *
         |                     CAST(t.n AS DOUBLE)), 12)
         |              AS DECIMAL(20,12)) AS res_t
         |  FROM b CROSS JOIN tot t
         |)
         |SELECT n,
         |       round(CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 1e12), 6) AS brier,
         |       round(CAST(sum(rel_t) AS DOUBLE) / CAST(n AS DOUBLE), 6) AS reliability,
         |       round(CAST(sum(res_t) AS DOUBLE) / CAST(n AS DOUBLE), 6) AS resolution,
         |       round(CAST(a AS DOUBLE) * CAST(n - a AS DOUBLE) /
         |             (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS uncertainty
         |FROM terms GROUP BY n, a, sq""".stripMargin,

    "text_eval_avgprec" ->
      s"""WITH $labeledSql, g AS (
         |  SELECT sc, count(CASE WHEN y THEN 1 END) AS p,
         |         count(CASE WHEN NOT y THEN 1 END) AS n
         |  FROM lab GROUP BY sc
         |), cum AS (
         |  SELECT a.sc AS sa, a.p AS pa,
         |         CAST(sum(b.p) AS BIGINT) AS cp, CAST(sum(b.n) AS BIGINT) AS cn
         |  FROM g a JOIN g b ON b.sc >= a.sc
         |  GROUP BY a.sc, a.p
         |), tot AS (
         |  SELECT CAST(sum(p) AS BIGINT) AS np, CAST(sum(n) AS BIGINT) AS nn,
         |         count(*) AS n_scores FROM g
         |), sap AS (
         |  SELECT sum(CAST(round(CAST(pa AS DOUBLE) * CAST(cp AS DOUBLE) /
         |                        CAST(cp + cn AS DOUBLE), 9) AS DECIMAL(20,9))) AS sap
         |  FROM cum
         |)
         |SELECT np AS n_pos, nn AS n_neg, n_scores,
         |       round(CAST(sap AS DOUBLE) / CAST(np AS DOUBLE), 6) AS avg_prec
         |FROM tot, sap""".stripMargin,

    "text_eval_calibration" ->
      s"""WITH $labeledSql
         |SELECT CAST(floor(sc * 10) AS INT) AS bin, count(*) AS n,
         |       round(CAST(sum(CAST(sc AS DECIMAL(18,6))) AS DOUBLE) / count(*), 6) AS mean_score,
         |       round(CAST(count(CASE WHEN y THEN 1 END) AS DOUBLE) / count(*), 6) AS frac_pos
         |FROM lab GROUP BY 1""".stripMargin,

    "text_perplexity" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 >= 90 AS held,
        |         unnest(string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +')) AS tok
        |  FROM documents
        |), tok2 AS (
        |  SELECT doc_id, held, tok FROM tok WHERE tok <> ''
        |), vocab AS (
        |  SELECT tok, count(*) AS n FROM tok2 WHERE NOT held GROUP BY tok
        |), tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn, count(*) AS v FROM vocab
        |)
        |SELECT t.doc_id, count(*) AS n_tokens,
        |       count(CASE WHEN v.n IS NULL THEN 1 END) AS n_oov,
        |       round(exp(CAST(sum(CAST(round(-ln(CAST(COALESCE(v.n, 0) + 1 AS DOUBLE) /
        |                                         CAST(s.nn + s.v + 1 AS DOUBLE)), 9)
        |                               AS DECIMAL(18,9))) AS DOUBLE) / count(*)), 4) AS ppl
        |FROM tok2 t LEFT JOIN vocab v ON v.tok = t.tok CROSS JOIN tot s
        |WHERE t.held
        |GROUP BY t.doc_id""".stripMargin,

    "text_eval_kappa" ->
      s"""WITH $labeledSql, cm AS (
         |  SELECT count(CASE WHEN pred_en AND y THEN 1 END) AS n11,
         |         count(CASE WHEN pred_en AND NOT y THEN 1 END) AS n10,
         |         count(CASE WHEN NOT pred_en AND y THEN 1 END) AS n01,
         |         count(CASE WHEN NOT pred_en AND NOT y THEN 1 END) AS n00
         |  FROM lab
         |)
         |SELECT n11, n10, n01, n00,
         |       round(CAST(n11 + n00 AS DOUBLE) / CAST(n11 + n10 + n01 + n00 AS DOUBLE), 6) AS po,
         |       round((CAST(n11 + n00 AS DOUBLE) / CAST(n11 + n10 + n01 + n00 AS DOUBLE) -
         |              (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE) +
         |               CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE)) /
         |              (CAST(n11 + n10 + n01 + n00 AS DOUBLE) * CAST(n11 + n10 + n01 + n00 AS DOUBLE))) /
         |             (1.0 - (CAST(n11 + n10 AS DOUBLE) * CAST(n11 + n01 AS DOUBLE) +
         |                     CAST(n01 + n00 AS DOUBLE) * CAST(n10 + n00 AS DOUBLE)) /
         |                    (CAST(n11 + n10 + n01 + n00 AS DOUBLE) * CAST(n11 + n10 + n01 + n00 AS DOUBLE))), 6) AS kappa
         |FROM cm""".stripMargin)
}
