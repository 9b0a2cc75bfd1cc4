package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}

/** Pre-training corpus-filtering operators the LLM-data pipeline runs
  * between ingestion and tokenization: Gopher-style rule gates (Rae et
  * al. 2021 "Scaling Language Models: ... Gopher", Table A1), DSIR
  * hashed-n-gram importance weighting (Xie et al. 2023 "Data Selection
  * for Language Models via Importance Resampling"), and train/held-out
  * OOV-rate audit (the tokenizer-coverage check run before freezing a
  * vocab).
  *
  * Scale design (100 TB):
  *   - gopher gates are ONE narrow codegen'd projection per document
  *     (array HOFs over the token split; integer cross-multiplied
  *     threshold comparisons, no division) followed by a |langs|-row
  *     aggregate — embarrassingly parallel, zero shuffle before the agg.
  *   - DSIR aggregates the exploded token stream ONCE to per-(doc,
  *     bucket) counts; the 64-row bucket log-ratio relation derives from
  *     that same aggregate and broadcasts back — the raw token stream is
  *     never joined or shuffled twice, and doc weights are exact DECIMAL
  *     sums of integer-count x pinned-log products (partition-order
  *     proof).
  *   - OOV joins agg-to-agg: per-(lang, token) test counts against the
  *     distinct train vocab on the token key — an equi-join between two
  *     already-aggregated relations, never token-stream x token-stream.
  */
object PipelineFilterQueries extends QueryPack {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "documents")

  /** Whitespace tokens of the lowercased text — the raw-token view the
    * filter gates run on (SQL twin: string_split_regex(lower(text),
    * '\s+')).
    */
  private def rawTokens(c: Column): Column = split(lower(c), "\\s+")

  /** Gopher gate dials, tuned so every gate genuinely fires on the
    * synthetic corpus (word counts 10-99, mean word length 3.7-5.3,
    * duplicate-token fraction 0-0.72 at sf0.01); production swaps the
    * constants (Gopher's published bounds are 50..100k words, mwl 3..10,
    * dup fraction implicit in the repetition rules). All thresholds are
    * rationals applied by integer cross-multiplication — no division
    * anywhere in the gate math.
    */
  val GopherMinWords = 30
  val GopherMaxWords = 90
  /** mean word length in [4.2, 4.8]: 10*chars vs {42,48}*words. */
  val GopherMwlLo = 42
  val GopherMwlHi = 48
  /** duplicate-token fraction <= 0.60: 100*(nw-nd) vs 60*nw. */
  val GopherDupPct = 60
  /** >= 2 stopword hits ("the"/"a" — the survivors of the synthetic
    * vocabulary) or the doc fails the stop-word gate.
    */
  val GopherMinStops = 2

  /** DSIR hashed-unigram bucket count (2^6; the paper uses 2^16 buckets
    * of hashed bigrams — same expression, one constant and one n-gram
    * width changed).
    */
  val DsirBuckets = 64

  /** DSIR target slice: importance-weight the corpus toward English docs
    * (the "high-quality target distribution" stand-in).
    */
  val DsirTargetLang = "en"

  /** Top-k docs reported by DSIR importance weight. */
  val DsirTopK = 20

  /** Per-(doc, lang, bucket) hashed-token counts — the ONE aggregate of
    * the exploded token stream that every DSIR relation derives from.
    */
  private def dsirDocBuckets(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), col("lang"),
        explode(rawTokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .withColumn("bucket",
        pmod(conv(substring(md5(col("tok")), 1, 6), 16, 10).cast("long"),
          lit(DsirBuckets.toLong)))
      .groupBy("doc_id", "lang", "bucket")
      .agg(count(lit(1)).as("c"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Stratification audit of the deterministic hash split (md5(doc_id)
    // % 10 -> 8/1/1 train/val/test, the split every other operator here
    // would consume): per (split, lang) counts with the within-split
    // fraction, the corpus-wide fraction, and their gap — the imbalance
    // a stratified splitter would have to correct. All counts are exact;
    // the three released doubles are identical-operand divisions under
    // round(,6). Scale: one documents-sized aggregation to a
    // |splits|x|langs| relation; everything downstream is bounded.
    "text_split_stratified" -> ((s, d) => {
      val h = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 10
      val cell = docs(s, d)
        .select(when(h < 8, "train").when(h === 8, "val").otherwise("test")
          .as("split"), col("lang"))
        .groupBy("split", "lang").agg(count(lit(1)).as("n_docs"))
        .transform(graft.CacheScope.persisted(_))
      val bySplit = cell.groupBy("split").agg(sum("n_docs").as("n_split"))
      val byLang = cell.groupBy("lang").agg(sum("n_docs").as("n_lang"))
      val tot = cell.agg(sum("n_docs").as("nn"))
      cell.join(bySplit, "split").join(byLang, "lang")
        .crossJoin(broadcast(tot))
        .select(col("split"), col("lang"), col("n_docs"),
          round(col("n_docs").cast("double") / col("n_split").cast("double"), 6)
            .as("frac_in_split"),
          round(col("n_lang").cast("double") / col("nn").cast("double"), 6)
            .as("frac_overall"),
          round(col("n_docs").cast("double") / col("n_split").cast("double") -
            col("n_lang").cast("double") / col("nn").cast("double"), 6)
            .as("skew"))
    }),

    // Pairwise SOURCE similarity: cosine between per-source term-
    // frequency vectors — the corpus-mixing audit that finds
    // near-duplicate ingestion feeds before they double-count a domain
    // in the mixture weights (vocab-overlap Jaccard saturates on a
    // shared vocabulary; the FREQUENCY profile is what distinguishes
    // sources). Exact integer (source, token) counts; dot products and
    // norms fold in DECIMAL over the |sources|x|vocab|-bounded count
    // relation, so the only doubles are the final identical-operand
    // cosine divisions under round(,6). Scale: one token-stream
    // aggregation down to the bounded counts, then a token-keyed
    // self-join of bounded relations — never stream x stream.
    "text_source_similarity" -> ((s, d) => {
      val tf = docs(s, d)
        .select(col("source"),
          explode(split(lower(col("text")), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("source", "tok").agg(count(lit(1)).as("n"))
        .transform(graft.CacheScope.persisted(_))
      val dec = org.apache.spark.sql.types.DecimalType(38, 0)
      val norm = tf.groupBy("source")
        .agg(sum(col("n").cast(dec) * col("n").cast(dec)).as("n2"))
      val dot = tf.select(col("source").as("sa"), col("tok"), col("n").as("na"))
        .join(tf.select(col("source").as("sb"), col("tok"), col("n").as("nb")),
          Seq("tok"))
        .filter(col("sa") < col("sb"))
        .groupBy("sa", "sb")
        .agg(sum(col("na").cast(dec) * col("nb").cast(dec)).as("dt"))
      dot
        .join(norm.select(col("source").as("sa"), col("n2").as("n2a")), "sa")
        .join(norm.select(col("source").as("sb"), col("n2").as("n2b")), "sb")
        .select(col("sa").as("source_a"), col("sb").as("source_b"),
          round(col("dt").cast("double") /
            (sqrt(col("n2a").cast("double")) * sqrt(col("n2b").cast("double"))),
            6).as("tf_cosine"))
    }),

    // Per-source quality-outlier audit: within each source, documents
    // whose quality score sits beyond [[QualityZ]] sample standard
    // deviations of the source mean — the "one crawl shard went bad"
    // detector that per-corpus thresholds (text_quality_filter) miss
    // because a source's own distribution defines its normal. The score
    // enters as the exact 1e6-scaled integer (the text_quality_deciles
    // grain), moments are exact DECIMAL, and the z comparison runs on
    // identical-operand doubles in both engines. Scale: one documents
    // agg to per-source moments (broadcast back), one counting agg.
    "text_quality_outliers" -> ((s, d) => {
      val q = Tables.load(s, d, "documents")
        .select(col("doc_id"), col("source"),
          TextAnalysisQueries.qualityScore.as("qs"))
        .select(col("doc_id"), col("source"),
          expr("CAST(round(qs * 1000000.0) AS BIGINT)").as("mu"))
        .transform(graft.CacheScope.persisted(_))
      val m = q.groupBy(col("source").as("src2"))
        .agg(count(lit(1)).cast(DecimalType(12, 0)).as("n"),
          sum(col("mu")).cast(DecimalType(19, 0)).as("sm"),
          sum(col("mu").cast(DecimalType(19, 0)) * col("mu"))
            .cast(DecimalType(28, 0)).as("smm"))
        .filter(col("n") >= 2 &&
          col("n") * col("smm") - col("sm") * col("sm").cast(DecimalType(18, 0)) > 0)
      val sd = sqrt((col("n") * col("smm") -
        col("sm") * col("sm").cast(DecimalType(18, 0))).cast("double") /
        (col("n").cast("double") * (col("n").cast("double") - 1.0)))
      val z = (col("mu").cast("double") -
        col("sm").cast("double") / col("n").cast("double")) / sd
      q.join(broadcast(m), col("source") === col("src2"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(abs(z) > QualityZ, 1L).otherwise(0L)).as("n_outliers"),
          max(col("sm")).as("smx"), max(col("n")).as("nx"))
        .select(col("source"), col("n_docs"), col("n_outliers"),
          round(col("n_outliers").cast("double") /
            col("n_docs").cast("double"), 6).as("outlier_rate"),
          round(col("smx").cast("double") / col("nx").cast("double") /
            1000000.0, 6).as("mean_quality"))
    }),

    // Gopher-style rule gates: per language, how many docs fail each of
    // the five named quality gates (too short / too long / mean word
    // length out of band / too much duplicate-token mass / too few
    // stopword hits), and how many pass ALL of them. The per-doc gate
    // vector is one fused narrow projection (array HOFs + integer
    // comparisons); the output is a |langs|-row aggregate.
    "text_gopher_rules" -> ((s, d) => {
      val tk = rawTokens(col("text"))
      val nw = size(tk).cast("long")
      val nd = size(array_distinct(tk)).cast("long")
      val chars = aggregate(tk, lit(0L),
        (acc, t) => acc + length(t).cast("long"))
      val stops = size(filter(tk, t => t === "the" || t === "a")).cast("long")
      val gShort = nw < GopherMinWords
      val gLong = nw > GopherMaxWords
      val gMwl = (chars * 10 < nw * GopherMwlLo) ||
        (chars * 10 > nw * GopherMwlHi)
      val gDup = (nw - nd) * 100 > nw * GopherDupPct
      val gStop = stops < GopherMinStops
      docs(s, d)
        .select(col("lang"), gShort.as("s1"), gLong.as("s2"), gMwl.as("s3"),
          gDup.as("s4"), gStop.as("s5"))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("s1"), 1L).otherwise(0L)).as("fail_short"),
          sum(when(col("s2"), 1L).otherwise(0L)).as("fail_long"),
          sum(when(col("s3"), 1L).otherwise(0L)).as("fail_word_len"),
          sum(when(col("s4"), 1L).otherwise(0L)).as("fail_dup_frac"),
          sum(when(col("s5"), 1L).otherwise(0L)).as("fail_stopword"),
          sum(when(!col("s1") && !col("s2") && !col("s3") && !col("s4") &&
            !col("s5"), 1L).otherwise(0L)).as("n_kept"))
    }),

    // DSIR importance weights: score every doc by how much its hashed
    // unigram distribution looks like the target slice's (lang = en)
    // rather than the whole corpus's — log w(doc) = sum_b c_doc(b) *
    // (ln p_target(b) - ln p_corpus(b)) with add-1 smoothing — and
    // report the top-20 (the resampling head). The 64-bucket log-ratio
    // relation is pinned at 9dp and broadcast; doc weights are exact
    // DECIMAL sums of (integer count x pinned ratio), so partition
    // order can't move the 6dp-rounded result.
    "text_dsir_weights" -> ((s, d) => {
      val db = dsirDocBuckets(s, d).transform(graft.CacheScope.persisted(_))
      val tgt = db.filter(col("lang") === DsirTargetLang)
        .groupBy("bucket").agg(sum(col("c")).as("tc"))
      val all = db.groupBy("bucket").agg(sum(col("c")).as("qc"))
      val tot = db.agg(
        sum(when(col("lang") === DsirTargetLang, col("c")).otherwise(0L))
          .as("nt"),
        sum(col("c")).as("nq"))
      val lw = all.join(tgt, Seq("bucket"), "left")
        .na.fill(0L, Seq("tc"))
        .crossJoin(broadcast(tot))
        .select(col("bucket"),
          round(
            log((col("tc") + 1).cast("double") /
              (col("nt") + DsirBuckets).cast("double")) -
              log((col("qc") + 1).cast("double") /
                (col("nq") + DsirBuckets).cast("double")), 9)
            .cast(DecimalType(14, 9)).as("lw"))
      db.join(broadcast(lw), "bucket")
        .groupBy(col("doc_id"), col("lang"))
        .agg(sum(col("c")).cast("long").as("n_tokens"),
          round(sum(col("c") * col("lw")).cast("double"), 6).as("log_weight"))
        .orderBy(col("log_weight").desc, col("doc_id"))
        .limit(DsirTopK)
    }),

    // OOV-rate audit: build the vocabulary from the even-doc_id half
    // ("train"), measure per-language out-of-vocabulary token and type
    // rates on the odd half ("held-out") — the coverage check run before
    // freezing a tokenizer vocab. Both sides aggregate BEFORE the join:
    // per-(lang, token) held-out counts left-join the distinct train
    // vocab on the token key.
    "text_oov_rate" -> ((s, d) => {
      val tok = docs(s, d)
        .select(col("doc_id"), col("lang"),
          explode(rawTokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
        .transform(graft.CacheScope.persisted(_))
      val vocab = tok.filter(col("doc_id") % 2 === 0)
        .select(col("tok")).distinct()
        .withColumn("in_vocab", lit(1))
      val test = tok.filter(col("doc_id") % 2 === 1)
        .groupBy("lang", "tok").agg(count(lit(1)).as("c"))
      test.join(vocab, Seq("tok"), "left")
        .groupBy("lang")
        .agg(sum(col("c")).cast("long").as("n_tokens"),
          sum(when(col("in_vocab").isNull, col("c")).otherwise(0L))
            .cast("long").as("n_oov"),
          count(lit(1)).as("n_types"),
          sum(when(col("in_vocab").isNull, 1L).otherwise(0L))
            .cast("long").as("n_oov_types"))
        .select(col("lang"), col("n_tokens"), col("n_oov"), col("n_types"),
          col("n_oov_types"),
          round(col("n_oov").cast("double") / col("n_tokens").cast("double"),
            6).as("oov_rate"))
    }),

    // CCNet-style perplexity split (Wenzek et al. 2020): score every doc
    // by per-token cross-entropy under the corpus unigram LM, then cut
    // each LANGUAGE into head/middle/tail terciles — the standard
    // "keep the head, sample the middle, drop the tail" curation move.
    // Per-token NLLs are 9dp-pinned decimal sums (order-proof); the doc
    // score is pinned at 6dp BEFORE ranking so the tercile rank
    // (h asc, doc_id asc) is engine-exact. The per-lang rank rides a
    // lang-partitioned window — at 100 TB a language is too big for one
    // partition, so production swaps the exact rank for cut points from
    // a per-lang quantile sketch (q_quantile_sketch); the bucket
    // semantics and everything upstream are unchanged.
    "text_ccnet_split" -> ((s, d) => {
      val tok = docs(s, d)
        .select(col("doc_id"), col("lang"),
          explode(rawTokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
        .transform(graft.CacheScope.persisted(_))
      val lm = tok.groupBy("tok").agg(count(lit(1)).as("n"))
      val tot = lm.agg(sum(col("n")).as("nn"))
      val nll = round(-log(col("n").cast("double") /
        col("nn").cast("double")), 9).cast(DecimalType(18, 9))
      val perDoc = tok.join(lm, "tok")
        .crossJoin(broadcast(tot))
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("nt"), sum(nll).as("snll"))
        .select(col("doc_id"), col("lang"),
          round(col("snll").cast("double") / col("nt").cast("double"), 6)
            .as("h"))
      val wl = Window.partitionBy("lang").orderBy(col("h").asc, col("doc_id").asc)
      perDoc.withColumn("rn", row_number().over(wl))
        .withColumn("nl", count(lit(1)).over(Window.partitionBy("lang")))
        .withColumn("bucket",
          when(col("rn") * 3 <= col("nl"), "head")
            .when(col("rn") * 3 <= col("nl") * 2, "middle")
            .otherwise("tail"))
        .groupBy("lang", "bucket")
        .agg(count(lit(1)).as("n_docs"),
          round(min(col("h")), 6).as("min_ce"),
          round(max(col("h")), 6).as("max_ce"))
    }),

    // Dataset card: the per-source summary a corpus release ships (the
    // "What's In My Big Data" reporting pass) — doc and token counts,
    // mean doc length, and language diversity as the effective number of
    // languages exp(H(lang)) (1 = monolingual source, 5 = uniform over
    // five). One docs-sized narrow scan to (source, lang) cells; the
    // entropy contributions are 9dp-pinned decimal sums over the bounded
    // cell grid.
    "text_corpus_card" -> ((s, d) => {
      val cell = docs(s, d)
        .select(col("source"), col("lang"),
          size(rawTokens(col("text"))).cast("long").as("nw"))
        .groupBy("source", "lang")
        .agg(count(lit(1)).as("c"), sum(col("nw")).as("w"))
        .transform(graft.CacheScope.persisted(_))
      val grp = cell.groupBy("source")
        .agg(sum(col("c")).as("n_docs"), sum(col("w")).as("n_tokens"),
          count(lit(1)).as("n_langs"))
      val p = col("c").cast("double") / col("n_docs").cast("double")
      cell.join(broadcast(grp), "source")
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_langs"),
          round(-p * log(p), 9).cast(DecimalType(14, 9)).as("h"))
        .groupBy(col("source"))
        .agg(first(col("n_docs")).cast("long").as("n_docs"),
          first(col("n_tokens")).cast("long").as("n_tokens"),
          first(col("n_langs")).cast("long").as("n_langs"),
          sum(col("h")).as("hh"))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("n_langs"),
          round(col("n_tokens").cast("double") /
            col("n_docs").cast("double"), 4).as("avg_tokens"),
          round(exp(col("hh").cast("double")), 4).as("eff_langs"))
    }))

  /** Outlier gate in sample standard deviations (compile-time literal
    * shared with the oracle): 2.0 is the discriminating regime on this
    * corpus (11 of 20 sources flag 1-2 docs at sf0.01; 2.5 flags nothing
    * at the 25-doc source size — the max |z| a well-behaved small sample
    * reaches is ~2).
    */
  val QualityZ = 2.0

  override val oracles: Map[String, String] = Map(

    "text_split_stratified" ->
      """WITH cell AS (
        |  SELECT CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 < 8 THEN 'train'
        |              WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10 = 8 THEN 'val'
        |              ELSE 'test' END AS split,
        |         lang, count(*) AS n_docs
        |  FROM documents GROUP BY 1, 2
        |), bs AS (SELECT split, CAST(sum(n_docs) AS BIGINT) AS n_split FROM cell GROUP BY 1),
        |bl AS (SELECT lang, CAST(sum(n_docs) AS BIGINT) AS n_lang FROM cell GROUP BY 1),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS nn FROM cell)
        |SELECT c.split, c.lang, c.n_docs,
        |       round(CAST(c.n_docs AS DOUBLE) / CAST(bs.n_split AS DOUBLE), 6) AS frac_in_split,
        |       round(CAST(bl.n_lang AS DOUBLE) / CAST(tot.nn AS DOUBLE), 6) AS frac_overall,
        |       round(CAST(c.n_docs AS DOUBLE) / CAST(bs.n_split AS DOUBLE) -
        |             CAST(bl.n_lang AS DOUBLE) / CAST(tot.nn AS DOUBLE), 6) AS skew
        |FROM cell c
        |JOIN bs ON bs.split = c.split
        |JOIN bl ON bl.lang = c.lang
        |CROSS JOIN tot""".stripMargin,

    "text_source_similarity" ->
      """WITH tf AS (
        |  SELECT source, tok, count(*) AS n FROM (
        |    SELECT source,
        |           unnest(string_split_regex(lower(text), '\s+')) AS tok
        |    FROM documents
        |  ) WHERE tok <> '' GROUP BY 1, 2
        |), nrm AS (
        |  SELECT source, sum(CAST(n AS HUGEINT) * n) AS n2 FROM tf GROUP BY 1
        |), dt AS (
        |  SELECT a.source AS sa, b.source AS sb,
        |         sum(CAST(a.n AS HUGEINT) * b.n) AS dt
        |  FROM tf a JOIN tf b ON a.tok = b.tok AND a.source < b.source
        |  GROUP BY 1, 2
        |)
        |SELECT dt.sa AS source_a, dt.sb AS source_b,
        |       round(CAST(dt.dt AS DOUBLE) /
        |             (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))),
        |             6) AS tf_cosine
        |FROM dt
        |JOIN nrm na ON na.source = dt.sa
        |JOIN nrm nb ON nb.source = dt.sb""".stripMargin,

    "text_quality_outliers" ->
      s"""WITH ${TextAnalysisQueries.qualityScoreCte}, qm AS (
         |  SELECT d.source, q.doc_id,
         |         CAST(round(q.quality_score * 1000000.0) AS BIGINT) AS mu
         |  FROM qscore q JOIN documents d USING (doc_id)
         |), mo AS (
         |  SELECT source AS src2,
         |         CAST(count(*) AS DECIMAL(12,0)) AS n,
         |         CAST(sum(mu) AS DECIMAL(19,0)) AS sm,
         |         CAST(sum(CAST(mu AS DECIMAL(19,0)) * mu) AS DECIMAL(28,0)) AS smm
         |  FROM qm GROUP BY 1
         |  HAVING count(*) >= 2 AND
         |         CAST(count(*) AS DECIMAL(12,0)) *
         |           CAST(sum(CAST(mu AS DECIMAL(19,0)) * mu) AS DECIMAL(28,0)) -
         |         CAST(sum(mu) AS DECIMAL(19,0)) *
         |           CAST(CAST(sum(mu) AS DECIMAL(19,0)) AS DECIMAL(18,0)) > 0
         |)
         |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
         |       CAST(sum(CASE WHEN abs(
         |             (CAST(mu AS DOUBLE) - CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)) /
         |             sqrt(CAST(n * smm - sm * CAST(sm AS DECIMAL(18,0)) AS DOUBLE) /
         |                  (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))) > $QualityZ
         |           THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
         |       round(CAST(sum(CASE WHEN abs(
         |             (CAST(mu AS DOUBLE) - CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)) /
         |             sqrt(CAST(n * smm - sm * CAST(sm AS DECIMAL(18,0)) AS DOUBLE) /
         |                  (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)))) > $QualityZ
         |           THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         |         AS outlier_rate,
         |       round(CAST(max(sm) AS DOUBLE) / CAST(max(n) AS DOUBLE) / 1000000.0, 6)
         |         AS mean_quality
         |FROM qm JOIN mo ON source = src2
         |GROUP BY source""".stripMargin,

    "text_gopher_rules" ->
      s"""WITH t AS (
         |  SELECT lang, string_split_regex(lower(text), '\\s+') AS tk
         |  FROM documents
         |), m AS (
         |  SELECT lang,
         |         CAST(len(tk) AS BIGINT) AS nw,
         |         CAST(len(list_distinct(tk)) AS BIGINT) AS nd,
         |         CAST(list_aggregate(list_transform(tk, x -> length(x)),
         |                             'sum') AS BIGINT) AS chars,
         |         CAST(len(list_filter(tk, x -> x IN ('the', 'a')))
         |              AS BIGINT) AS stops
         |  FROM t
         |), g AS (
         |  SELECT lang,
         |         nw < $GopherMinWords AS s1,
         |         nw > $GopherMaxWords AS s2,
         |         (chars * 10 < nw * $GopherMwlLo OR
         |          chars * 10 > nw * $GopherMwlHi) AS s3,
         |         (nw - nd) * 100 > nw * $GopherDupPct AS s4,
         |         stops < $GopherMinStops AS s5
         |  FROM m
         |)
         |SELECT lang, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN s1 THEN 1 ELSE 0 END) AS BIGINT) AS fail_short,
         |       CAST(sum(CASE WHEN s2 THEN 1 ELSE 0 END) AS BIGINT) AS fail_long,
         |       CAST(sum(CASE WHEN s3 THEN 1 ELSE 0 END) AS BIGINT) AS fail_word_len,
         |       CAST(sum(CASE WHEN s4 THEN 1 ELSE 0 END) AS BIGINT) AS fail_dup_frac,
         |       CAST(sum(CASE WHEN s5 THEN 1 ELSE 0 END) AS BIGINT) AS fail_stopword,
         |       CAST(sum(CASE WHEN NOT s1 AND NOT s2 AND NOT s3 AND NOT s4
         |                 AND NOT s5 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
         |FROM g GROUP BY lang""".stripMargin,

    "text_dsir_weights" ->
      s"""WITH tok AS (
         |  SELECT doc_id, lang,
         |         unnest(string_split_regex(lower(text), '\\s+')) AS tok
         |  FROM documents
         |), db AS (
         |  SELECT doc_id, lang,
         |         ('0x' || substring(md5(tok), 1, 6))::BIGINT
         |           % $DsirBuckets AS bucket,
         |         count(*) AS c
         |  FROM tok WHERE tok <> '' GROUP BY 1, 2, 3
         |), tgt AS (
         |  SELECT bucket, sum(c) AS tc FROM db
         |  WHERE lang = '$DsirTargetLang' GROUP BY 1
         |), alls AS (SELECT bucket, sum(c) AS qc FROM db GROUP BY 1),
         |tot AS (
         |  SELECT sum(CASE WHEN lang = '$DsirTargetLang' THEN c ELSE 0 END)
         |           AS nt,
         |         sum(c) AS nq
         |  FROM db
         |), lw AS (
         |  SELECT a.bucket,
         |         CAST(round(ln((coalesce(t.tc, 0) + 1.0) /
         |                       (tot.nt + $DsirBuckets)) -
         |                    ln((a.qc + 1.0) / (tot.nq + $DsirBuckets)), 9)
         |              AS DECIMAL(14,9)) AS lw
         |  FROM alls a LEFT JOIN tgt t ON a.bucket = t.bucket, tot
         |)
         |SELECT db.doc_id, db.lang,
         |       CAST(sum(db.c) AS BIGINT) AS n_tokens,
         |       round(CAST(sum(db.c * lw.lw) AS DOUBLE), 6) AS log_weight
         |FROM db JOIN lw ON db.bucket = lw.bucket
         |GROUP BY db.doc_id, db.lang
         |ORDER BY log_weight DESC, db.doc_id
         |LIMIT $DsirTopK""".stripMargin,

    "text_corpus_card" ->
      """WITH cell AS (
        |  SELECT source, lang, count(*) AS c,
        |         CAST(sum(len(string_split_regex(lower(text), '\s+')))
        |              AS BIGINT) AS w
        |  FROM documents GROUP BY 1, 2
        |), grp AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_docs,
        |         CAST(sum(w) AS BIGINT) AS n_tokens, count(*) AS n_langs
        |  FROM cell GROUP BY 1
        |)
        |SELECT cell.source,
        |       CAST(max(g.n_docs) AS BIGINT) AS n_docs,
        |       CAST(max(g.n_tokens) AS BIGINT) AS n_tokens,
        |       CAST(max(g.n_langs) AS BIGINT) AS n_langs,
        |       round(CAST(max(g.n_tokens) AS DOUBLE) /
        |             CAST(max(g.n_docs) AS DOUBLE), 4) AS avg_tokens,
        |       round(exp(CAST(sum(CAST(round(
        |           -(CAST(cell.c AS DOUBLE) / CAST(g.n_docs AS DOUBLE)) *
        |           ln(CAST(cell.c AS DOUBLE) / CAST(g.n_docs AS DOUBLE)), 9)
        |         AS DECIMAL(14,9))) AS DOUBLE)), 4) AS eff_langs
        |FROM cell JOIN grp g ON g.source = cell.source
        |GROUP BY 1""".stripMargin,

    "text_ccnet_split" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |         unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents
        |), tk AS (SELECT * FROM tok WHERE tok <> ''),
        |lm AS (SELECT tok, count(*) AS n FROM tk GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn FROM lm),
        |pd AS (
        |  SELECT t.doc_id, t.lang, count(*) AS nt,
        |         sum(CAST(round(-ln(CAST(l.n AS DOUBLE) /
        |                            CAST(tot.nn AS DOUBLE)), 9)
        |             AS DECIMAL(18,9))) AS snll
        |  FROM tk t JOIN lm l ON l.tok = t.tok CROSS JOIN tot
        |  GROUP BY 1, 2
        |), hs AS (
        |  SELECT doc_id, lang,
        |         round(CAST(snll AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS h
        |  FROM pd
        |), b AS (
        |  SELECT lang, h,
        |         row_number() OVER (PARTITION BY lang
        |                            ORDER BY h ASC, doc_id ASC) AS rn,
        |         count(*) OVER (PARTITION BY lang) AS nl
        |  FROM hs
        |)
        |SELECT lang,
        |       CASE WHEN rn * 3 <= nl THEN 'head'
        |            WHEN rn * 3 <= nl * 2 THEN 'middle'
        |            ELSE 'tail' END AS bucket,
        |       count(*) AS n_docs,
        |       round(min(h), 6) AS min_ce, round(max(h), 6) AS max_ce
        |FROM b GROUP BY 1, 2""".stripMargin,

    "text_oov_rate" ->
      """WITH tok AS (
        |  SELECT doc_id, lang,
        |         unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents
        |), tk AS (SELECT * FROM tok WHERE tok <> ''),
        |vocab AS (
        |  SELECT DISTINCT tok, 1 AS in_vocab FROM tk WHERE doc_id % 2 = 0
        |), test AS (
        |  SELECT lang, tok, count(*) AS c FROM tk
        |  WHERE doc_id % 2 = 1 GROUP BY 1, 2
        |)
        |SELECT t.lang,
        |       CAST(sum(t.c) AS BIGINT) AS n_tokens,
        |       CAST(sum(CASE WHEN v.in_vocab IS NULL THEN t.c ELSE 0 END)
        |            AS BIGINT) AS n_oov,
        |       count(*) AS n_types,
        |       CAST(sum(CASE WHEN v.in_vocab IS NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_oov_types,
        |       round(CAST(sum(CASE WHEN v.in_vocab IS NULL THEN t.c ELSE 0
        |                      END) AS DOUBLE) /
        |             CAST(sum(t.c) AS DOUBLE), 6) AS oov_rate
        |FROM test t LEFT JOIN vocab v ON t.tok = v.tok
        |GROUP BY t.lang""".stripMargin)
}
