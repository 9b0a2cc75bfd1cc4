package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Pair-level overlap metrics over the LSH near-duplicate candidates:
  * once banding proposes "these two documents look related", the
  * pipeline needs a graded readout, not just the binary jaccard gate —
  * ROUGE-1/ROUGE-2 precision/recall/F1 (multiset n-gram overlap, the
  * summarization-eval metric repurposed as a duplication profile: high
  * R-1 + low R-2 = shared vocabulary but rewritten text; both high =
  * true near-copy).
  *
  * Scale shape: candidates are the SAME band-equi-join pair set as
  * dedup_minhash_lsh (never all-pairs), read through the
  * [[DedupQueries.lshPairsAll]] memo (r15) — the verified-candidate
  * table a dedup run materializes once; every metric here profiles that
  * artifact rather than replaying the shingle + band pipeline per
  * query (the honest producer `dedup_minhash_lsh` stays raw, and
  * memo-cold bench mode re-pays the derivation). Token/bigram count
  * relations are
  * built ONLY for candidate docs (left-semi on the broadcast candidate
  * id set) and the overlap Σ min(c_a, c_b) is an equi-join on the gram
  * key restricted to those docs. All counts exact integers; the P/R/F
  * divisions are identical IEEE on both engines, rounded to 6.
  */
object PairEvalQueries extends QueryPack {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** Per-doc token cap for text_wer_pairs — keeps the joint pair vocab
    * (≤ 2× this) under the 94 printable ASCII codes the char-remap
    * encoding can address, and bounds the levenshtein DP at O(cap²).
    */
  val WerMaxTokens = 40

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Split-leakage audit over the NEAR-DUP candidate pairs: how many
    // LSH-proposed pairs straddle a naive doc-hash train/eval split
    // (md5(doc_id) % 10, 80/20)? Every straddling pair is an eval
    // document with a near-duplicate in training — the contamination
    // that inflates eval scores and that dedup_split_safe's
    // cluster-keyed split exists to prevent; this query MEASURES the
    // exposure a doc-keyed split would actually have. One aggregation
    // over the band-join candidates (never all-pairs); counts exact,
    // the one released rate is an identical-operand division.
    "dedup_split_leakage" -> ((s, d) => {
      def half(c: org.apache.spark.sql.Column) =
        when(conv(substring(md5(c.cast("string")), 1, 8), 16, 10)
          .cast("long") % 10 < 8, "train").otherwise("eval")
      DedupQueries.lshPairsAll(s, d)
        .select(half(col("doc_a")).as("sa"), half(col("doc_b")).as("sb"))
        .agg(count(lit(1)).as("n_candidate_pairs"),
          sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L))
            .as("n_leaked_pairs"),
          sum(when(col("sa") === "eval" || col("sb") === "eval", 1L)
            .otherwise(0L)).as("n_pairs_touching_eval"))
        .select(col("n_candidate_pairs"), col("n_leaked_pairs"),
          col("n_pairs_touching_eval"),
          round(col("n_leaked_pairs").cast("double") /
            greatest(col("n_candidate_pairs"), lit(1L)).cast("double"), 6)
            .as("leak_rate"))
    }),

    "text_rouge_pairs" -> ((s, d) => {
      val dd = docs(s, d)
      val cand = DedupQueries.lshPairsAll(s, d)
        .select(col("doc_a"), col("doc_b"))
        .transform(graft.CacheScope.persisted(_))
      val candDocs = cand
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
      val toks = dd.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), split(lower(col("text")), "\\s+").as("tk"))
        .transform(graft.CacheScope.persisted(_))
      val uni = toks
        .select(col("doc_id"), explode(col("tk")).as("g"))
        .filter(col("g") =!= "")
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .transform(graft.CacheScope.persisted(_))
      val bi = toks
        .select(col("doc_id"),
          explode(when(size(col("tk")) < 2, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(1), size(col("tk")) - 1),
              i => concat_ws(" ", element_at(col("tk"), i),
                element_at(col("tk"), i + 1))))).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .transform(graft.CacheScope.persisted(_))
      def overlap(g: DataFrame): DataFrame = cand
        .join(g.select(col("doc_id").as("doc_a"), col("g"),
          col("c").as("ca")), Seq("doc_a"))
        .join(g.select(col("doc_id").as("doc_b"), col("g"),
          col("c").as("cb")), Seq("doc_b", "g"))
        .groupBy("doc_a", "doc_b")
        .agg(sum(least(col("ca"), col("cb"))).as("o"))
      val ut = uni.groupBy("doc_id").agg(sum("c").as("n"))
      val bt = bi.groupBy("doc_id").agg(sum("c").as("n"))
      cand
        .join(overlap(uni), Seq("doc_a", "doc_b"), "left")
        .join(overlap(bi).withColumnRenamed("o", "o2"),
          Seq("doc_a", "doc_b"), "left")
        .join(ut.select(col("doc_id").as("doc_a"), col("n").as("na1")), "doc_a")
        .join(ut.select(col("doc_id").as("doc_b"), col("n").as("nb1")), "doc_b")
        .join(bt.select(col("doc_id").as("doc_a"), col("n").as("na2")), "doc_a")
        .join(bt.select(col("doc_id").as("doc_b"), col("n").as("nb2")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          coalesce(col("o"), lit(0L)).as("n1_overlap"),
          round(coalesce(col("o"), lit(0L)).cast("double") /
            col("nb1").cast("double"), 6).as("r1_prec"),
          round(coalesce(col("o"), lit(0L)).cast("double") /
            col("na1").cast("double"), 6).as("r1_rec"),
          round(lit(2.0) * coalesce(col("o"), lit(0L)).cast("double") /
            (col("na1") + col("nb1")).cast("double"), 6).as("r1_f1"),
          round(lit(2.0) * coalesce(col("o2"), lit(0L)).cast("double") /
            (col("na2") + col("nb2")).cast("double"), 6).as("r2_f1"))
    }),

    // BLEU-2 over the same LSH candidates (doc_a = reference, doc_b =
    // hypothesis): clipped n-gram precisions p_n = Σ min(c_hyp, c_ref) /
    // Σ c_hyp for n=1,2, geometric mean via sqrt (IEEE-exact, unlike the
    // exp(mean(ln p)) form — library exp/ln are not correctly rounded
    // across engines), and a LINEAR brevity penalty min(1, |hyp|/|ref|)
    // in place of the exponential one for the same determinism reason
    // (documented variant; the ordering it induces is the same in the
    // c ≤ r regime that matters). Every operation is a correctly-rounded
    // IEEE op on exact integers, so the two engines agree bit-for-bit.
    "text_bleu_pairs" -> ((s, d) => {
      val dd = docs(s, d)
      val cand = DedupQueries.lshPairsAll(s, d)
        .select(col("doc_a"), col("doc_b"))
        .transform(graft.CacheScope.persisted(_))
      val candDocs = cand
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
      val toks = dd.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), split(lower(col("text")), "\\s+").as("tk"))
        .transform(graft.CacheScope.persisted(_))
      val uni = toks
        .select(col("doc_id"), explode(col("tk")).as("g"))
        .filter(col("g") =!= "")
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .transform(graft.CacheScope.persisted(_))
      val bi = toks
        .select(col("doc_id"),
          explode(when(size(col("tk")) < 2, array().cast("array<string>"))
            .otherwise(transform(sequence(lit(1), size(col("tk")) - 1),
              i => concat_ws(" ", element_at(col("tk"), i),
                element_at(col("tk"), i + 1))))).as("g"))
        .groupBy("doc_id", "g").agg(count(lit(1)).as("c"))
        .transform(graft.CacheScope.persisted(_))
      def overlap(g: DataFrame): DataFrame = cand
        .join(g.select(col("doc_id").as("doc_a"), col("g"),
          col("c").as("ca")), Seq("doc_a"))
        .join(g.select(col("doc_id").as("doc_b"), col("g"),
          col("c").as("cb")), Seq("doc_b", "g"))
        .groupBy("doc_a", "doc_b")
        .agg(sum(least(col("ca"), col("cb"))).as("o"))
      val ut = uni.groupBy("doc_id").agg(sum("c").as("n"))
      val bt = bi.groupBy("doc_id").agg(sum("c").as("n"))
      cand
        .join(overlap(uni), Seq("doc_a", "doc_b"), "left")
        .join(overlap(bi).withColumnRenamed("o", "o2"),
          Seq("doc_a", "doc_b"), "left")
        .join(ut.select(col("doc_id").as("doc_a"), col("n").as("na1")), "doc_a")
        .join(ut.select(col("doc_id").as("doc_b"), col("n").as("nb1")), "doc_b")
        .join(bt.select(col("doc_id").as("doc_b"), col("n").as("nb2")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          round(coalesce(col("o"), lit(0L)).cast("double") /
            col("nb1").cast("double"), 6).as("p1"),
          round(when(col("nb2") === 0, lit(0.0)).otherwise(
            coalesce(col("o2"), lit(0L)).cast("double") /
              col("nb2").cast("double")), 6).as("p2"),
          round(least(lit(1.0),
            col("nb1").cast("double") / col("na1").cast("double")), 6)
            .as("bp"),
          round(least(lit(1.0),
            col("nb1").cast("double") / col("na1").cast("double")) *
            sqrt((coalesce(col("o"), lit(0L)).cast("double") /
              col("nb1").cast("double")) *
              when(col("nb2") === 0, lit(0.0)).otherwise(
                coalesce(col("o2"), lit(0L)).cast("double") /
                  col("nb2").cast("double"))), 6).as("bleu2"))
    }),

    // Token-level word error rate over the same LSH candidates (doc_a =
    // reference): the alignment DP rides the engines' NATIVE levenshtein
    // by remapping each pair's joint token vocabulary onto single ASCII
    // characters — tokens are sliced to the first [[WerMaxTokens]] per
    // doc, so the joint vocab (≤ 2·[[WerMaxTokens]] < 94 printable ASCII
    // codes) always fits, the per-pair encoding is a deterministic
    // function of the sorted distinct vocab, and one string levenshtein
    // IS the token edit distance. O(L²) per candidate pair with L
    // bounded — never a hand-rolled DP kernel in either engine.
    "text_wer_pairs" -> ((s, d) => {
      val dd = docs(s, d)
      val cand = DedupQueries.lshPairsAll(s, d)
        .select(col("doc_a"), col("doc_b"))
        .transform(graft.CacheScope.persisted(_))
      val candDocs = cand
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
      val toks = dd.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), expr(
          s"""slice(filter(split(lower(text), '\\\\s+'), t -> t <> ''),
             |      1, $WerMaxTokens)""".stripMargin).as("tk"))
        .transform(graft.CacheScope.persisted(_))
      cand
        .join(toks.select(col("doc_id").as("doc_a"), col("tk").as("ta")),
          Seq("doc_a"))
        .join(toks.select(col("doc_id").as("doc_b"), col("tk").as("tb")),
          Seq("doc_b"))
        .filter(size(col("ta")) > 0 && size(col("tb")) > 0)
        .withColumn("v", array_sort(array_distinct(
          concat(col("ta"), col("tb")))))
        .select(col("doc_a"), col("doc_b"),
          size(col("ta")).as("len_ref"), size(col("tb")).as("len_hyp"),
          levenshtein(
            expr("concat_ws('', transform(ta, t -> chr(32 + array_position(v, t))))"),
            expr("concat_ws('', transform(tb, t -> chr(32 + array_position(v, t))))"))
            .as("lev_tokens"))
        .withColumn("wer",
          round(col("lev_tokens").cast("double") /
            col("len_ref").cast("double"), 6))
    }),

    // IDF-weighted Jaccard over the same LSH candidates — plain set
    // jaccard next to the version where each shared token counts its
    // ln(N/df) rarity: two documents that agree only on boilerplate
    // ("the", "a", frequent fillers) score high on the plain metric and
    // collapse on the weighted one, which is the ranking a precision-
    // tuned dedup gate actually wants. Weights are round(idf*1e6)
    // integers (one corpus-level df aggregation; N rides a broadcast
    // 1-row count), so both sums and the final divisions are exact-int
    // based; per-doc totals and the pair intersection are equi-joins
    // restricted to candidate docs.
    "dedup_weighted_jaccard" -> ((s, d) => {
      val dd = docs(s, d)
      val cand = DedupQueries.lshPairsAll(s, d)
        .select(col("doc_a"), col("doc_b"))
        .transform(graft.CacheScope.persisted(_))
      val candDocs = cand
        .select(explode(array(col("doc_a"), col("doc_b"))).as("doc_id"))
        .distinct()
      val tokAll = dd
        .select(col("doc_id"),
          explode(split(lower(col("text")), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
        .distinct()
        .transform(graft.CacheScope.persisted(_))
      val dfreq = tokAll.groupBy("tok").agg(count(lit(1)).as("df"))
      val nDocs = dd.agg(count(lit(1)).as("nd"))
      val w = tokAll.join(broadcast(candDocs), Seq("doc_id"), "left_semi")
        .join(dfreq, Seq("tok"))
        .crossJoin(broadcast(nDocs))
        .select(col("doc_id"), col("tok"),
          round(log(col("nd").cast("double") / col("df").cast("double")) *
            lit(1000000.0), 0).cast("long").as("w6"))
        .transform(graft.CacheScope.persisted(_))
      val tw = w.groupBy("doc_id")
        .agg(sum(col("w6")).as("tw"), count(lit(1)).as("tn"))
      val inter = cand
        .join(w.select(col("doc_id").as("doc_a"), col("tok"), col("w6")),
          Seq("doc_a"))
        .join(w.select(col("doc_id").as("doc_b"), col("tok")),
          Seq("doc_b", "tok"))
        .groupBy("doc_a", "doc_b")
        .agg(sum(col("w6")).as("iw"), count(lit(1)).as("ic"))
      cand
        .join(inter, Seq("doc_a", "doc_b"), "left")
        .join(tw.select(col("doc_id").as("doc_a"), col("tw").as("twa"),
          col("tn").as("tna")), "doc_a")
        .join(tw.select(col("doc_id").as("doc_b"), col("tw").as("twb"),
          col("tn").as("tnb")), "doc_b")
        .select(col("doc_a"), col("doc_b"),
          coalesce(col("ic"), lit(0L)).as("n_shared_tokens"),
          round(coalesce(col("ic"), lit(0L)).cast("double") /
            (col("tna") + col("tnb") - coalesce(col("ic"), lit(0L)))
              .cast("double"), 6).as("jaccard_plain"),
          // A pair of all-boilerplate docs (every token idf 0) has a
          // zero weighted union: define the score as 0, not NaN.
          round(when(col("twa") + col("twb") - coalesce(col("iw"), lit(0L)) === 0,
            lit(0.0)).otherwise(
            coalesce(col("iw"), lit(0L)).cast("double") /
              (col("twa") + col("twb") - coalesce(col("iw"), lit(0L)))
                .cast("double")), 6).as("jaccard_weighted"))
    }))

  override val oracles: Map[String, String] = Map(

    "dedup_split_leakage" ->
      s"""${DedupQueries.bandsCte},
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |   AND a.doc_id < b.doc_id
         |), lab AS (
         |  SELECT CASE WHEN ('0x' || substring(md5(CAST(doc_a AS VARCHAR)), 1, 8))::BIGINT % 10 < 8
         |              THEN 'train' ELSE 'eval' END AS sa,
         |         CASE WHEN ('0x' || substring(md5(CAST(doc_b AS VARCHAR)), 1, 8))::BIGINT % 10 < 8
         |              THEN 'train' ELSE 'eval' END AS sb
         |  FROM cand
         |)
         |SELECT count(*) AS n_candidate_pairs,
         |       CAST(sum(CASE WHEN sa <> sb THEN 1 ELSE 0 END) AS BIGINT) AS n_leaked_pairs,
         |       CAST(sum(CASE WHEN sa = 'eval' OR sb = 'eval' THEN 1 ELSE 0 END) AS BIGINT) AS n_pairs_touching_eval,
         |       round(CAST(sum(CASE WHEN sa <> sb THEN 1 ELSE 0 END) AS DOUBLE) /
         |             CAST(greatest(count(*), 1) AS DOUBLE), 6) AS leak_rate
         |FROM lab""".stripMargin,

    "text_rouge_pairs" ->
      s"""${DedupQueries.bandsCte},
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |   AND a.doc_id < b.doc_id
         |), cd AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT doc_a AS doc_id FROM cand
         |    UNION ALL SELECT doc_b FROM cand)
         |), tk AS (
         |  SELECT d.doc_id, string_split_regex(lower(d.text), '\\s+') AS t
         |  FROM documents d JOIN cd USING (doc_id)
         |), uni AS (
         |  SELECT doc_id, g, count(*) AS c
         |  FROM (SELECT doc_id, unnest(t) AS g FROM tk)
         |  WHERE g <> '' GROUP BY 1, 2
         |), bi AS (
         |  SELECT doc_id, g, count(*) AS c
         |  FROM (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
         |        FROM (SELECT doc_id, t,
         |                     unnest(range(1, greatest(len(t), 1))) AS i
         |              FROM tk))
         |  GROUP BY 1, 2
         |), ut AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM uni GROUP BY 1),
         |bt AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM bi GROUP BY 1),
         |o1 AS (
         |  SELECT c.doc_a, c.doc_b, CAST(sum(least(ua.c, ub.c)) AS BIGINT) AS o
         |  FROM cand c
         |  JOIN uni ua ON ua.doc_id = c.doc_a
         |  JOIN uni ub ON ub.doc_id = c.doc_b AND ub.g = ua.g
         |  GROUP BY 1, 2
         |), o2 AS (
         |  SELECT c.doc_a, c.doc_b, CAST(sum(least(ba.c, bb.c)) AS BIGINT) AS o
         |  FROM cand c
         |  JOIN bi ba ON ba.doc_id = c.doc_a
         |  JOIN bi bb ON bb.doc_id = c.doc_b AND bb.g = ba.g
         |  GROUP BY 1, 2
         |)
         |SELECT c.doc_a, c.doc_b,
         |       COALESCE(o1.o, 0) AS n1_overlap,
         |       round(CAST(COALESCE(o1.o, 0) AS DOUBLE) / CAST(utb.n AS DOUBLE), 6) AS r1_prec,
         |       round(CAST(COALESCE(o1.o, 0) AS DOUBLE) / CAST(uta.n AS DOUBLE), 6) AS r1_rec,
         |       round(2.0 * CAST(COALESCE(o1.o, 0) AS DOUBLE) /
         |             CAST(uta.n + utb.n AS DOUBLE), 6) AS r1_f1,
         |       round(2.0 * CAST(COALESCE(o2.o, 0) AS DOUBLE) /
         |             CAST(bta.n + btb.n AS DOUBLE), 6) AS r2_f1
         |FROM cand c
         |LEFT JOIN o1 ON o1.doc_a = c.doc_a AND o1.doc_b = c.doc_b
         |LEFT JOIN o2 ON o2.doc_a = c.doc_a AND o2.doc_b = c.doc_b
         |JOIN ut uta ON uta.doc_id = c.doc_a
         |JOIN ut utb ON utb.doc_id = c.doc_b
         |JOIN bt bta ON bta.doc_id = c.doc_a
         |JOIN bt btb ON btb.doc_id = c.doc_b""".stripMargin,

    "text_bleu_pairs" ->
      s"""${DedupQueries.bandsCte},
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |   AND a.doc_id < b.doc_id
         |), cd AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT doc_a AS doc_id FROM cand
         |    UNION ALL SELECT doc_b FROM cand)
         |), tk AS (
         |  SELECT d.doc_id, string_split_regex(lower(d.text), '\\s+') AS t
         |  FROM documents d JOIN cd USING (doc_id)
         |), uni AS (
         |  SELECT doc_id, g, count(*) AS c
         |  FROM (SELECT doc_id, unnest(t) AS g FROM tk)
         |  WHERE g <> '' GROUP BY 1, 2
         |), bi AS (
         |  SELECT doc_id, g, count(*) AS c
         |  FROM (SELECT doc_id, array_to_string(t[i:i+1], ' ') AS g
         |        FROM (SELECT doc_id, t,
         |                     unnest(range(1, greatest(len(t), 1))) AS i
         |              FROM tk))
         |  GROUP BY 1, 2
         |), ut AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM uni GROUP BY 1),
         |bt AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS n FROM bi GROUP BY 1),
         |o1 AS (
         |  SELECT c.doc_a, c.doc_b, CAST(sum(least(ua.c, ub.c)) AS BIGINT) AS o
         |  FROM cand c
         |  JOIN uni ua ON ua.doc_id = c.doc_a
         |  JOIN uni ub ON ub.doc_id = c.doc_b AND ub.g = ua.g
         |  GROUP BY 1, 2
         |), o2 AS (
         |  SELECT c.doc_a, c.doc_b, CAST(sum(least(ba.c, bb.c)) AS BIGINT) AS o
         |  FROM cand c
         |  JOIN bi ba ON ba.doc_id = c.doc_a
         |  JOIN bi bb ON bb.doc_id = c.doc_b AND bb.g = ba.g
         |  GROUP BY 1, 2
         |), m AS (
         |  SELECT c.doc_a, c.doc_b,
         |         CAST(COALESCE(o1.o, 0) AS DOUBLE) / CAST(utb.n AS DOUBLE) AS p1,
         |         CASE WHEN btb.n = 0 THEN 0.0
         |              ELSE CAST(COALESCE(o2.o, 0) AS DOUBLE) / CAST(btb.n AS DOUBLE)
         |         END AS p2,
         |         least(1.0, CAST(utb.n AS DOUBLE) / CAST(uta.n AS DOUBLE)) AS bp
         |  FROM cand c
         |  LEFT JOIN o1 ON o1.doc_a = c.doc_a AND o1.doc_b = c.doc_b
         |  LEFT JOIN o2 ON o2.doc_a = c.doc_a AND o2.doc_b = c.doc_b
         |  JOIN ut uta ON uta.doc_id = c.doc_a
         |  JOIN ut utb ON utb.doc_id = c.doc_b
         |  JOIN bt btb ON btb.doc_id = c.doc_b
         |)
         |SELECT doc_a, doc_b, round(p1, 6) AS p1, round(p2, 6) AS p2,
         |       round(bp, 6) AS bp, round(bp * sqrt(p1 * p2), 6) AS bleu2
         |FROM m""".stripMargin,

    "text_wer_pairs" ->
      s"""${DedupQueries.bandsCte},
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |   AND a.doc_id < b.doc_id
         |), cd AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT doc_a AS doc_id FROM cand
         |    UNION ALL SELECT doc_b FROM cand)
         |), tk AS (
         |  SELECT d.doc_id,
         |         (list_filter(string_split_regex(lower(d.text), '\\s+'),
         |                      t -> t <> ''))[1:$WerMaxTokens] AS tk
         |  FROM documents d JOIN cd USING (doc_id)
         |), p AS (
         |  SELECT c.doc_a, c.doc_b, a.tk AS ta, b.tk AS tb,
         |         list_sort(list_distinct(a.tk || b.tk)) AS v
         |  FROM cand c
         |  JOIN tk a ON a.doc_id = c.doc_a
         |  JOIN tk b ON b.doc_id = c.doc_b
         |  WHERE len(a.tk) > 0 AND len(b.tk) > 0
         |), q AS (
         |  SELECT doc_a, doc_b,
         |         CAST(len(ta) AS INT) AS len_ref,
         |         CAST(len(tb) AS INT) AS len_hyp,
         |         levenshtein(
         |           array_to_string(list_transform(ta,
         |             t -> chr(CAST(32 + list_position(v, t) AS INT))), ''),
         |           array_to_string(list_transform(tb,
         |             t -> chr(CAST(32 + list_position(v, t) AS INT))), '')) AS lev
         |  FROM p
         |)
         |SELECT doc_a, doc_b, len_ref, len_hyp,
         |       CAST(lev AS INT) AS lev_tokens,
         |       round(CAST(lev AS DOUBLE) / len_ref, 6) AS wer
         |FROM q""".stripMargin,

    "dedup_weighted_jaccard" ->
      s"""${DedupQueries.bandsCte},
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key
         |   AND a.doc_id < b.doc_id
         |), cd AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT doc_a AS doc_id FROM cand
         |    UNION ALL SELECT doc_b FROM cand)
         |), tokall AS (
         |  SELECT DISTINCT doc_id, tok FROM (
         |    SELECT doc_id, unnest(string_split_regex(lower(text), '\\s+')) AS tok
         |    FROM documents)
         |  WHERE tok <> ''
         |), dfreq AS (SELECT tok, count(*) AS df FROM tokall GROUP BY 1),
         |nd AS (SELECT count(*) AS nd FROM documents),
         |w AS (
         |  SELECT t.doc_id, t.tok,
         |         CAST(round(ln(CAST(n.nd AS DOUBLE) / CAST(f.df AS DOUBLE)) * 1000000.0, 0)
         |              AS BIGINT) AS w6
         |  FROM tokall t
         |  JOIN cd USING (doc_id)
         |  JOIN dfreq f ON f.tok = t.tok
         |  CROSS JOIN nd n
         |), tw AS (
         |  SELECT doc_id, CAST(sum(w6) AS BIGINT) AS tw, count(*) AS tn
         |  FROM w GROUP BY 1
         |), inter AS (
         |  SELECT c.doc_a, c.doc_b, CAST(sum(wa.w6) AS BIGINT) AS iw, count(*) AS ic
         |  FROM cand c
         |  JOIN w wa ON wa.doc_id = c.doc_a
         |  JOIN w wb ON wb.doc_id = c.doc_b AND wb.tok = wa.tok
         |  GROUP BY 1, 2
         |)
         |SELECT c.doc_a, c.doc_b,
         |       COALESCE(i.ic, 0) AS n_shared_tokens,
         |       round(CAST(COALESCE(i.ic, 0) AS DOUBLE) /
         |             CAST(ta.tn + tb.tn - COALESCE(i.ic, 0) AS DOUBLE), 6) AS jaccard_plain,
         |       round(CASE WHEN ta.tw + tb.tw - COALESCE(i.iw, 0) = 0 THEN 0.0
         |             ELSE CAST(COALESCE(i.iw, 0) AS DOUBLE) /
         |                  CAST(ta.tw + tb.tw - COALESCE(i.iw, 0) AS DOUBLE) END, 6) AS jaccard_weighted
         |FROM cand c
         |LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
         |JOIN tw ta ON ta.doc_id = c.doc_a
         |JOIN tw tb ON tb.doc_id = c.doc_b""".stripMargin)
}
