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
  * Scale shape: candidates come from the SAME band equi-join as
  * dedup_minhash_lsh (never all-pairs); token/bigram count relations are
  * built ONLY for candidate docs (left-semi on the broadcast candidate
  * id set) and the overlap Σ min(c_a, c_b) is an equi-join on the gram
  * key restricted to those docs. All counts exact integers; the P/R/F
  * divisions are identical IEEE on both engines, rounded to 6.
  */
object PairEvalQueries extends QueryPack {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "text_rouge_pairs" -> ((s, d) => {
      val dd = docs(s, d)
      val sh = Shingles.docShingles(dd)
        .transform(graft.CacheScope.persisted(_))
      val cand = DedupQueries.lshCandidates(sh)
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
    }))

  override val oracles: Map[String, String] = Map(

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
         |JOIN bt btb ON btb.doc_id = c.doc_b""".stripMargin)
}
