package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Corpus-mixing dedup READOUTS (r14; split from [[DedupQueries]] per the
  * per-file 1,000-line budget — keys and oracles byte-identical): the
  * per-source near-dup contamination table and the Jaccard threshold
  * calibration histogram. Both are one-page gauges a curation run reads
  * before committing to a mixing or threshold decision; both consume the
  * shared machinery ([[DedupQueries.clusterLabels]] labels memo,
  * [[DedupQueries.lshPairs]]) so the expensive lineages are never
  * re-derived here.
  */
object DedupReportQueries extends QueryPack {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Threshold CALIBRATION curve (r14): the LSH candidate pairs
    // histogrammed into 0.05-wide Jaccard buckets — the one-page readout
    // that justifies the 0.3 clustering threshold before a run commits
    // to it (a bimodal histogram separates boilerplate families from
    // band-collision noise; a flat one says the bands are too loose).
    // One bounded aggregation over the verified pair relation; bucket
    // arithmetic is the same IEEE double ops in both engines. The pair
    // relation rides [[DedupQueries.lshPairsAll]] (r15): the sweep needs
    // the UNTHRESHOLDED jaccard column, which is exactly what that memo
    // now materializes — the honest pipeline cost stays on
    // dedup_minhash_lsh.
    "dedup_threshold_sweep" -> ((s, d) =>
      DedupQueries.lshPairsAll(s, d)
        .select(floor(col("jaccard") * 20).cast("int").as("bucket"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_pairs"))
        .select(col("bucket"),
          round(col("bucket") / lit(20.0), 2).as("jaccard_lo"),
          col("n_pairs"))),

    // Per-SOURCE near-dup contamination (r14): for each document source,
    // the fraction of its docs that sit in a multi-document near-dup
    // cluster — the readout a corpus-mixing decision reads next to
    // text_source_similarity (a source that is 40% near-dup against the
    // pool adds far less novel data than its row count claims, and
    // up-weighting it double-feeds the duplicates). Fourth LabelsMemo
    // consumer: global cluster sizes are one bounded aggregation over
    // the materialized labels; the size attach is a cluster-keyed
    // equi-join (|clusters| rows — NOT broadcast: at 100 TB the cluster
    // relation is corpus-sized), then one groupBy(source). Exact-count
    // double pinned at 6.
    "dedup_rate_by_source" -> ((s, d) => {
      val lbl = DedupQueries.clusterLabels(s, d)
        .transform(graft.CacheScope.persisted(_))
      val sizes = lbl.groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
      lbl.join(sizes, "cluster_id")
        .join(docs(s, d).select(col("doc_id"), col("source")), "doc_id")
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("sz") > 1, 1L).otherwise(0L)).as("n_dup_docs"))
        .select(col("source"), col("n_docs"), col("n_dup_docs"),
          round(col("n_dup_docs").cast("double") /
            col("n_docs").cast("double"), 6).as("dup_frac"))
    })
  )

  override val oracles: Map[String, String] = Map(
    // Same candidate/verify CTEs as dedup_minhash_lsh, bucketed.
    "dedup_threshold_sweep" ->
      s"""${DedupQueries.bandsCte},
         |cand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         count(*) AS n_shared_bands
         |  FROM bands a JOIN bands b
         |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2
         |), sz AS (SELECT doc_id, count(*) AS sz FROM sh GROUP BY doc_id),
         |inter AS (
         |  SELECT c.doc_a, c.doc_b, count(*) AS inter
         |  FROM cand c
         |  JOIN sh sa ON sa.doc_id = c.doc_a
         |  JOIN sh sb ON sb.doc_id = c.doc_b AND sb.h = sa.h
         |  GROUP BY 1, 2
         |), pj AS (
         |  SELECT round(CAST(COALESCE(i.inter, 0) AS DOUBLE) /
         |               (za.sz + zb.sz - COALESCE(i.inter, 0)), 6) AS jaccard
         |  FROM cand c
         |  LEFT JOIN inter i ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
         |  JOIN sz za ON za.doc_id = c.doc_a
         |  JOIN sz zb ON zb.doc_id = c.doc_b
         |)
         |SELECT CAST(floor(jaccard * 20) AS INT) AS bucket,
         |       round(CAST(floor(jaccard * 20) AS INT) / 20.0, 2) AS jaccard_lo,
         |       count(*) AS n_pairs
         |FROM pj GROUP BY 1, 2""".stripMargin,

    // Same cluster labels joined back to sources; sizes are global.
    "dedup_rate_by_source" ->
      s"""${DedupQueries.clustersCtes},
         |csz AS (
         |  SELECT cluster_id, count(*) AS sz FROM lbl GROUP BY 1
         |)
         |SELECT d.source, count(*) AS n_docs,
         |       CAST(sum(CASE WHEN z.sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_dup_docs,
         |       round(CAST(sum(CASE WHEN z.sz > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |             / count(*), 6) AS dup_frac
         |FROM lbl l
         |JOIN csz z USING (cluster_id)
         |JOIN documents d USING (doc_id)
         |GROUP BY d.source""".stripMargin
  )
}
