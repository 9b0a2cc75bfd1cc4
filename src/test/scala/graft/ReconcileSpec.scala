package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.dedup.DedupClusters

/** [[DedupClusters.reconcile]] must land on EXACTLY the labels that
  * from-scratch clustering of corpus ∪ batch produces — including the
  * hard cases: a new document bridging two standing clusters (they must
  * merge, and every member of both must relabel), new↔new pairs forming
  * batch-only clusters, and unpaired new documents staying singletons.
  */
class ReconcileSpec extends SparkSpec {

  private def edges(pairs: (Long, Long)*): DataFrame = {
    val rows = pairs.map { case (a, b) => Row(a, b) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("doc_a", LongType), StructField("doc_b", LongType))))
  }

  private def ids(xs: Seq[Long]): DataFrame = {
    val rows = xs.map(Row(_))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("doc_id", LongType))))
  }

  private def labelMap(df: DataFrame): Map[Long, Long] =
    df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("reconcile == from-scratch clustering of the union (bridge merge included)") {
    // Corpus docs 0..9; standing clusters from corpus edges:
    //   {0,1}, {2,3}, singletons 4..9.
    // New batch 100..103; probe edges:
    //   100-1 and 100-3  -> 100 BRIDGES clusters 0 and 2: all five
    //                       documents must merge under label 0;
    //   101-102          -> a batch-only pair, label 101;
    //   103              -> unpaired, stays a singleton.
    val corpusDocs = (0L to 9L)
    val newDocs = Seq(100L, 101L, 102L, 103L)
    val corpusEdges = edges((0L, 1L), (2L, 3L))
    val probeEdges = edges((100L, 1L), (100L, 3L), (101L, 102L))
    try {
      val standing = DedupClusters.clusters(corpusEdges, ids(corpusDocs))
      val got = labelMap(
        DedupClusters.reconcile(standing, probeEdges, ids(newDocs)))
      CacheScope.releaseAll()
      val scratch = labelMap(DedupClusters.clusters(
        edges((0L, 1L), (2L, 3L), (100L, 1L), (100L, 3L), (101L, 102L)),
        ids(corpusDocs ++ newDocs)))
      assert(got == scratch,
        s"reconcile diverges from from-scratch: got $got, want $scratch")
      // and the from-scratch truth is what the construction promises
      assert(scratch(0L) == 0L && scratch(1L) == 0L && scratch(2L) == 0L &&
        scratch(3L) == 0L && scratch(100L) == 0L, "bridge must merge to 0")
      assert(scratch(101L) == 101L && scratch(102L) == 101L)
      assert(scratch(103L) == 103L && scratch(7L) == 7L)
    } finally CacheScope.releaseAll()
  }

  test("a new doc with the new minimum id becomes the merged cluster's label") {
    // Probe pair (5, 1) where 1 is standing-clustered with 3 under label
    // 1... here standing {1,3} has label 1; new doc 0 pairs with 3: the
    // union cluster's min is the NEW doc, so corpus members must relabel
    // to the new doc's id — the direction a naive "attach batch to
    // standing labels" implementation gets wrong.
    val corpusDocs = Seq(1L, 2L, 3L)
    val newDocs = Seq(0L)
    try {
      val standing = DedupClusters.clusters(edges((1L, 3L)), ids(corpusDocs))
      val got = labelMap(
        DedupClusters.reconcile(standing, edges((0L, 3L)), ids(newDocs)))
      assert(got == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 0L), s"got $got")
    } finally CacheScope.releaseAll()
  }
}

/** [[LabelsMemo]]: compute-once semantics, value fidelity through the
  * parquet round-trip, and key bookkeeping.
  */
class LabelsMemoSpec extends SparkSpec {
  import spark.implicits._

  test("first call computes+materializes, later calls read the same rows") {
    val key = s"memo-spec-${System.nanoTime()}"
    var computes = 0
    def rel = {
      computes += 1
      Seq((1L, 10L), (2L, 10L), (3L, 3L)).toDF("doc_id", "cluster_id")
    }
    val a = LabelsMemo.getOrCompute(key, spark)(rel).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = LabelsMemo.getOrCompute(key, spark)(rel).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(computes == 1, "second call must not recompute")
    assert(a == b && a == Set((1L, 10L), (2L, 10L), (3L, 3L)))
    assert(LabelsMemo.keys.contains(key))
  }
}
