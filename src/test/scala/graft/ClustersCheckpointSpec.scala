package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.functions._

import graft.dedup.{DedupClusters, DedupQueries}

/** End-to-end exercise of the RELIABLE-checkpoint path (VERDICT r2 next
  * round #7): the `checkpointDir` knob must actually write checkpoint
  * files to the shared path, truncate the iteration lineage onto them,
  * and produce the exact clusters the default (executor-local) path
  * produces. On a real cluster this is the difference between a fixpoint
  * loop that survives executor churn and one that dies with its first
  * lost block — ARCHITECTURE.md documents when to flip it.
  */
class ClustersCheckpointSpec extends SparkSpec {

  private def walk(dir: Path): Seq[Path] = {
    val s = Files.walk(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toVector
    } finally s.close()
  }

  test("checkpointDir writes reliable checkpoints, truncates lineage, same result") {
    val dir = Files.createTempDirectory("graft-ckpt")
    val docs = Tables.load(spark, sfDir, "documents")
    val pairs = DedupQueries.lshPairs(docs)
      .filter(col("jaccard") >= 0.3)
      .select(col("doc_a"), col("doc_b"))
    val universe = docs.select(col("doc_id"))
    try {
      val reliable = DedupClusters.clusters(pairs, universe,
        checkpointDir = Some(dir.toString))
      val got = reliable.collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      CacheScope.releaseAll()

      // 1. checkpoint FILES exist under the shared path (rdd-* part files)
      val files = walk(dir).filter(p => Files.isRegularFile(p))
      assert(files.nonEmpty, s"no checkpoint files written under $dir")
      assert(walk(dir).exists(_.getFileName.toString.startsWith("rdd-")),
        "expected ReliableCheckpointRDD directories (rdd-*)")

      // 2. lineage is truncated onto the checkpoints: the labels branch of
      // the final join reads the materialized checkpoint (ExistingRDD),
      // and the ONLY parquet scan left in the plan is the universe — the
      // whole LSH candidate DAG is gone from the lineage
      val plan = reliable.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0) // AQE reprints the pre-adaptive plan
      assert(plan.contains("ExistingRDD"), plan.take(2000))
      val parquetScans = "Scan parquet".r.findAllIn(plan).size
      assert(parquetScans == 1,
        s"expected only the universe scan, got $parquetScans parquet scans:\n${plan.take(2000)}")

      // 3. identical clusters to the default local-checkpoint path
      val local = DedupClusters.clusters(pairs, universe)
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      assert(got === local)
      assert(got.nonEmpty)
    } finally {
      CacheScope.releaseAll()
      walk(dir).reverse.foreach(p => try Files.deleteIfExists(p) catch { case _: Throwable => })
    }
  }
}
