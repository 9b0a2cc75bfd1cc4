package graft.dedup

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev profiler for the LSH pipeline stages (like Scratch, but one timing
  * per pipeline stage — counts each sub-relation, then writes the clusters
  * edge relation the way DedupClusters does). Used to attribute the r3
  * dedup_clusters regression; keep for future perf rounds.
  */
object ProfileLsh {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[lsh] $what%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 4).foreach { round =>
      println(s"--- round $round")
      val docs = Tables.load(spark, sfDir, "documents")
      val pairs = DedupQueries.lshPairs(docs)
        .filter(col("jaccard") >= 0.3).select(col("doc_a"), col("doc_b"))
      val ed = pairs.select(explode(array(
          struct(col("doc_a").as("src"), col("doc_b").as("dst")),
          struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      val tmp = java.nio.file.Files.createTempDirectory("lshprof-").toString
      timed("edges.write")(ed.write.mode("overwrite").parquet(s"$tmp/edges.parquet"))
      graft.CacheScope.releaseAll()
    }
    spark.stop()
  }
}
