package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main for mstOf — not part of the product surface. */
object MstProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    org.apache.log4j.LogManager.getLogger("graft.graph").setLevel(org.apache.log4j.Level.INFO)
    val d = "/root/testdata/sf0.1"
    // warmup
    graft.graph.GraphPathQueries.queries("q_graph_mst")(spark, d).count()
    CacheScope.releaseAll()
    val t0 = System.nanoTime()
    val n = graft.graph.GraphPathQueries.queries("q_graph_mst")(spark, d).count()
    println(f"[probe] mst rows=$n total=${(System.nanoTime() - t0) / 1e9}%.2f s")
    CacheScope.releaseAll()
    spark.stop()
  }
}
