package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev bisection for the q_graph_ppr vs q_graph_pagerank cost gap:
  * times the uniform walk, a seed-COLUMN variant that still adds the
  * uniform base (isolates the extra column), and the real PPR restart.
  */
object PprProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.graph.GraphQueries

    def time(what: String)(f: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = f.count()
      println(f"[pprprobe] $what%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s  rows=$n")
      CacheScope.releaseAll()
    }

    def walk(seedRestart: Boolean, seededInit: Boolean,
        frontierPrune: Boolean = false): DataFrame = {
      val edgesDf = Tables.load(spark, sfDir, "lineitem")
        .groupBy(col("l_orderkey")).agg(collect_set(col("l_partkey")).as("pks"))
        .select(explode(col("pks")).as("src"), col("pks"))
        .select(col("src"), explode(array_remove(col("pks"), col("src"))).as("dst"))
        .distinct()
      val e = edgesDf.transform(CacheScope.persisted(_))
      val deg = e.groupBy("src").agg(count(lit(1)).as("outdeg"))
        .transform(CacheScope.persisted(_))
      val ed = e.join(deg, "src")
        .select(col("src"), col("dst"), col("outdeg"))
        .transform(CacheScope.persisted(_))
      val nodes = deg.select(col("src").as("node"),
        (col("src") % GraphQueries.PprSeedMod === 0).as("seed"))
      val base = (100L - GraphQueries.DampPct) * GraphQueries.Scale / 100L
      var r = nodes.select(col("node"),
        (if (seededInit) when(col("seed"), lit(GraphQueries.Scale)).otherwise(lit(0L))
         else lit(GraphQueries.Scale)).as("r"))
      if (frontierPrune) r = r.filter(col("r") > 0)
      for (_ <- 1 to GraphQueries.Iters) {
        val contrib = ed.join(r, col("src") === col("node"))
          .select(col("dst"), expr("r div outdeg").as("c"))
          .groupBy("dst").agg(sum(col("c")).as("contrib"))
        r = nodes
          .join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            ((if (seedRestart) when(col("seed"), lit(base)).otherwise(lit(0L))
              else lit(base).cast("long")) +
              expr(s"(${GraphQueries.DampPct} * coalesce(contrib, 0L)) div 100")).as("r"))
        if (frontierPrune) r = r.filter(col("r") > 0)
      }
      r
    }

    // How fast does the seeds' basin saturate? (decides whether the
    // frontier prune can matter at this graph's expansion rate)
    {
      val e = Tables.load(spark, sfDir, "lineitem")
        .groupBy(col("l_orderkey")).agg(collect_set(col("l_partkey")).as("pks"))
        .select(explode(col("pks")).as("src"), col("pks"))
        .select(col("src"), explode(array_remove(col("pks"), col("src"))).as("dst"))
        .distinct().transform(CacheScope.persisted(_))
      val nNodes = e.select(col("src")).distinct().count()
      var f = e.select(col("src")).distinct()
        .filter(col("src") % GraphQueries.PprSeedMod === 0)
        .withColumnRenamed("src", "node")
      println(s"[pprprobe] nodes=$nNodes seeds=${f.count()}")
      for (i <- 1 to GraphQueries.Iters) {
        f = e.join(f, col("src") === col("node")).select(col("dst").as("node"))
          .union(f).distinct().transform(CacheScope.persisted(_))
        println(s"[pprprobe] frontier after round $i: ${f.count()}")
      }
      CacheScope.releaseAll()
    }

    time("uniform (pagerank-ish)")(walk(seedRestart = false, seededInit = false))
    time("full ppr unpruned")(walk(seedRestart = true, seededInit = true))
    time("full ppr pruned")(walk(seedRestart = true, seededInit = true,
      frontierPrune = true))
    time("full ppr pruned again")(walk(seedRestart = true, seededInit = true,
      frontierPrune = true))
    time("full ppr unpruned again")(walk(seedRestart = true, seededInit = true))
    spark.stop()
  }
}
