package graft

import org.apache.spark.sql.SparkSession

/** Dev profiling harness: time any subset of SparkEntry.queries.
  *
  *   sbt "runMain graft.Scratch [sfDir] [query ...]"
  *
  * No args runs every query at sf0.1 and prints a sorted breakdown.
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.filter(_.startsWith("/"))
      .getOrElse("/root/testdata/sf0.1")
    val names =
      if (args.length > 1 || (args.length == 1 && !args(0).startsWith("/")))
        args.dropWhile(_.startsWith("/")).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Spark's WARN default swallows graft's own INFO diagnostics (e.g.
    // DedupClusters per-phase timings) — surface them in this dev harness.
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "graft", org.apache.logging.log4j.Level.INFO)
    val times = names.map { name =>
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      CacheScope.releaseAll()
      println(f"[scratch] $name%-28s rows=$n%-8d $dt%.2f s")
      name -> dt
    }
    println(f"[scratch] TOTAL ${times.map(_._2).sum}%.1f s; slowest:")
    times.sortBy(-_._2).take(5).foreach { case (n, t) =>
      println(f"[scratch]   $n%-28s $t%.2f s")
    }
    spark.stop()
  }
}
