package graft

import org.apache.spark.sql.SparkSession

/** Dumps `explain("formatted")` for the given query keys — the
  * optimization-round evidence files (plans/r15/<query>_before.txt /
  * _after.txt; the judge checks plan-shape claims against these).
  *
  *   sbt "runMain graft.PlanDump plans/r15 after q_rec_coverage ..."
  *
  * Data dir from $SPARK_GRAFT_SF_DIR (default sf0.01 — plan SHAPE is
  * scale-invariant here; AQE-final plans differ only in partition
  * counts). Building a memo-consumer's DataFrame forces its producer
  * once; LabelsMemo is cleared at exit so dumps stay hermetic.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <key...>")
    val outDir = args(0)
    val suffix = args(1)
    val keys = args.drop(2)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    keys.foreach { k =>
      val df = SparkEntry.queries(k)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$outDir/${k}_$suffix.txt"), txt)
      CacheScope.releaseAll()
      println(s"[plandump] $k -> $outDir/${k}_$suffix.txt")
    }
    LabelsMemo.clear()
    spark.stop()
  }
}
