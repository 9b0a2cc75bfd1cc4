package graft
import org.apache.spark.sql.SparkSession

/** Dev scratch: formatted plans for round-6's new queries (like Plans,
  * but ad-hoc keys from args — avoids regenerating PLANS.md's curated
  * dump). */
object PlanPeek {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { name =>
      println(s"## $name")
      println(SparkEntry.queries(name)(spark, "/root/testdata/sf0.01")
        .queryExecution.executedPlan.treeString)
      CacheScope.releaseAll()
    }
    spark.stop()
  }
}
