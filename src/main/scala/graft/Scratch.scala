package graft
import org.apache.spark.sql.SparkSession
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.01"
    for (name <- Seq("tfidf_score", "q_join_3way", "sim_knn_bruteforce")) {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, d).queryExecution.executedPlan.treeString.take(4000))
    }
    spark.stop()
  }
}
