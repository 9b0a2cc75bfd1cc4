package graft
import org.apache.spark.sql.SparkSession
object GenGolden {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val corpus = "/root/repo/src/test/resources/corpus"
    cli.DocumentFreqJob.run(spark, Array(corpus, "/tmp/golden/df"))
    cli.IdfJob.run(spark, Array(corpus, "/tmp/golden/tfidf"))
    cli.PosJob.run(spark, Array(corpus, "/tmp/golden/pos"))
    spark.stop()
  }
}
