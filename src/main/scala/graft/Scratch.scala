package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    li.groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
           expr("percentile(l_extendedprice, 0.9)").as("p90"))
      .orderBy("l_returnflag")
      .collect().foreach(r => println(s"[scratch] ${r.getString(0)} ${r.getDouble(1)} ${r.getDouble(2)}"))
    spark.stop()
  }
}
