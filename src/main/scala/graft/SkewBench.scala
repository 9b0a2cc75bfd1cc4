package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SaltedJoin

/** Dev harness: measure SaltedJoin vs a plain shuffle join under induced
  * key skew (evidence for the ARCHITECTURE.md skew note).
  *
  *   sbt "runMain graft.SkewBench [sfDir]"
  *
  * Broadcast is disabled — salting targets the case where the small side
  * is NOT broadcastable (at 100 TB a "small" dim can still be tens of GB)
  * and one hot key lands 90% of the fact side in a single reduce task.
  * Run once with AQE off (raw effect) and once with AQE on (composition
  * with adaptive skew splitting).
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    Seq(false, true).foreach { aqe =>
      val spark = SparkSession.builder().master("local[8]")
        .appName(s"skewbench-aqe-$aqe")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.sql.autoBroadcastJoinThreshold", "-1")
        .config("spark.sql.adaptive.enabled", aqe.toString)
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      spark.sparkContext.setLogLevel("ERROR")
      try {
        // 90% of rows on one hot key; salt from event_id.
        val fact = Tables.load(spark, sfDir, "events")
          .select(col("event_id"), col("user_id"), col("value"))
          .withColumn("skew_key",
            when(pmod(col("user_id"), lit(10)) < 9, lit(0L))
              .otherwise(col("user_id")))
          .persist()
        val dim = fact.select(col("skew_key")).distinct()
          .withColumn("grp", pmod(col("skew_key"), lit(7)))
          .persist()
        fact.count(); dim.count() // materialize inputs outside the timing

        def time(label: String, df: => DataFrame): Double = {
          val t0 = System.nanoTime()
          df.groupBy("grp").agg(count(lit(1)).as("n")).count()
          val dt = (System.nanoTime() - t0) / 1e9
          println(f"[skewbench] aqe=$aqe%-5s $label%-7s $dt%6.2f s")
          dt
        }
        val plain = time("plain", fact.join(dim, Seq("skew_key")))
        val salted = time("salted", SaltedJoin.inner(fact, dim, "skew_key",
          saltFactor = 16, saltBy = Some(col("event_id"))))
        println(f"[skewbench] aqe=$aqe%-5s speedup ${plain / salted}%.2fx")
      } finally spark.stop()
    }
  }
}
