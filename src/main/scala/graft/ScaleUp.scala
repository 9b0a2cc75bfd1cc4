package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bench-side scaling-experiment input builder — NOT part of the product
  * surface and never read by any declared query. Writes K disjoint
  * key-shifted replicas of a testdata directory to a scratch dir so the
  * data-parallel scaling of the heavy keys can be measured at an SF larger
  * than the largest shipped one (VERDICT r15 #6: at sf0.1 the whole suite
  * is per-job fixed-cost bound — c8/c32 ratios ≈ 1 — which says nothing
  * about the operators' data parallelism).
  *
  * Scheme: every entity key (order/cust/part/supp/event/user/doc/vec)
  * shifts by replica · 10^9, so replicas are disjoint copies that join
  * only within themselves — the workload per replica is the sf0.1
  * workload, and a data-parallel operator should scale with replica
  * count. Dimension enums (nation, region, dates, flags) stay shared.
  * Usage: runMain graft.ScaleUp <srcDir> <outDir> <replicas>
  */
object ScaleUp {

  private val Off = 1000000000L

  private val keyCols: Map[String, Seq[String]] = Map(
    "customer" -> Seq("c_custkey"),
    "orders" -> Seq("o_orderkey", "o_custkey"),
    "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
    "part" -> Seq("p_partkey"),
    "supplier" -> Seq("s_suppkey"),
    "events" -> Seq("event_id", "user_id"),
    "documents" -> Seq("doc_id"),
    "embeddings" -> Seq("vec_id"),
    "region" -> Seq(),
    "nation" -> Seq())

  def main(args: Array[String]): Unit = {
    val Array(src, out, kStr) = args.take(3)
    val k = kStr.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (t <- Tables.All) {
      // Through Tables.load: events.parquet ships TIMESTAMP(NANOS), which
      // the raw vectorized reader rejects; load normalizes it (and the
      // rewritten copy round-trips as plain TimestampType).
      val base = Tables.load(spark, src, t)
      val shifts = keyCols(t)
      val reps = if (shifts.isEmpty) 1 else k
      val scaled: DataFrame = (0 until reps).map { r =>
        shifts.foldLeft(base)((df, c) =>
          df.withColumn(c, col(c) + lit(r * Off)))
      }.reduce(_.unionByName(_))
      scaled.write.mode("overwrite").parquet(s"$out/$t.parquet")
      println(s"[scaleup] $t x$reps -> $out/$t.parquet")
    }
    spark.stop()
  }
}
