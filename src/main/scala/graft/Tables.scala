package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS), which Spark's vectorized
      // reader rejects; read it as raw nanos and convert to micros (the
      // testdata is microsecond-aligned, so this is lossless).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.{expr, timestamp_micros}
      import org.apache.spark.sql.types.LongType
      // NB: integer division — `/ 1000` would be DOUBLE division, and
      // 2024-epoch nanos exceed 2^53, silently shifting timestamps by 1us.
      if (df.schema("ts").dataType == LongType)
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else df
    } else spark.read.parquet(s"$dir/$name.parquet")
  }
}

/** A named family of queries plus their DuckDB oracle SQL. SparkEntry
  * aggregates all packs; the driver's Verify/Bench mains consume the union.
  *
  * Contract (builder prompt): for every query key present in `oracles`, the
  * SQL must produce the same column NAMES (the driver sorts columns by name
  * then hashes values) and — for doubles — explicitly rounded values on both
  * sides so cross-engine float noise can't flip the hash.
  */
trait QueryPack {
  def queries: Map[String, (SparkSession, String) => DataFrame]
  def oracles: Map[String, String]
}
