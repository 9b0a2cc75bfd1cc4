package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided parquet tables (TESTDATA.md). */
object Tables {
  val All: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts has shipped in two physical forms across testdata
      // generations: parquet TIMESTAMP(NANOS) (vectorized reader rejects
      // it — read as raw nanos via the legacy conf and convert), and
      // untagged timestamp[us] (Spark 4 infers TIMESTAMP_NTZ — cast to
      // the session type). Both normalize to TimestampType so every
      // consumer sees one schema; sessions pin UTC, so the NTZ cast is
      // value-preserving and agrees with DuckDB's naive read.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = spark.read.parquet(s"$dir/$name.parquet")
      import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
      import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
      // NB: integer division — `/ 1000` would be DOUBLE division, and
      // 2024-epoch nanos exceed 2^53, silently shifting timestamps by 1us.
      df.schema("ts").dataType match {
        case LongType =>
          df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType =>
          df.withColumn("ts", col("ts").cast(TimestampType))
        case _ => df
      }
    } else normalizeNtz(spark.read.parquet(s"$dir/$name.parquet"))
  }

  /** Untagged parquet timestamps (timestamp[us], no UTC flag) infer as
    * TIMESTAMP_NTZ under Spark 4; sessions pin UTC, so casting them to
    * the session TimestampType preserves every value while restoring the
    * one schema all operators (windows, watermarks, unix_timestamp) were
    * built against. DuckDB reads the same files as naive timestamps, so
    * the oracle sees identical values.
    */
  private def normalizeNtz(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{TimestampNTZType, TimestampType}
    val ntz = df.schema.fields.filter(_.dataType == TimestampNTZType)
    if (ntz.isEmpty) df
    else df.withColumns(
      ntz.map(f => f.name -> col(f.name).cast(TimestampType)).toMap)
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
