package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, LongType, StringType, StructField, StructType}

import graft.{CacheScope, Tables}

/** Source/sink coverage beyond parquet + text + TSV + JSONL: ORC, CSV and
  * JSON ROUND-TRIPS. Each query writes a typed projection of `lineitem`
  * to driver-local scratch in the format under test, reads it back, and
  * aggregates; the DuckDB oracle computes the same aggregate from the
  * ORIGINAL parquet — so a lossy round-trip (row loss, type mangling,
  * formatting drift) hash-fails rather than passing silently. That makes
  * these correctness probes of the whole write→read path, not just "the
  * API exists".
  *
  * Type discipline: the projection carries (bigint, string,
  * decimal(12,2)) only. Decimals serialize as exact digit strings in
  * CSV/JSON and as typed values in ORC, so every format round-trips
  * bit-exactly; doubles are deliberately excluded from the TEXT formats
  * (shortest-representation printing is engine-specific — the parquet
  * tables keep doubles, which Det handles elsewhere).
  *
  * Scratch lifecycle follows LayoutQueries: driver-local temp dir,
  * deletion deferred to CacheScope (runs at the harness's per-query
  * release, i.e. after the returned DataFrame has been consumed).
  * Spark-avro is not bundled in this environment; Avro would follow the
  * identical pattern.
  */
object Formats {

  private def deleteRec(p: java.nio.file.Path): Unit = {
    import scala.jdk.CollectionConverters._
    if (java.nio.file.Files.exists(p)) {
      java.nio.file.Files.walk(p).iterator().asScala.toSeq.reverseIterator
        .foreach(f => try java.nio.file.Files.deleteIfExists(f) catch {
          case _: java.io.IOException => ()
        })
    }
  }

  /** The typed projection under test (exact-round-trip types only). */
  private def slice(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_quantity").cast(DecimalType(12, 2)).as("qty"))

  /** Read-back schema for the text formats (CSV carries no types). */
  private val SliceSchema = StructType(Seq(
    StructField("l_orderkey", LongType),
    StructField("l_returnflag", StringType),
    StructField("qty", DecimalType(12, 2))))

  /** The verification aggregate over the read-back relation: per flag,
    * row count, exact decimal sum, and the orderkey span — row loss,
    * duplication, value drift, and key mangling all flip at least one.
    */
  private def audit(df: DataFrame): DataFrame =
    df.groupBy("l_returnflag")
      .agg(count(lit(1)).as("n"),
        // exact decimal fold, double on the wire — the Det convention
        sum(col("qty")).cast("double").as("sum_qty"),
        min(col("l_orderkey")).as("min_ok"),
        max(col("l_orderkey")).as("max_ok"))

  private def scratch(tag: String): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-$tag-")
    CacheScope.deferred(() => deleteRec(dir))
    dir.toString
  }

  def orcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = scratch("orc")
    slice(s, d).write.mode("overwrite").orc(s"$dir/li")
    audit(s.read.orc(s"$dir/li"))
  }

  def csvRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = scratch("csv")
    slice(s, d).write.mode("overwrite").option("header", "true")
      .csv(s"$dir/li")
    audit(s.read.schema(SliceSchema).option("header", "true")
      .csv(s"$dir/li"))
  }

  def jsonRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = scratch("json")
    slice(s, d).write.mode("overwrite").json(s"$dir/li")
    audit(s.read.schema(SliceSchema).json(s"$dir/li"))
  }

  /** XML is built into Spark 4's sql module (the spark-xml donation,
    * SPARK-44751) — same text-format discipline as CSV/JSON: explicit
    * read schema, decimals as exact digit strings, rowTag pinned on both
    * sides.
    */
  def xmlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val dir = scratch("xml")
    slice(s, d).write.mode("overwrite").option("rowTag", "li")
      .format("xml").save(s"$dir/li")
    audit(s.read.schema(SliceSchema).option("rowTag", "li")
      .format("xml").load(s"$dir/li"))
  }

  /** The oracle for all three round-trips: the same audit over the
    * ORIGINAL parquet — equality proves the write→read path lossless.
    */
  val auditOracle: String =
    """SELECT l_returnflag,
      |       count(*) AS n,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |       min(l_orderkey) AS min_ok,
      |       max(l_orderkey) AS max_ok
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin
}
