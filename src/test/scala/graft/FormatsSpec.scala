package graft

import org.apache.spark.sql.functions._

import graft.sources.Formats

/** The format round-trip queries' underlying guarantee, checked at ROW
  * level (the registered queries audit aggregates; this spec pins the
  * stronger property they rely on): write→read in each format returns
  * exactly the rows written, with the declared types.
  */
class FormatsSpec extends SparkSpec {

  private def roundtrip(fmt: String): Unit = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-fmt-$fmt").toString
    val in = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_returnflag"),
        col("l_quantity").cast("decimal(12,2)").as("qty"))
    val schema = in.schema
    fmt match {
      case "orc" => in.write.mode("overwrite").orc(dir)
      case "csv" => in.write.mode("overwrite").option("header", "true").csv(dir)
      case "json" => in.write.mode("overwrite").json(dir)
    }
    val back = fmt match {
      case "orc" => spark.read.orc(dir)
      case "csv" => spark.read.schema(schema).option("header", "true").csv(dir)
      case "json" => spark.read.schema(schema).json(dir)
    }
    assert(back.schema == schema, s"$fmt mangled the schema")
    def key(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDecimal(2).toPlainString))
      .sorted.toSeq
    assert(key(back) == key(in), s"$fmt round-trip lost or altered rows")
  }

  test("ORC round-trip is row-exact")(roundtrip("orc"))
  test("CSV round-trip is row-exact")(roundtrip("csv"))
  test("JSON round-trip is row-exact")(roundtrip("json"))
}
