package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The reference's TSV exchange format (SURVEY.md §2.1 S4/S5/S6):
  * `TextOutputFormat` with tab separators produced its `TERM\tDF` and
  * `ID\tTERM\tSCORE` files (DocumentFreq.java:134-135, IDF.java:185-186),
  * which were then manually renamed and fed to the next job as a cached
  * side file (README.md:12-18).
  *
  * In the rebuild the pipeline is one program and the DF relation flows as
  * a DataFrame — these sinks exist for interop with the reference's file
  * contract and as the materialization point between phases when a user
  * wants the two-job shape.
  */
object Tsv {

  /** S5: single-file tab-separated sink. `coalesce(1)` reproduces the
    * reference's one-reducer output file; leave `singleFile = false` at
    * scale for one file per partition.
    */
  def write(df: DataFrame, path: String, singleFile: Boolean = true): Unit = {
    val out = if (singleFile) df.coalesce(1) else df
    out.write
      .mode("overwrite")
      .option("sep", "\t")
      .option("header", "false")
      .csv(path)
  }

  /** S4: read a TSV side table with an explicit schema (the reference
    * parses its DF file into a HashMap in every task, IDF.java:62-79; here
    * the small relation is read once and broadcast by the join planner).
    */
  def read(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .option("sep", "\t")
      .option("header", "false")
      .schema(schema)
      .csv(path)
}
