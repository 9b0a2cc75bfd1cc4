package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Newline-delimited JSON corpus source — the de-facto LLM-training-data
  * interchange format (one JSON object per line, usually with `id` and
  * `text` fields). Extends the reference's input model (SURVEY.md §2.1)
  * to the corpus layout a modern pipeline actually receives.
  *
  * Scale notes:
  *   - The schema is EXPLICIT, never inferred: inference is a full extra
  *     pass over the data (100 TB read twice).
  *   - Malformed lines are skipped, mirroring the reference's
  *     malformed-row tolerance in its TSV side input (IDF.java:68): a
  *     petabyte crawl always contains broken records, and one of them
  *     must not kill the job. PERMISSIVE parsing nulls them out; the
  *     filter drops them.
  *   - JSON lines are splittable by newline, so files parallelize like
  *     text; pair with maxPartitionBytes exactly as TextCorpus documents.
  */
object Jsonl {

  /** (doc_id, text) from a JSONL path; rows missing either field (or
    * unparsable) are skipped.
    */
  def documents(spark: SparkSession, path: String,
      idField: String = "id", textField: String = "text"): DataFrame =
    spark.read
      .schema(StructType(Seq(
        StructField(idField, StringType),
        StructField(textField, StringType))))
      .option("mode", "PERMISSIVE")
      .json(path)
      .filter(col(idField).isNotNull && col(textField).isNotNull)
      .select(col(idField).as("doc_id"), col(textField).as("text"))

  /** Sharded JSONL sink — the artifact a training run consumes:
    * `dir/<shardCol>=<k>/part-*.txt`, one JSON object per line. The shard
    * layout comes from `partitionBy` (hash-free directory split, no
    * global sort) and `to_json` is a narrow codegen map, so the write
    * adds NO shuffle beyond what produced the shard column; pair with
    * `text_shard_assign`'s deterministic md5 sharding for reproducible
    * shards at any scale.
    */
  def writeSharded(df: DataFrame, dir: String, shardCol: String = "shard"): Unit =
    df.select(col(shardCol),
        to_json(struct(df.columns.filterNot(_ == shardCol).map(col): _*))
          .as("value"))
      .write.partitionBy(shardCol).mode("overwrite").text(dir)
}
