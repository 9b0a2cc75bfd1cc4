package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.StreamingQueries

/** Real readStream twin of stream_latest_state: the identical
  * max(struct)-per-key agg in complete output mode must reproduce the
  * batch changelog snapshot exactly — the state store holds one struct
  * per key (the bounded-state upsert view), and event_id tie-breaking
  * makes the pick order-insensitive across micro-batches.
  */
class LatestStateStreamSpec extends SparkSpec {

  test("streaming latest-state (complete mode) == batch snapshot") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-latest").toString
    Tables.load(spark, sfDir, "events").write.mode("overwrite").parquet(tmp)

    val stream = spark.readStream
      .schema(spark.read.parquet(tmp).schema)
      .parquet(tmp)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        max(struct(col("ts"), col("event_id"), col("event_type"),
          col("value"))).as("last"))
      .select(col("user_id"), col("n_events"),
        col("last.ts").as("last_ts"),
        col("last.event_type").as("last_type"),
        col("last.value").as("last_value"))

    val q = stream.writeStream
      .format("memory")
      .queryName("latest_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "stream did not finish in time")

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getString(3),
        r.getDouble(4))
    val streamed = spark.table("latest_out").collect().map(key).toSet
    val batch = StreamingQueries.queries("stream_latest_state")(spark, sfDir)
      .collect().map(key).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }
}
