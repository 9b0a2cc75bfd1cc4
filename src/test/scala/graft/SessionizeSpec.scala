package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.Sessionize
import graft.streaming.Sessionize.Event

/** Drives the custom flatMapGroupsWithState sessionizer through a real
  * streaming query (file source -> state store -> memory sink) and checks
  * the closed sessions against the declarative session_window batch result.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("stateful sessionizer emits closed sessions matching session_window") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sess").toString
    Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_type"))
      .write.mode("overwrite").parquet(tmp)

    val stream = spark.readStream
      .schema(spark.read.parquet(tmp).schema)
      .parquet(tmp)
      .withWatermark("ts", "10 minutes")
      .as[Event]

    val q = Sessionize.sessions(stream)
      .writeStream
      .format("memory")
      .queryName("sessions_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val streamed = spark.table("sessions_out")
      .filter(col("closed"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet

    val batch = graft.streaming.StreamingQueries.queries("stream_session")(spark, sfDir)
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet

    // Closed sessions are a subset of all sessions (the final session per
    // user may never close within the stream), and every closed session
    // must agree exactly with the declarative result.
    assert(streamed.nonEmpty, "no sessions closed")
    val disagree = streamed -- batch
    assert(disagree.isEmpty, s"sessions disagree: ${disagree.take(3)}")
  }

  test("multi-batch run survives late data (watermark-clamped timeouts)") {
    // Split the events across many files and feed them ONE per micro-batch:
    // files hold random time ranges, so later batches deliver events far
    // behind the advanced watermark — the regression case where an
    // unclamped setTimeoutTimestamp(<= watermark) kills the query.
    val tmp = java.nio.file.Files.createTempDirectory("graft-mb").toString
    Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_type"))
      .repartition(8)
      .write.mode("overwrite").parquet(tmp)

    val stream = spark.readStream
      .schema(spark.read.parquet(tmp).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(tmp)
      .withWatermark("ts", "10 minutes")
      .as[Event]

    val q = Sessionize.sessions(stream)
      .writeStream.format("memory").queryName("mb_sessions_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(180000)
    assert(q.exception.isEmpty, s"query failed: ${q.exception}")

    val out = spark.table("mb_sessions_out")
    assert(out.count() > 0, "no sessions emitted across micro-batches")
    // conservation: closed sessions can't contain more events than exist
    val closedEvents = out.filter(col("closed"))
      .agg(sum(col("n_events"))).first().getLong(0)
    assert(closedEvents <= Tables.load(spark, sfDir, "events").count())
  }

  test("salted join equals plain join") {
    val li = Tables.load(spark, sfDir, "lineitem").select("l_orderkey", "l_quantity")
    val ord = Tables.load(spark, sfDir, "orders").select("o_orderkey", "o_totalprice")
      .withColumnRenamed("o_orderkey", "l_orderkey")
    val plain = li.join(ord, Seq("l_orderkey")).count()
    val salted = graft.operators.SaltedJoin.inner(li, ord, "l_orderkey").count()
    assert(plain == salted)
  }
}
