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
    assert(q.awaitTermination(300000), "stream did not finish in time")

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

  test("late events within the gap of EACH OTHER merge into one closed session") {
    // r2 ADVICE: the per-event fold emitted two overlapping singleton
    // sessions here; interval merge must coalesce them.
    import Sessionize.{Event, SessionState}
    def ts(min: Long) = new java.sql.Timestamp(min * 60 * 1000)
    val running = SessionState(
      startUs = 100L * 60 * 1000000, lastUs = 101L * 60 * 1000000,
      n = 3, types = Set("view"))
    val lateA = Event(7L, ts(10), "click") // 2 min apart — within the
    val lateB = Event(7L, ts(12), "buy")   // 5 min gap of each other
    val (closed, open) = Sessionize.mergeBatch(7L, Some(running), Seq(lateB, lateA))
    assert(closed.length === 1, s"expected ONE merged late session, got $closed")
    assert(closed.head.n_events === 2)
    assert(closed.head.n_event_types === 2)
    assert(closed.head.session_start === ts(10))
    assert(closed.head.session_end === ts(17)) // last(12) + gap(5)
    // the running session is untouched and stays open
    assert(open === Some(running))
    // and a late event within the gap of the RUNNING session extends it
    // backwards instead of closing
    val nearMiss = Event(7L, ts(97), "click")
    val (closed2, open2) = Sessionize.mergeBatch(7L, Some(running), Seq(nearMiss))
    assert(closed2.isEmpty)
    assert(open2.get.startUs === 97L * 60 * 1000000)
    assert(open2.get.n === 4)
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
    assert(q.awaitTermination(300000), "stream did not finish in time")
    assert(q.exception.isEmpty, s"query failed: ${q.exception}")

    val out = spark.table("mb_sessions_out")
    assert(out.count() > 0, "no sessions emitted across micro-batches")
    // no corrupt intervals: the naive backward merge dragged lastUs behind
    // startUs for cross-batch late events (caught by the RocksDB spec)
    assert(out.filter(col("session_end") <= col("session_start")).count() == 0,
      "inverted session emitted")
    // conservation: closed sessions can't contain more events than exist
    val closedEvents = out.filter(col("closed"))
      .agg(sum(col("n_events"))).first().getLong(0)
    assert(closedEvents <= Tables.load(spark, sfDir, "events").count())
  }

  test("time-ordered file replay: advancing watermark fires event-time timeouts") {
    // Range-slice the events by ts and write the slices SEQUENTIALLY with
    // strictly increasing mtimes, so each micro-batch advances the
    // watermark like a production replay and sessions idle past the gap
    // are closed by state timeout, not by a newer event arriving.
    // Sequential-with-forced-mtimes matters: FileStreamSource replays
    // files in MODIFICATION-TIME order, and a parallel repartitionByRange
    // write commits its part files in task-completion order — under
    // concurrent suite load (PlanAuditSpec on the shared session) the
    // completion order scrambles, the replay leaves event-time order, the
    // watermark jumps ahead and drops earlier slices as late, and no
    // final session closes through the timeout path (the flake this block
    // fixes, reproduced against unmodified round-5 code).
    val tmpDir = java.nio.file.Files.createTempDirectory("graft-replay")
    val tmp = tmpDir.toString
    val evBase = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_type"))
    val evRows = evBase.orderBy("ts").collect() // sf0.001: a few thousand rows
    val sliceLen = math.max(1, math.ceil(evRows.length / 8.0).toInt)
    val now = System.currentTimeMillis()
    evRows.grouped(sliceLen).zipWithIndex.foreach { case (slice, i) =>
      import scala.jdk.CollectionConverters._
      val stage = java.nio.file.Files.createTempDirectory("graft-replay-stage")
      spark.createDataFrame(slice.toSeq.asJava, evBase.schema)
        .coalesce(1).write.mode("overwrite").parquet(stage.toString)
      val part = java.nio.file.Files.list(stage).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      val dst = tmpDir.resolve(f"b$i%05d.parquet")
      java.nio.file.Files.move(part, dst)
      assert(dst.toFile.setLastModified(now - (16 - i) * 60000L))
      org.apache.commons.io.FileUtils.deleteQuietly(stage.toFile)
    }

    val stream = spark.readStream
      .schema(spark.read.parquet(tmp).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(tmp)
      .withWatermark("ts", "10 minutes")
      .as[Event]

    val q = Sessionize.sessions(stream)
      .writeStream.format("memory").queryName("replay_sessions_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "stream did not finish in time")
    assert(q.exception.isEmpty, s"query failed: ${q.exception}")

    val streamedClosed = spark.table("replay_sessions_out")
      .filter(col("closed"))
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    assert(streamedClosed.nonEmpty)

    // mergeBatch always keeps a user's NEWEST interval open, so the final
    // session of a user can only ever be emitted through the event-time
    // timeout path (no later event exists to close it). A closed stream
    // session that equals a user's final batch session is therefore a
    // timeout-driven emission — require at least one.
    val batch = graft.streaming.StreamingQueries.queries("stream_session")(spark, sfDir)
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("session_start").desc)))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("session_start"), col("session_end"),
        col("n_events"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3)))
      .toSet
    val timeoutEmitted = streamedClosed.intersect(batch)
    assert(timeoutEmitted.nonEmpty,
      "no final session was closed by an event-time timeout")
  }

  test("sessionizer runs on the RocksDB state store (the 100 TB backend)") {
    // The default HDFS-backed store keeps all state on the JVM heap — fine
    // for tests, wrong for 100 TB streaming state. RocksDB spills to local
    // disk with bounded memory and is what a production deployment of the
    // stateful operators here would configure; this proves the operator's
    // state (case classes with a Set field) round-trips through it.
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graft-rocks").toString
      Tables.load(spark, sfDir, "events")
        .select(col("user_id"), col("ts"), col("event_type"))
        .repartition(4)
        .write.mode("overwrite").parquet(tmp)
      val stream = spark.readStream
        .schema(spark.read.parquet(tmp).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(tmp)
        .withWatermark("ts", "10 minutes")
        .as[Event]
      val q = Sessionize.sessions(stream)
        .writeStream.format("memory").queryName("rocks_sessions_out")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(300000), "stream did not finish in time")
      assert(q.exception.isEmpty, s"query failed on RocksDB: ${q.exception}")
      // Out-of-order micro-batches make exact batch-equality impossible
      // (late events close as singletons); assert the structural
      // invariants instead: state round-trips, sessions are well-formed,
      // events are conserved.
      val out = spark.table("rocks_sessions_out").filter(col("closed"))
      assert(out.count() > 0, "no sessions closed on RocksDB")
      val inverted = out.filter(col("session_end") <= col("session_start")).count()
      assert(inverted == 0, s"$inverted inverted sessions on RocksDB")
      val closedEvents = out.agg(sum(col("n_events"))).first().getLong(0)
      assert(closedEvents <= Tables.load(spark, sfDir, "events").count())
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
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
