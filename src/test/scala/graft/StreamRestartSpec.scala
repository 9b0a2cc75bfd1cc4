package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Kill-and-restart recovery for the stateful operator pair (VERDICT r10
  * next-round #4). Every other streaming spec replays in ONE query run;
  * these stop the query, land more data while it is down, restart from the
  * SAME checkpointLocation into the SAME exactly-once parquet sink, and
  * assert the union of both runs equals the never-crashed result:
  * offsets resume (no reprocessing), the state store restores (decisions
  * in run 2 depend on run-1 state), and the file-sink log dedupes.
  */
class StreamRestartSpec extends SparkSpec {

  private def ts(min: Long) = new java.sql.Timestamp(min * 60 * 1000)

  test("throttle: suppression state and offsets survive a restart (exactly once)") {
    // Isolated SQLConf: transformWithState needs the RocksDB provider and
    // the shared session must not see it.
    val s = spark.newSession()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    import s.implicits._
    val base = Files.createTempDirectory("graft-restart-thr").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"

    def run(): Unit = {
      val stream = graft.streaming.Throttle.throttled(
        graft.streaming.Throttle.fromRaw(
          s.readStream.schema(s.read.parquet(in).schema).parquet(in)))
      val q = stream.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(300000), "stream did not finish in time")
      assert(q.exception.isEmpty, s"query failed: ${q.exception}")
    }

    // Run 1: first event of hour 0 for users 1 and 2, then the query
    // stops — the "kill".
    Seq((1L, ts(0), 101L, "alert"), (2L, ts(5), 201L, "alert"))
      .toDF("user_id", "ts", "event_id", "event_type")
      .coalesce(1).write.mode("append").parquet(in)
    run()

    // Data lands while the query is down. 102 is in the SAME hour user 1
    // already alerted in — only restored pre-kill state can suppress it;
    // 103/202 open new hours and must pass.
    Seq((1L, ts(10), 102L, "alert"), (1L, ts(70), 103L, "alert"),
      (2L, ts(65), 202L, "alert"))
      .toDF("user_id", "ts", "event_id", "event_type")
      .coalesce(1).write.mode("append").parquet(in)
    run()

    val got = s.read.parquet(out).select(col("event_id")).as[Long]
      .collect().sorted.toSeq
    assert(got == Seq(101L, 103L, 201L, 202L),
      s"restart broke exactly-once or state recovery: $got")
  }

  test("sessionizer: a session split across the kill merges into ONE closed session") {
    val s = spark.newSession()
    import s.implicits._
    val base = Files.createTempDirectory("graft-restart-sess").toString
    val in = s"$base/in"; val out = s"$base/out"; val ckpt = s"$base/ckpt"

    def run(): Unit = {
      val stream = s.readStream.schema(s.read.parquet(in).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in)
        .withWatermark("ts", "10 minutes")
        .as[graft.streaming.Sessionize.Event]
      val q = graft.streaming.Sessionize.sessions(stream)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(300000), "stream did not finish in time")
      assert(q.exception.isEmpty, s"query failed: ${q.exception}")
    }

    // Run 1: the session OPENS (2 events inside the 5-min gap), then the
    // query stops with the session held in the state store. The timeline
    // starts at 60 min, NOT epoch 0: the initial watermark is 0 and
    // FlatMapGroupsWithStateExec drops input rows at-or-before it.
    Seq((7L, ts(60), "view"), (7L, ts(62), "click"))
      .toDF("user_id", "ts", "event_type")
      .coalesce(1).write.mode("append").parquet(in)
    run()

    // While down: the same session CONTINUES (64, 66 min — within the gap
    // of the pre-kill state), plus a watermark clock tick; then a second
    // tick in a later file so the timeout fires in a following batch
    // (maxFilesPerTrigger=1 makes each file its own micro-batch, and the
    // sleep keeps their mod-time order deterministic).
    Seq((7L, ts(64), "view"), (7L, ts(66), "buy"), (99L, ts(560), "view"))
      .toDF("user_id", "ts", "event_type")
      .coalesce(1).write.mode("append").parquet(in)
    Thread.sleep(1200)
    Seq((99L, ts(1060), "view"))
      .toDF("user_id", "ts", "event_type")
      .coalesce(1).write.mode("append").parquet(in)
    run()

    val got = s.read.parquet(out)
      .filter(col("user_id") === 7L && col("closed"))
      .select(col("session_start"), col("n_events"), col("n_event_types"))
      .collect()
    assert(got.length == 1,
      s"expected ONE closed session for user 7, got ${got.mkString(", ")}")
    assert(got(0).getTimestamp(0) == ts(60) && got(0).getLong(1) == 4L &&
      got(0).getInt(2) == 3,
      s"pre-kill state did not merge with post-restart events: ${got(0)}")
  }
}
