package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.DecimalType

import graft.streaming.StreamingQueries

/** Real Structured Streaming runs: the readStream variants of the windowed
  * queries must produce exactly the batch results the driver's oracle
  * checks (same window()/session_window() expressions in both modes).
  */
class StreamingSpec extends SparkSpec {

  private def eventsSchema = Tables.load(spark, sfDir, "events").schema

  test("streaming tumbling-window agg == batch result (availableNow)") {
    // Stream the raw parquet (nanos already converted by the batch loader is
    // not available here, so feed the stream from a re-written micros copy).
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream").toString
    Tables.load(spark, sfDir, "events").write.mode("overwrite").parquet(tmp)

    val stream = spark.readStream
      .schema(spark.read.parquet(tmp).schema)
      .parquet(tmp)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n"), col("total"))

    val q = stream.writeStream
      .format("memory")
      .queryName("tumbling_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "stream did not finish in time")

    val streamed = spark.table("tumbling_out").collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSet
    val batch = StreamingQueries.queries("stream_tumbling")(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("chained two-level window agg (10m -> 1h) == batch result") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-chain").toString
    Tables.load(spark, sfDir, "events").write.mode("overwrite").parquet(tmp)

    val stream = spark.readStream
      .schema(spark.read.parquet(tmp).schema)
      .parquet(tmp)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "10 minutes").as("w10"), col("event_type"))
      .agg(count(lit(1)).as("n10"),
        sum(col("value").cast(DecimalType(18, 4))).as("t10"))
      .groupBy(window(col("w10"), "1 hour").as("w"), col("event_type"))
      .agg(sum(col("n10")).as("n"),
        sum(col("t10")).cast("double").as("total"),
        count(lit(1)).as("n_subwindows"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("event_type"), col("n"), col("total"), col("n_subwindows"))

    // Multiple stateful operators are APPEND-mode only (SPARK-40925):
    // each level emits a window once the watermark closes it, so the
    // streamed output is exactly the batch rows for CLOSED hour windows
    // (end <= final watermark = max ts - the 10-minute delay).
    val q = stream.writeStream
      .format("memory")
      .queryName("chained_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "stream did not finish in time")

    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getTimestamp(1), r.getString(2),
        r.getLong(3), r.getDouble(4), r.getLong(5))
    val streamed = spark.table("chained_out").collect().map(key).toSet
    val batch = graft.streaming.StreamingQueries
      .queries("stream_chained_agg")(spark, sfDir).collect().map(key).toSet
    val cutoff = Tables.load(spark, sfDir, "events")
      .agg(max(col("ts"))).collect()(0).getTimestamp(0).getTime - 10 * 60 * 1000
    val closed = batch.filter(_._2.getTime <= cutoff)
    assert(streamed == closed)
    assert(streamed.nonEmpty)
    // chaining really happened: some hour aggregates >1 sub-window
    assert(streamed.exists(_._6 > 1))
  }

  test("stream-static join (events ⋈ customer dim) == batch result") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sjs").toString
    Tables.load(spark, sfDir, "events").write.mode("overwrite").parquet(tmp)
    val cust = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))

    val stream = spark.readStream
      .schema(spark.read.parquet(tmp).schema)
      .parquet(tmp)
      .withWatermark("ts", "10 minutes")
      .join(broadcast(cust), col("user_id") === col("c_custkey"))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("c_mktsegment"), col("n"), col("total"))

    val q = stream.writeStream
      .format("memory").queryName("sjs_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "stream did not finish in time")

    val streamed = spark.table("sjs_out").collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSet
    val batch = StreamingQueries.queries("stream_join_static")(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getString(2),
        r.getLong(3), r.getDouble(4))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming dedup: dropDuplicates within watermark == batch distinct") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream3").toString
    // duplicate the stream on purpose: two copies of every event
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    ev.union(ev).write.mode("overwrite").parquet(tmp)

    // dropDuplicatesWithinWatermark, not dropDuplicates: keyed on
    // event_id alone, plain streaming dropDuplicates would keep one state
    // entry per event_id FOREVER (the watermark only evicts dedup state
    // when the event-time column is part of the key). The WithinWatermark
    // variant is the bounded-state form — a duplicate is guaranteed
    // dropped if it arrives within the watermark delay of the first
    // sighting (here: same-timestamp copies, trivially within 1 hour),
    // and state is evicted once the watermark passes.
    val q = spark.readStream
      .schema(spark.read.parquet(tmp).schema)
      .parquet(tmp)
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "stream did not finish in time")

    val streamed = spark.table("dedup_out").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // The batch side IS the registered query (its self-union plants the
    // same duplicates this replay carries), so builder/spec drift cannot
    // go unnoticed.
    val batch = StreamingQueries.queries("stream_dedup")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(streamed == batch, "duplicates must be dropped exactly once")
  }

  test("streaming sliding-window agg == batch result (availableNow)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-slide").toString
    Tables.load(spark, sfDir, "events").write.mode("overwrite").parquet(tmp)

    val q = spark.readStream
      .schema(spark.read.parquet(tmp).schema)
      .parquet(tmp)
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("n"))
      .writeStream.format("memory").queryName("sliding_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "stream did not finish in time")

    val streamed = spark.table("sliding_out").collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).toSet
    val batch = StreamingQueries.queries("stream_sliding")(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0), r.getTimestamp(1), r.getLong(2))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream join (purchase ⋈ prior views within 30min) == batch") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ss").toString
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
    ev.write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema

    def side(tpe: String) = spark.readStream.schema(schema).parquet(tmp)
      .filter(col("event_type") === tpe)
      .withWatermark("ts", "1 hour")

    val purchases = side("purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
    val views = side("view")
      .select(col("event_id").as("v_id"), col("user_id").as("v_user"),
        col("ts").as("v_ts"))

    val cond = col("p_user") === col("v_user") &&
      col("v_ts") <= col("p_ts") &&
      col("v_ts") >= col("p_ts") - expr("INTERVAL 30 MINUTES")

    val q = purchases.join(views, cond)
      .select(col("p_id"), col("v_id"))
      .writeStream.format("memory").queryName("ss_join_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "stream did not finish in time")

    val streamed = spark.table("ss_join_out").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    // The batch side IS the registered query (not an inlined re-statement
    // of the same condition), so a drift between the registered builder
    // and this spec's streaming shape cannot go unnoticed here.
    val batch = SparkEntry.queries("stream_stream_join")(spark, sfDir)
      .select(col("buy_id"), col("view_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty, "expected some view->purchase pairs")
  }

  test("checkpoint recovery: dedup state survives a query restart (exactly-once)") {
    import org.apache.spark.sql.SaveMode
    val base = java.nio.file.Files.createTempDirectory("graft-ckpt-rec")
    val src = base.resolve("src").toString
    val out = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val all = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("user_id"))
    val ev = all.filter(col("event_id") < 100)
    val n1 = ev.count()
    ev.write.mode(SaveMode.Overwrite).parquet(src)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema(spark.read.parquet(src).schema)
        .parquet(src)
        .dropDuplicates("event_id")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(300000), "stream did not finish in time")
    }
    runOnce()
    assert(spark.read.parquet(out).count() == n1)

    // Second delivery: part duplicates of the first batch, part new rows.
    // A restart from the SAME checkpoint must restore the dedup state
    // (dup event_ids dropped) and the source offsets (old files not
    // re-read) — output grows by exactly the new ids.
    all.filter(col("event_id") >= 50 && col("event_id") < 150)
      .write.mode(SaveMode.Append).parquet(src)
    runOnce()
    val expected = all.filter(col("event_id") < 150).count()
    val ids = spark.read.parquet(out).select("event_id")
      .collect().map(_.getLong(0)).toSeq
    assert(ids.length == expected,
      s"expected exactly-once $expected ids, got ${ids.length}")
    assert(ids.distinct.length == ids.length, "duplicate ids leaked through restart")
  }

  test("stateful threshold-cross (flatMapGroupsWithState) == batch result") {
    import graft.streaming.ThresholdCross
    val tmp = java.nio.file.Files.createTempDirectory("graft-cross").toString
    // The detector's exactness assumes per-key event-time-ordered arrival
    // ACROSS micro-batches (ThresholdCross scaladoc): AvailableNow may
    // split a multi-file directory into several batches in file order, so
    // replay from ONE file sorted by (user_id, ts, event_id) — the
    // log-shipped-stream shape the operator documents — rather than
    // whatever layout the parquet writer happens to produce.
    Tables.load(spark, sfDir, "events")
      .repartition(1).sortWithinPartitions("user_id", "ts", "event_id")
      .write.mode("overwrite").parquet(tmp)

    val stream = ThresholdCross.crossings(ThresholdCross.fromRaw(
      spark.readStream
        .schema(spark.read.parquet(tmp).schema)
        .parquet(tmp)))

    val q = stream.writeStream
      .format("memory")
      .queryName("cross_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "stream did not finish in time")

    val streamed = spark.table("cross_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3))).toSet
    val batch = StreamingQueries.queries("stream_threshold_cross")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getDouble(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stateful per-window top-k (flatMapGroupsWithState) == batch rank on closed windows") {
    import graft.streaming.WindowTopK
    val tmp = java.nio.file.Files.createTempDirectory("graft-topk").toString
    // In-order single-file replay (sorted by ts, one batch) — the operator
    // assumes watermark-consistent arrival; unordered multi-batch replay
    // would make events late and the late-data guard would (correctly)
    // drop them, diverging from the batch twin. Same discipline as the
    // ThresholdCross spec. Windows close in the trailing no-data
    // micro-batch once the watermark (max ts - 10 min) passes their end;
    // the final ~10 minutes of windows may stay open — subset assertion.
    Tables.load(spark, sfDir, "events")
      .select(col("ts"), col("event_type"))
      .orderBy(col("ts")).coalesce(1)
      .write.mode("overwrite").parquet(tmp)

    val stream = WindowTopK.topk(WindowTopK.fromRaw(
      spark.readStream
        .schema(spark.read.parquet(tmp).schema)
        .parquet(tmp)
        .withWatermark("ts", "10 minutes")))

    val q = stream.writeStream
      .format("memory").queryName("topk_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "stream did not finish in time")
    assert(q.exception.isEmpty, s"query failed: ${q.exception}")

    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getTimestamp(1), r.getString(2), r.getLong(3), r.getInt(4))
    val streamed = spark.table("topk_out").collect().map(key).toSet
    // Batch side IS the registered query — drift-proof.
    val batch = StreamingQueries.queries("stream_window_topk")(spark, sfDir)
      .collect().map(key).toSet

    assert(streamed.nonEmpty, "no windows closed")
    val disagree = streamed -- batch
    assert(disagree.isEmpty, s"closed windows disagree: ${disagree.take(3)}")
    // Every CLOSED window must be complete: if any rank of a window
    // streamed, all its batch ranks must have streamed.
    val closedWindows = streamed.map(_._1)
    val missing = batch.filter(b => closedWindows(b._1)) -- streamed
    assert(missing.isEmpty, s"partially emitted window: ${missing.take(3)}")
  }

  test("stream-stream LEFT OUTER join: matched rows exact, outer rows on eviction") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ssl").toString
    Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .orderBy(col("ts")).coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema

    def side(tpe: String) = spark.readStream.schema(schema).parquet(tmp)
      .filter(col("event_type") === tpe)

    val views = side("view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "10 minutes")
    val buys = side("purchase")
      .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"))
      .withWatermark("buy_ts", "10 minutes")

    val q = views.join(buys,
        col("user_id") === col("b_user") &&
          col("buy_ts") >= col("view_ts") &&
          col("buy_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .select(col("view_id"), col("buy_id"))
      .writeStream.format("memory").queryName("ssl_join_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "stream did not finish in time")
    assert(q.exception.isEmpty, s"query failed: ${q.exception}")

    def pairs(rows: Array[org.apache.spark.sql.Row]) = {
      val (m, u) = rows.partition(!_.isNullAt(1))
      (m.map(r => (r.getLong(0), r.getLong(1))).toSet,
        u.map(_.getLong(0)).toSet)
    }
    val (streamedM, streamedU) = pairs(spark.table("ssl_join_out").collect())
    // The batch side IS the registered query — drift-proof.
    val (batchM, batchU) = pairs(
      StreamingQueries.queries("stream_join_left")(spark, sfDir)
        .select(col("view_id"), col("buy_id")).collect())

    // Matched rows emit eagerly: the drained stream must have them ALL.
    assert(streamedM == batchM,
      s"matched rows diverge: missing=${(batchM -- streamedM).take(3)}, " +
        s"extra=${(streamedM -- batchM).take(3)}")
    // Outer (null-padded) rows emit on state eviction: every one the
    // stream produced must be a true non-conversion, and the final
    // watermark must have evicted a non-trivial share of them (views in
    // the last watermark+interval of the stream may lawfully stay open).
    assert((streamedU -- batchU).isEmpty,
      s"stream padded a view the batch matched: ${(streamedU -- batchU).take(3)}")
    assert(streamedU.nonEmpty, "no outer rows were ever emitted")
    // A matched view must never ALSO get a null row.
    assert(streamedU.intersect(streamedM.map(_._1)).isEmpty,
      "a view emitted both matched and null-padded rows")
  }

  test("foreachBatch upsert sink converges to the batch CDC merge") {
    import graft.operators.Upsert
    val root = java.nio.file.Files.createTempDirectory("graft-upsert").toString
    val orders = Tables.load(spark, sfDir, "orders")

    // Seed the standing state with the base snapshot (ver 0)...
    orders.filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
        lit(0L).as("ver"))
      .write.parquet(s"$root/state/v0")
    // ...and replay the change feed (ver 1) as a MULTI-batch stream: keys
    // are unique in the delta, so the merged state is independent of how
    // the files chunk into micro-batches.
    orders.filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"),
        (col("o_totalprice") + lit(1000.0)).as("o_totalprice"),
        lit("U").as("o_orderstatus"), lit(1L).as("ver"))
      .repartition(6).write.parquet(s"$root/delta")

    // The versioned-directory swap stands in for a transactional commit:
    // each micro-batch publishes a NEW state version (never overwrites
    // the one it read), which is also what makes batch replay safe.
    var cur = s"$root/state/v0"
    val q = spark.readStream
      .schema(spark.read.parquet(s"$root/delta").schema)
      .option("maxFilesPerTrigger", 2)
      .parquet(s"$root/delta")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
        val next = s"$root/state/v${id + 1}"
        Upsert.upsert(spark.read.parquet(cur), batch, "o_orderkey", "ver")
          .write.parquet(next)
        cur = next
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "stream did not finish in time")
    assert(q.exception.isEmpty, s"query failed: ${q.exception}")
    assert(cur != s"$root/state/v0", "no micro-batch ran")

    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getDouble(1), r.getString(2), r.getLong(3))
    val streamed = spark.read.parquet(cur)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"), col("ver"))
      .collect().map(key).toSet
    // The batch side IS the registered query — drift-proof.
    val batch = graft.relational.ProfilingQueries.queries("q_cdc_merge")(spark, sfDir)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"), col("ver"))
      .collect().map(key).toSet
    assert(streamed == batch,
      s"incremental upserts must converge to the one-shot merge " +
        s"(missing=${(batch -- streamed).take(3)}, extra=${(streamed -- batch).take(3)})")
  }

  test("transformWithState throttle (RocksDB state store) == batch exactly") {
    import graft.streaming.Throttle
    val tmp = java.nio.file.Files.createTempDirectory("graft-throttle").toString
    // In-order single-file replay (the operator's documented arrival
    // assumption); emission is immediate, so the drained stream must
    // equal the batch twin EXACTLY — no closed-window subsetting.
    Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .orderBy(col("ts")).coalesce(1)
      .write.mode("overwrite").parquet(tmp)

    // transformWithState requires the RocksDB provider — also the right
    // store for 100 TB state (off-heap, incremental checkpoints).
    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = Throttle.throttled(Throttle.fromRaw(
        spark.readStream.schema(spark.read.parquet(tmp).schema).parquet(tmp)))
      val q = stream.writeStream
        .format("memory").queryName("throttle_out")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(300000), "stream did not finish in time")
      assert(q.exception.isEmpty, s"query failed: ${q.exception}")

      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3))
      val streamed = spark.table("throttle_out")
        .select(col("user_id"), col("hour_start"), col("event_id"), col("event_type"))
        .collect().map(key).toSet
      val batch = StreamingQueries.queries("stream_throttle")(spark, sfDir)
        .collect().map(key).toSet
      assert(streamed == batch,
        s"throttle diverges: missing=${(batch -- streamed).take(3)}, " +
          s"extra=${(streamed -- batch).take(3)}")
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState token bucket (RocksDB) == batch exactly") {
    import graft.streaming.TokenBucket
    val tmp = java.nio.file.Files.createTempDirectory("graft-tbucket").toString
    Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"))
      .orderBy(col("ts")).coalesce(1)
      .write.mode("overwrite").parquet(tmp)

    val prevProvider = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = TokenBucket.limited(TokenBucket.fromRaw(
        spark.readStream.schema(spark.read.parquet(tmp).schema).parquet(tmp)))
      val q = stream.writeStream
        .format("memory").queryName("tbucket_out")
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      assert(q.awaitTermination(300000), "stream did not finish in time")
      assert(q.exception.isEmpty, s"query failed: ${q.exception}")

      def key(r: org.apache.spark.sql.Row) =
        (r.getLong(0), r.getLong(1), r.getTimestamp(2), r.getLong(3))
      val streamed = spark.table("tbucket_out")
        .select(col("user_id"), col("event_id"), col("ts"), col("tokens_after"))
        .collect().map(key).toSet
      val batch = StreamingQueries.queries("stream_token_bucket")(spark, sfDir)
        .collect().map(key).toSet
      assert(streamed == batch,
        s"token bucket diverges: missing=${(batch -- streamed).take(3)}, " +
          s"extra=${(streamed -- batch).take(3)}")
      // The limiter must genuinely reject at these dials — an
      // admit-everything bucket would pass equality vacuously.
      val total = spark.read.parquet(tmp).count()
      assert(streamed.size < total, "limiter admitted every event")
      assert(streamed.nonEmpty)
    } finally {
      prevProvider match {
        case Some(p) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streaming session windows == batch result") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-stream2").toString
    Tables.load(spark, sfDir, "events").write.mode("overwrite").parquet(tmp)

    val stream = spark.readStream
      .schema(spark.read.parquet(tmp).schema)
      .parquet(tmp)
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

    val q = stream.writeStream
      .format("memory")
      .queryName("session_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "stream did not finish in time")

    val streamed = spark.table("session_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val batch = StreamingQueries.queries("stream_session")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming DYNAMIC-gap session windows == batch result") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-sessdyn").toString
    Tables.load(spark, sfDir, "events").write.mode("overwrite").parquet(tmp)

    val stream = spark.readStream
      .schema(spark.read.parquet(tmp).schema)
      .parquet(tmp)
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"),
        when(col("event_type") === "view", "10 minutes")
          .otherwise("5 minutes")).as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("session_start"),
        col("w.end").as("session_end"), col("n_events"))

    val q = stream.writeStream
      .format("memory")
      .queryName("sessdyn_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "stream did not finish in time")

    val streamed = spark.table("sessdyn_out").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    val batch = StreamingQueries.queries("stream_session_dyn")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // The variable gap must genuinely change boundaries vs the fixed-gap
    // operator — otherwise this test would pass on a gap-ignoring plan.
    val fixed = StreamingQueries.queries("stream_session")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2), r.getLong(3))).toSet
    assert(streamed != fixed, "dynamic-gap sessions degenerated to fixed-gap")
  }

  test("stream-stream FULL OUTER join: matched exact, both null sides on eviction") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ssf").toString
    Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .orderBy(col("ts")).coalesce(1)
      .write.mode("overwrite").parquet(tmp)
    val schema = spark.read.parquet(tmp).schema

    def side(tpe: String) = spark.readStream.schema(schema).parquet(tmp)
      .filter(col("event_type") === tpe)

    val views = side("view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", "10 minutes")
    val buys = side("purchase")
      .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"))
      .withWatermark("buy_ts", "10 minutes")

    val q = views.join(buys,
        col("user_id") === col("b_user") &&
          col("buy_ts") >= col("view_ts") &&
          col("buy_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"),
        "full_outer")
      .select(col("view_id"), col("buy_id"))
      .writeStream.format("memory").queryName("ssf_join_out")
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "stream did not finish in time")
    assert(q.exception.isEmpty, s"query failed: ${q.exception}")

    def split(rows: Array[org.apache.spark.sql.Row]) = {
      val m = rows.filter(r => !r.isNullAt(0) && !r.isNullAt(1))
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val lv = rows.filter(r => !r.isNullAt(0) && r.isNullAt(1))
        .map(_.getLong(0)).toSet
      val rb = rows.filter(r => r.isNullAt(0) && !r.isNullAt(1))
        .map(_.getLong(1)).toSet
      (m, lv, rb)
    }
    val (sm, slv, srb) = split(spark.table("ssf_join_out").collect())
    val (bm, blv, brb) = split(
      StreamingQueries.queries("stream_join_full")(spark, sfDir)
        .select(col("view_id"), col("buy_id")).collect())

    // Matched rows emit eagerly — the drained stream must have them ALL.
    assert(sm == bm,
      s"matched rows diverge: missing=${(bm -- sm).take(3)}, extra=${(sm -- bm).take(3)}")
    // Each null side emits on its state eviction: everything streamed
    // must be a true batch non-match; rows near the final watermark may
    // lawfully stay open, but a non-trivial share must have evicted.
    assert((slv -- blv).isEmpty, "stream null-padded a view the batch matched")
    assert((srb -- brb).isEmpty, "stream null-padded a purchase the batch matched")
    assert(slv.nonEmpty, "no unmatched-view rows were ever emitted")
    assert(srb.nonEmpty, "no unmatched-purchase rows were ever emitted")
    assert(slv.intersect(sm.map(_._1)).isEmpty &&
      srb.intersect(sm.map(_._2)).isEmpty,
      "a row emitted both matched and null-padded")
  }

  test("streaming OHLC bars == batch result (min/max struct state)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-ohlc").toString
    Tables.load(spark, sfDir, "events").write.mode("overwrite").parquet(tmp)

    val cents = (col("value").cast(DecimalType(12, 2)) * 100).cast("long")
    val stream = spark.readStream
      .schema(spark.read.parquet(tmp).schema)
      .parquet(tmp)
      .withWatermark("ts", "10 minutes")
      .select(window(col("ts"), "1 hour").as("w"), col("event_type"),
        col("ts"), col("event_id"), cents.as("c"))
      .groupBy(col("w"), col("event_type"))
      .agg(count(lit(1)).as("n_trades"),
        min(struct(col("ts"), col("event_id"), col("c"))).as("o"),
        max(struct(col("ts"), col("event_id"), col("c"))).as("cl"),
        max(col("c")).as("hi"), min(col("c")).as("lo"))
      .select(col("w.start").as("window_start"),
        col("w.end").as("window_end"), col("event_type"), col("n_trades"),
        (col("o.c").cast("double") / 100).as("open"),
        (col("hi").cast("double") / 100).as("high"),
        (col("lo").cast("double") / 100).as("low"),
        (col("cl.c").cast("double") / 100).as("close"))

    val q = stream.writeStream
      .format("memory")
      .queryName("ohlc_out")
      .outputMode("complete")
      .trigger(Trigger.AvailableNow())
      .start()
    assert(q.awaitTermination(300000), "stream did not finish in time")

    def key(r: org.apache.spark.sql.Row) =
      (r.getTimestamp(0), r.getTimestamp(1), r.getString(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6), r.getDouble(7))
    val streamed = spark.table("ohlc_out").collect().map(key).toSet
    val batch = StreamingQueries.queries("stream_ohlc")(spark, sfDir)
      .collect().map(key).toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
    // bar sanity: low <= open/close <= high on every bar
    batch.foreach { case (_, _, _, _, o, h, l, c) =>
      assert(l <= o && o <= h && l <= c && c <= h)
    }
  }
}
