package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}

/** Event-time windowing over `events` (SURVEY.md §2.7 — the reference is
  * batch-only; this is the Structured-Streaming-shaped surface).
  *
  * The driver's correctness gate runs batch DataFrames, so these queries
  * are the BATCH evaluation of the same event-time window operators the
  * streaming pipelines use (`window`/`session_window` are identical
  * expressions in both modes); StreamingSpec runs the real readStream
  * variants (tumbling agg with watermark, availableNow trigger) and
  * asserts they produce exactly these batch results.
  *
  * Scale: windowed aggs shuffle on (window, key) — at 100 TB the state
  * store, not the shuffle, is the constraint; watermarks bound it.
  */
object StreamingQueries extends QueryPack {

  private def events(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "events")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Tumbling 1-hour windows per event_type.
    "stream_tumbling" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total"))
        .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
          col("event_type"), col("n"), col("total"))),

    // CHAINED time-window aggregations (Spark 3.4+/4.x multiple stateful
    // operators): 10-minute tumbling partials re-aggregated into 1-hour
    // windows by passing the WINDOW STRUCT itself as the next window()'s
    // time column — the streaming rollup pattern (fine-grain state near
    // the source, coarse-grain serving tables downstream, one pipeline).
    // n_subwindows proves the plan really chains (a flat hourly agg
    // cannot produce it). In batch mode this is two cascaded
    // HashAggregates — the second over the BOUNDED (windows × types)
    // relation; in streaming both levels keep watermark-bounded state
    // (StreamingSpec runs the real two-level readStream variant).
    "stream_chained_agg" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "10 minutes").as("w10"), col("event_type"))
        .agg(count(lit(1)).as("n10"),
          sum(col("value").cast(DecimalType(18, 4))).as("t10"))
        .groupBy(window(col("w10"), "1 hour").as("w"), col("event_type"))
        .agg(sum(col("n10")).as("n"),
          sum(col("t10")).cast("double").as("total"),
          count(lit(1)).as("n_subwindows"))
        .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
          col("event_type"), col("n"), col("total"), col("n_subwindows"))),

    // Sliding 1-hour windows every 30 minutes (each event in 2 windows).
    "stream_sliding" -> ((s, d) =>
      events(s, d)
        .groupBy(window(col("ts"), "1 hour", "30 minutes").as("w"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
          col("n"))),

    // Session windows per user with a 5-minute inactivity gap.
    "stream_session" -> ((s, d) =>
      events(s, d)
        .groupBy(session_window(col("ts"), "5 minutes").as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"))),

    // At-least-once delivery dedup: the input carries duplicate deliveries
    // (simulated by a self-union — the testdata has no natural dups);
    // dropDuplicates(event_id) restores exactly-once before aggregation.
    // The rows of a duplicate pair are identical, so "keep first" is
    // deterministic. StreamingSpec runs the real readStream
    // dropDuplicates-within-watermark variant of this exact shape.
    "stream_dedup" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"))
      ev.union(ev)
        .dropDuplicates("event_id")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"))
    }),

    // Stream-static enrichment join: the event stream against the (slowly
    // changing) customer dimension, then a windowed rollup per market
    // segment. In streaming mode Spark re-reads the static side per
    // micro-batch and never keeps join state for it, which is what makes
    // dimension joins viable at 100 TB of stream; whether the per-batch
    // join replicates the dim is the planner's size-based call (an
    // explicit broadcast hint on the SF-scaled customer table would force
    // a replication OOM at scale — BroadcastAuditSpec bans it). The
    // readStream variant of this exact shape is asserted ≡ batch in
    // StreamingSpec.
    "stream_join_static" -> ((s, d) => {
      val cust = Tables.load(s, d, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      events(s, d)
        .join(cust, col("user_id") === col("c_custkey"))
        .groupBy(window(col("ts"), "1 hour").as("w"), col("c_mktsegment"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 4))).cast("double").as("total"))
        .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
          col("c_mktsegment"), col("n"), col("total"))
    }),

    // STREAM-STREAM interval join, batch evaluation: view->purchase
    // conversion attribution within 30 minutes per user. The join is an
    // equi-join on user_id with an event-time interval predicate — exactly
    // the shape Spark's stream-stream join requires (watermarks on both
    // sides + a time-range condition bound the buffered state to the
    // interval, which is what makes it viable at 100 TB of stream);
    // StreamingSpec runs the real two-readStream variant and asserts it
    // produces exactly these rows.
    "stream_stream_join" -> ((s, d) => {
      val ev = events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
          col("ts").as("buy_ts"), col("value"))
      views.join(buys,
          col("user_id") === col("b_user") &&
            col("buy_ts") >= col("view_ts") &&
            col("buy_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
        .select(col("user_id"), col("view_id"), col("buy_id"),
          col("view_ts"), col("buy_ts"), col("value"))
    }),

    // Hourly per-user throttle, batch evaluation of [[Throttle]] (the
    // transformWithState operator): the first event of each (user, hour)
    // — row_number 1 over the user+hour partition, deterministic ties by
    // event_id. date_trunc('hour') and the operator's epoch-micros floor
    // agree because epoch hours are hour-aligned.
    "stream_throttle" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id"), col("hour_start"))
        .orderBy(col("ts").asc, col("event_id").asc)
      events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
          date_trunc("hour", col("ts")).as("hour_start"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("hour_start"), col("event_id"),
          col("event_type"))
    }),

    // LEFT OUTER stream-stream interval join, batch evaluation: every
    // view, with its purchase inside 30 minutes OR nulls — the
    // "did-not-convert" shape an attribution pipeline needs (the inner
    // join above can't see abandonment). Streaming twin in StreamingSpec:
    // watermarks on BOTH sides bound the state, matched rows emit
    // eagerly, and the null-padded row for an unconverted view emits
    // exactly when the watermark evicts its state — so the outer rows
    // are append-mode correct, just watermark-delayed.
    "stream_join_left" -> ((s, d) => {
      val ev = events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
          col("ts").as("buy_ts"), col("value"))
      views.join(buys,
          col("user_id") === col("b_user") &&
            col("buy_ts") >= col("view_ts") &&
            col("buy_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"),
          "left_outer")
        .select(col("user_id"), col("view_id"), col("buy_id"),
          col("view_ts"), col("buy_ts"), col("value"))
    }),

    // FULL OUTER stream-stream interval join, batch evaluation: the
    // two-sided completion of stream_join_left — unmatched views
    // (abandonment) AND unmatched purchases (direct buys with no
    // preceding view, attribution's dark traffic) both survive with null
    // padding. Streaming twin in StreamingSpec: full-outer stream-stream
    // joins need watermarks on BOTH sides + the interval condition;
    // matched rows emit eagerly and each side's null-padded rows emit on
    // its state eviction. user_id coalesces across sides so the key
    // survives right-only rows.
    "stream_join_full" -> ((s, d) => {
      val ev = events(s, d)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ts").as("view_ts"))
      val buys = ev.filter(col("event_type") === "purchase")
        .select(col("user_id").as("b_user"), col("event_id").as("buy_id"),
          col("ts").as("buy_ts"), col("value"))
      views.join(buys,
          col("user_id") === col("b_user") &&
            col("buy_ts") >= col("view_ts") &&
            col("buy_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"),
          "full_outer")
        .select(coalesce(col("user_id"), col("b_user")).as("user_id"),
          col("view_id"), col("buy_id"), col("view_ts"), col("buy_ts"),
          col("value"))
    }),

    // DYNAMIC-GAP session windows (Spark 3.2+): the inactivity gap is a
    // per-event EXPRESSION — views hold the session open 10 minutes,
    // everything else 5 — the real-world sessionization shape (content
    // types with different dwell expectations). Semantics: each event
    // spans [ts, ts+gap); overlapping spans merge; session end is the
    // max span end, so variable gaps genuinely change session boundaries
    // (a fixed-gap run cannot reproduce these rows). The oracle replays
    // the merge as a user-partitioned running-max-of-span-end island
    // build — break exactly when ts >= every previous span's end.
    "stream_session_dyn" -> ((s, d) =>
      events(s, d)
        .groupBy(session_window(col("ts"),
          when(col("event_type") === "view", "10 minutes")
            .otherwise("5 minutes")).as("w"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("w.start").as("session_start"),
          col("w.end").as("session_end"), col("n_events"))),

    // Token-bucket rate limiting, batch evaluation of [[TokenBucket]]
    // (the transformWithState operator): each user's bucket holds 3
    // tokens refilling at 1 per 10 minutes; admitted events and their
    // remaining whole-token balance. All int64 µs-token arithmetic, so
    // the fold here, the streaming processor, and the recursive-CTE
    // oracle must agree exactly (StreamingSpec asserts streaming ≡ batch
    // under in-order replay).
    "stream_token_bucket" -> ((s, d) =>
      TokenBucket.batch(events(s, d))),

    // Stateful threshold-crossing detection, batch evaluation: for each
    // user, the FIRST event at which their cumulative value reaches 100 —
    // the alerting/budget-cap shape (fraud thresholds, quota exhaustion,
    // billing caps). Running state is one decimal per user; the streaming
    // twin keeps exactly that in a GroupState and emits once on crossing
    // (StreamingSpec's flatMapGroupsWithState variant is asserted ≡ this
    // batch result). Cumulative sums are DECIMAL so the running total is
    // order-exact, and the per-user window partitions on user_id — state
    // and shuffle are both per-key-bounded at any stream size.
    "stream_threshold_cross" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      events(s, d)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("value").cast(DecimalType(18, 4)).as("v"))
        .withColumn("cum", sum(col("v")).over(byUser))
        .filter(col("cum") >= CrossThreshold)
        .withColumn("rn", row_number().over(byUser))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id").as("cross_event_id"),
          col("ts").as("cross_ts"), col("cum").cast("double").as("cum_value"))
    }),

    // Per-(type, day) EWMA spike detector, batch evaluation of the
    // [[Ewma]] operator's semantics: fold the day's events in (ts,
    // event_id) order — seed on the first value, count a spike whenever a
    // value exceeds 2x the TRAILING average, then smooth with α=0.2.
    // The streaming twin carries exactly (ewma, n, spikes) per key;
    // EwmaStreamSpec proves readStream ≡ this fold including an
    // intra-day two-batch split where state crosses the batch boundary.
    // 0.2/0.8 literals are IEEE-identical to Scala's α/(1−α), so the
    // three formulations (Scala scan, this fold, the oracle recursion)
    // share every bit.
    "stream_ewma" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"),
          struct(col("ts"), col("event_id"),
            col("value").cast(DecimalType(12, 2)).cast("double").as("v"))
            .as("e"))
        .groupBy(col("event_type"), col("day"))
        // Comparator on (ts, event_id) ONLY (ADVICE r11): the bare
        // struct sort would let v participate as a trailing key, a
        // contract the streaming twin (Ewma.scan) and the oracle — both
        // ordering by (ts, event_id) alone — do not share.
        .agg(expr("""array_sort(collect_list(e), (a, b) -> CASE
              WHEN a.ts < b.ts THEN -1 WHEN a.ts > b.ts THEN 1
              WHEN a.event_id < b.event_id THEN -1
              WHEN a.event_id > b.event_id THEN 1 ELSE 0 END)""").as("es"))
      ev.select(col("event_type"), col("day"), size(col("es")).as("n_events"),
          expr("""aggregate(
              slice(es, 2, size(es) - 1),
              named_struct('e', es[0].v, 's', CAST(0 AS BIGINT)),
              (a, x) -> named_struct(
                'e', 0.2 * x.v + 0.8 * a.e,
                's', a.s + CASE WHEN x.v > 2.0 * a.e THEN 1 ELSE 0 END))""")
            .as("st"))
        .select(col("event_type"), col("day"),
          col("n_events").cast("long").as("n_events"),
          round(col("st.e"), 6).as("ewma"), col("st.s").as("n_spikes"))
    }),

    // Per-window top-k event types, batch evaluation of the
    // [[WindowTopK]] operator's semantics (leaderboard/trending shape).
    // Streaming has no rank in append mode, so the streaming twin is a
    // flatMapGroupsWithState operator emitting each window's ranked
    // top-3 exactly once when the watermark closes it (StreamingSpec
    // asserts closed windows ≡ these rows). The window here partitions
    // the rank — high-cardinality over time, never a global sort.
    "stream_window_topk" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("window_start"))
        .orderBy(col("n").desc, col("event_type").asc)
      events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
        .agg(count(lit(1)).as("n"))
        .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
          col("event_type"), col("n"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= WindowTopK.K)
    }),

    // The custom flatMapGroupsWithState sessionizer (Sessionize), batch
    // evaluation — richer per-session state than session_window can carry
    // (distinct event-type count).
    // CDC-style materialized latest state per key — the streaming
    // "table view of a changelog": in batch this is one max(struct) agg
    // keyed by user (event_id breaks timestamp ties, so the pick is
    // total-ordered); the streaming twin (LatestStateStreamSpec) runs
    // the identical agg in complete/update mode where the state store
    // holds exactly one struct per key — the canonical bounded-state
    // upsert view. At 100 TB the state is |keys|, not |events|.
    "stream_latest_state" -> ((s, d) =>
      events(s, d)
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          max(struct(col("ts"), col("event_id"), col("event_type"),
            col("value"))).as("last"))
        .select(col("user_id"), col("n_events"),
          col("last.ts").as("last_ts"),
          col("last.event_type").as("last_type"),
          col("last.value").as("last_value"))),

    "stream_sessionize_custom" -> ((s, d) => {
      import s.implicits._
      Sessionize.sessionsBatch(
        events(s, d).select(col("user_id"), col("ts"), col("event_type"))
          .as[Sessionize.Event])
        .toDF()
        .select(col("user_id"), col("session_start"), col("session_end"),
          col("n_events"), col("n_event_types"))
    }),

    // Tumbling OHLC bars per event type — the market-data candlestick
    // rollup, and the general "first/last/extreme per window" shape any
    // metering pipeline needs. Open/close ride the stream_latest_state
    // min/max(struct) pattern (ts, event_id, cents — event_id is unique,
    // so the pick is total-ordered and the trailing payload never
    // decides); high/low are exact-cents extremes; all four land as
    // exact two-decimal doubles. The same agg runs unchanged as a
    // watermarked streaming window (min/max are declarative aggregates;
    // state is one struct pair per (window, type)).
    "stream_ohlc" -> ((s, d) => {
      val cents = (col("value").cast(DecimalType(12, 2)) * 100).cast("long")
      events(s, d)
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
    }),

    // Per-(type, day) one-sided CUSUM drift detector, batch evaluation of
    // the [[Cusum]] operator's semantics: fold the day's events in (ts,
    // event_id) order with S = max(0, S + (v − K)), alarm + reset at
    // S >= H. The K/H literals and the greatest() expression shape are
    // IEEE-identical across the Scala scan, this fold, and the oracle
    // recursion. CusumStreamSpec proves readStream ≡ this fold including
    // an intra-day two-batch split where (S, n, alarms) state crosses the
    // micro-batch boundary.
    "stream_cusum" -> ((s, d) => {
      val ev = events(s, d)
        .select(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"),
          struct(col("ts"), col("event_id"),
            col("value").cast(DecimalType(12, 2)).cast("double").as("v"))
            .as("e"))
        .groupBy(col("event_type"), col("day"))
        .agg(expr("""array_sort(collect_list(e), (a, b) -> CASE
              WHEN a.ts < b.ts THEN -1 WHEN a.ts > b.ts THEN 1
              WHEN a.event_id < b.event_id THEN -1
              WHEN a.event_id > b.event_id THEN 1 ELSE 0 END)""").as("es"))
      ev.select(col("event_type"), col("day"), size(col("es")).as("n_events"),
          expr(s"""aggregate(
              es,
              named_struct('s', CAST(0.0 AS DOUBLE), 'a', CAST(0 AS BIGINT)),
              (acc, x) -> CASE
                WHEN greatest(CAST(0.0 AS DOUBLE), acc.s + (x.v - ${Cusum.K}D)) >= ${Cusum.H}D
                THEN named_struct('s', CAST(0.0 AS DOUBLE), 'a', acc.a + 1)
                ELSE named_struct(
                  's', greatest(CAST(0.0 AS DOUBLE), acc.s + (x.v - ${Cusum.K}D)),
                  'a', acc.a) END)""").as("st"))
        .select(col("event_type"), col("day"),
          col("n_events").cast("long").as("n_events"),
          round(col("st.s"), 6).as("cusum"), col("st.a").as("n_alarms"))
    })
  )

  /** Cumulative-value alert threshold for stream_threshold_cross. */
  val CrossThreshold = 100

  override val oracles: Map[String, String] = Map(
    "stream_latest_state" ->
      """WITH r AS (
        |  SELECT user_id, ts, event_type, value,
        |         count(*) OVER (PARTITION BY user_id) AS n_events,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events
        |)
        |SELECT user_id, CAST(n_events AS BIGINT) AS n_events, ts AS last_ts,
        |       event_type AS last_type, value AS last_value
        |FROM r WHERE rn = 1""".stripMargin,

    "stream_ohlc" ->
      """WITH b AS (
        |  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |         event_type, ts, event_id,
        |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
        |  FROM events
        |)
        |SELECT window_start,
        |       window_start + INTERVAL '1 hour' AS window_end,
        |       event_type, count(*) AS n_trades,
        |       CAST(first(c ORDER BY ts, event_id) AS DOUBLE) / 100 AS open,
        |       CAST(max(c) AS DOUBLE) / 100 AS high,
        |       CAST(min(c) AS DOUBLE) / 100 AS low,
        |       CAST(last(c ORDER BY ts, event_id) AS DOUBLE) / 100 AS close
        |FROM b GROUP BY 1, 2, 3""".stripMargin,

    "stream_cusum" ->
      s"""WITH RECURSIVE ev AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS v,
         |         row_number() OVER (PARTITION BY event_type, CAST(date_trunc('day', ts) AS DATE)
         |                            ORDER BY ts, event_id) AS j
         |  FROM events
         |), nn AS (
         |  SELECT event_type, day, CAST(max(j) AS INT) AS n
         |  FROM ev GROUP BY 1, 2
         |), rec(event_type, day, j, s, a) AS (
         |  SELECT event_type, day, 1,
         |         CASE WHEN greatest(0.0, v - ${Cusum.K}) >= ${Cusum.H}
         |              THEN 0.0 ELSE greatest(0.0, v - ${Cusum.K}) END,
         |         CASE WHEN greatest(0.0, v - ${Cusum.K}) >= ${Cusum.H}
         |              THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END
         |  FROM ev WHERE j = 1
         |  UNION ALL
         |  SELECT r.event_type, r.day, r.j + 1,
         |         CASE WHEN greatest(0.0, r.s + (x.v - ${Cusum.K})) >= ${Cusum.H}
         |              THEN 0.0 ELSE greatest(0.0, r.s + (x.v - ${Cusum.K})) END,
         |         r.a + CASE WHEN greatest(0.0, r.s + (x.v - ${Cusum.K})) >= ${Cusum.H}
         |               THEN 1 ELSE 0 END
         |  FROM rec r JOIN ev x ON x.event_type = r.event_type
         |                      AND x.day = r.day AND x.j = r.j + 1
         |)
         |SELECT r.event_type, r.day, CAST(n.n AS BIGINT) AS n_events,
         |       round(r.s, 6) AS cusum, r.a AS n_alarms
         |FROM rec r JOIN nn n ON n.event_type = r.event_type
         |                    AND n.day = r.day AND r.j = n.n""".stripMargin,

    "stream_ewma" ->
      """WITH RECURSIVE ev AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         CAST(CAST(value AS DECIMAL(12,2)) AS DOUBLE) AS v,
        |         row_number() OVER (PARTITION BY event_type, CAST(date_trunc('day', ts) AS DATE)
        |                            ORDER BY ts, event_id) AS j
        |  FROM events
        |), nn AS (
        |  SELECT event_type, day, CAST(max(j) AS INT) AS n
        |  FROM ev GROUP BY 1, 2
        |), rec(event_type, day, j, e, s) AS (
        |  SELECT event_type, day, 1, v, CAST(0 AS BIGINT)
        |  FROM ev WHERE j = 1
        |  UNION ALL
        |  SELECT r.event_type, r.day, r.j + 1,
        |         0.2 * x.v + 0.8 * r.e,
        |         r.s + CASE WHEN x.v > 2.0 * r.e THEN 1 ELSE 0 END
        |  FROM rec r JOIN ev x ON x.event_type = r.event_type
        |                      AND x.day = r.day AND x.j = r.j + 1
        |)
        |SELECT r.event_type, r.day, CAST(n.n AS BIGINT) AS n_events,
        |       round(r.e, 6) AS ewma, r.s AS n_spikes
        |FROM rec r JOIN nn n ON n.event_type = r.event_type
        |                    AND n.day = r.day AND r.j = n.n""".stripMargin,

    "stream_threshold_cross" ->
      s"""WITH c AS (
         |  SELECT user_id, event_id, ts,
         |         sum(CAST(value AS DECIMAL(18,4)))
         |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS cum
         |  FROM events
         |), f AS (
         |  SELECT user_id, event_id, ts, cum,
         |         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
         |  FROM c WHERE cum >= $CrossThreshold
         |)
         |SELECT user_id, event_id AS cross_event_id, ts AS cross_ts,
         |       CAST(cum AS DOUBLE) AS cum_value
         |FROM f WHERE rn = 1""".stripMargin,

    "stream_window_topk" ->
      s"""WITH c AS (
         |  SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
         |         event_type, count(*) AS n
         |  FROM events GROUP BY 1, 2
         |), r AS (
         |  SELECT window_start, event_type, n,
         |         row_number() OVER (PARTITION BY window_start
         |                            ORDER BY n DESC, event_type ASC) AS rnk
         |  FROM c
         |)
         |SELECT window_start, window_start + INTERVAL '1 hour' AS window_end,
         |       event_type, n, CAST(rnk AS INT) AS rnk
         |FROM r WHERE rnk <= ${WindowTopK.K}""".stripMargin,

    "stream_tumbling" ->
      """SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
        |       time_bucket(INTERVAL '1 hour', ts) + INTERVAL '1 hour' AS window_end,
        |       event_type, count(*) AS n,
        |       CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM events GROUP BY 1, 2, 3""".stripMargin,

    "stream_chained_agg" ->
      """WITH w10 AS (
        |  SELECT time_bucket(INTERVAL '10 minutes', ts) AS t10, event_type,
        |         count(*) AS n10,
        |         sum(CAST(value AS DECIMAL(18,4))) AS t10v
        |  FROM events GROUP BY 1, 2
        |)
        |SELECT time_bucket(INTERVAL '1 hour', t10) AS window_start,
        |       time_bucket(INTERVAL '1 hour', t10) + INTERVAL '1 hour' AS window_end,
        |       event_type, CAST(sum(n10) AS BIGINT) AS n,
        |       CAST(sum(t10v) AS DOUBLE) AS total,
        |       count(*) AS n_subwindows
        |FROM w10 GROUP BY 1, 2, 3""".stripMargin,

    "stream_sliding" ->
      """WITH w AS (
        |  SELECT unnest([time_bucket(INTERVAL '30 minutes', ts),
        |                 time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes'])
        |           AS window_start
        |  FROM events
        |)
        |SELECT window_start, window_start + INTERVAL '1 hour' AS window_end,
        |       count(*) AS n
        |FROM w GROUP BY 1, 2""".stripMargin,

    // Sessionization via gap-break cumulative sum; Spark's session end is
    // last-event ts + gap (half-open windows), so a new session starts when
    // the gap is >= 5 minutes.
    "stream_session" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |), s AS (
        |  SELECT user_id, ts,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o
        |)
        |SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL '5 minutes' AS session_end,
        |       count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,

    // Exactly-once after dedup == plain counts over the un-duplicated
    // input.
    "stream_dedup" ->
      """SELECT event_type, count(*) AS n
        |FROM events GROUP BY event_type""".stripMargin,

    "stream_join_static" ->
      """SELECT time_bucket(INTERVAL '1 hour', e.ts) AS window_start,
        |       time_bucket(INTERVAL '1 hour', e.ts) + INTERVAL '1 hour' AS window_end,
        |       c.c_mktsegment, count(*) AS n,
        |       CAST(sum(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS total
        |FROM events e JOIN customer c ON c.c_custkey = e.user_id
        |GROUP BY 1, 2, 3""".stripMargin,

    "stream_stream_join" ->
      """SELECT v.user_id, v.event_id AS view_id, b.event_id AS buy_id,
        |       v.ts AS view_ts, b.ts AS buy_ts, b.value
        |FROM events v JOIN events b
        |  ON v.user_id = b.user_id
        | AND v.event_type = 'view' AND b.event_type = 'purchase'
        | AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL 30 MINUTES""".stripMargin,

    "stream_throttle" ->
      """SELECT user_id, hour_start, event_id, event_type FROM (
        |  SELECT user_id, date_trunc('hour', ts) AS hour_start, event_id,
        |         event_type,
        |         row_number() OVER (PARTITION BY user_id, date_trunc('hour', ts)
        |                            ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events
        |) WHERE rn = 1""".stripMargin,

    // The type slices are subqueries (not ON-clause predicates): a
    // non-view row must never be null-padded into the left side.
    "stream_join_left" ->
      """SELECT v.user_id, v.view_id, b.buy_id, v.view_ts, b.buy_ts, b.value
        |FROM (SELECT user_id, event_id AS view_id, ts AS view_ts
        |      FROM events WHERE event_type = 'view') v
        |LEFT JOIN (SELECT user_id, event_id AS buy_id, ts AS buy_ts, value
        |           FROM events WHERE event_type = 'purchase') b
        |  ON v.user_id = b.user_id
        | AND b.buy_ts >= v.view_ts
        | AND b.buy_ts <= v.view_ts + INTERVAL 30 MINUTES""".stripMargin,

    // The bucket walk replayed as a per-user recursive CTE over
    // row-number-indexed events — identical integers by construction.
    "stream_token_bucket" ->
      s"""WITH RECURSIVE idx AS (
         |  SELECT user_id, epoch_us(ts) AS us, event_id, ts,
         |         row_number() OVER (PARTITION BY user_id
         |                            ORDER BY epoch_us(ts), event_id) AS k
         |  FROM events
         |), r AS (
         |  SELECT user_id, k, us, event_id, ts,
         |         CAST(${TokenBucket.CapUs} - ${TokenBucket.RefillUs} AS BIGINT) AS avail,
         |         TRUE AS admitted
         |  FROM idx WHERE k = 1
         |  UNION ALL
         |  SELECT i.user_id, i.k, i.us, i.event_id, i.ts,
         |         CASE WHEN least(${TokenBucket.CapUs}, r.avail + (i.us - r.us)) >= ${TokenBucket.RefillUs}
         |              THEN least(${TokenBucket.CapUs}, r.avail + (i.us - r.us)) - ${TokenBucket.RefillUs}
         |              ELSE least(${TokenBucket.CapUs}, r.avail + (i.us - r.us)) END,
         |         least(${TokenBucket.CapUs}, r.avail + (i.us - r.us)) >= ${TokenBucket.RefillUs}
         |  FROM r JOIN idx i ON i.user_id = r.user_id AND i.k = r.k + 1
         |)
         |SELECT user_id, event_id, ts,
         |       CAST(avail // ${TokenBucket.RefillUs} AS BIGINT) AS tokens_after
         |FROM r WHERE admitted""".stripMargin,

    "stream_join_full" ->
      """SELECT COALESCE(v.user_id, b.user_id) AS user_id,
        |       v.view_id, b.buy_id, v.view_ts, b.buy_ts, b.value
        |FROM (SELECT user_id, event_id AS view_id, ts AS view_ts
        |      FROM events WHERE event_type = 'view') v
        |FULL OUTER JOIN (SELECT user_id, event_id AS buy_id, ts AS buy_ts, value
        |                 FROM events WHERE event_type = 'purchase') b
        |  ON v.user_id = b.user_id
        | AND b.buy_ts >= v.view_ts
        | AND b.buy_ts <= v.view_ts + INTERVAL 30 MINUTES""".stripMargin,

    // Variable-gap merge replay: an event breaks a session exactly when
    // its ts clears the running max of every previous event's span end.
    "stream_session_dyn" ->
      """WITH g AS (
        |  SELECT user_id, ts, event_id,
        |         ts + CASE WHEN event_type = 'view' THEN INTERVAL '10 minutes'
        |                   ELSE INTERVAL '5 minutes' END AS e
        |  FROM events
        |), o AS (
        |  SELECT user_id, ts, e,
        |         CASE WHEN max(e) OVER (PARTITION BY user_id
        |                ORDER BY ts ASC, event_id ASC
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
        |                OR ts >= max(e) OVER (PARTITION BY user_id
        |                     ORDER BY ts ASC, event_id ASC
        |                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |              THEN 1 ELSE 0 END AS brk,
        |         event_id
        |  FROM g
        |), s AS (
        |  SELECT user_id, ts, e,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o
        |)
        |SELECT user_id, min(ts) AS session_start, max(e) AS session_end,
        |       count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin,

    // Same gap-break construction plus the distinct-type count the custom
    // operator tracks in its state.
    "stream_sessionize_custom" ->
      """WITH o AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         CASE WHEN lag(ts) OVER w IS NULL
        |                OR ts - lag(ts) OVER w >= INTERVAL '5 minutes'
        |              THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        |), s AS (
        |  SELECT user_id, ts, event_type,
        |         sum(brk) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM o
        |)
        |SELECT user_id, min(ts) AS session_start,
        |       max(ts) + INTERVAL '5 minutes' AS session_end,
        |       count(*) AS n_events,
        |       CAST(count(DISTINCT event_type) AS INT) AS n_event_types
        |FROM s GROUP BY user_id, sid""".stripMargin
  )
}
