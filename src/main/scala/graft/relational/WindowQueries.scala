package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}

/** Window-function surface (SURVEY.md §2.6 — absent in the reference,
  * provided from built-ins over `events`/`orders`): row_number, rank,
  * dense_rank, lag/lead, running aggregates, per-group top-k.
  *
  * Determinism: every ORDER BY carries a unique tiebreak column
  * (event_id / orderkey); running double sums go through DECIMAL so the
  * cumulative aggregation is bit-identical cross-engine regardless of how
  * the engine internally accumulates (DuckDB uses segment trees for window
  * aggs — plain double prefix sums would NOT match).
  *
  * Scale: all windows partition by a high-cardinality key (user_id,
  * custkey) — no global-ordering window without PARTITION BY appears in the
  * surface, because a single unpartitioned window is the classic 100 TB
  * anti-pattern (one task sorts everything).
  */
object WindowQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_window_rownum" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      t(s, d, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("user_id"), col("event_id"), col("event_type"), col("rn"))
    }),

    "q_window_rank" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("value").desc)
      t(s, d, "events")
        .select(col("event_type"), col("event_id"), col("value"),
          rank().over(w).as("rnk"),
          dense_rank().over(w).as("drnk"))
        .filter(col("rnk") <= 5)
    }),

    "q_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          lag(col("value"), 1).over(w).as("prev_value"),
          lead(col("value"), 1).over(w).as("next_value"))
    }),

    "q_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          sum(col("value").cast(DecimalType(18, 4))).over(w)
            .cast("double").as("running_value"),
          count(lit(1)).over(w).as("running_n"))
    }),

    // As-of join, composed from built-ins (SURVEY §4 preference (a)): for
    // each purchase, the most recent PRIOR view by the same user — a
    // last_value-ignore-nulls over an unbounded-to-(-1) frame on the
    // unioned, time-ordered event stream. No custom operator needed, and
    // the plan is one partitioned sort — the same cost as any window.
    "q_asof_join" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      t(s, d, "events")
        .withColumn("last_view_ts",
          last(when(col("event_type") === "view", col("ts")), ignoreNulls = true)
            .over(w))
        .filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("last_view_ts"),
          (unix_micros(col("ts")) - unix_micros(col("last_view_ts")))
            .as("gap_us"))
    }),

    // The NATIVE as-of join (graft.plans.AsOfJoin — custom LogicalPlan +
    // SparkStrategy + streaming-merge SparkPlan, SURVEY §4 preference
    // (c)): the genuine two-table merge_asof, where q_asof_join above is
    // the single-stream window composition. Purchases asof-join the view
    // stream per user; semantics differ deliberately at the tie (a view
    // AT the purchase timestamp matches here; the window form's -1 frame
    // excludes it) — each variant carries its own oracle.
    "q_asof_join_native" -> ((s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
      graft.plans.AsOfJoin.asof(purchases, views,
          "user_id", "ts", "v_user", "view_ts")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("view_ts").as("last_view_ts"),
          (unix_micros(col("ts")) - unix_micros(col("view_ts"))).as("gap_us"))
    }),

    // The tolerance-bounded variant (merge_asof(tolerance=1h)): a view
    // older than an hour no longer explains the purchase. This is the
    // shape the window composition genuinely cannot express without
    // dragging the right payload through an unbounded frame — in the
    // native exec it is one comparison against the buffered row.
    "q_asof_join_tolerance" -> ((s, d) => {
      val ev = t(s, d, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id").as("v_user"), col("ts").as("view_ts"))
      graft.plans.AsOfJoin.asof(purchases, views,
          "user_id", "ts", "v_user", "view_ts",
          toleranceUs = Some(3600L * 1000000L))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("view_ts").as("last_view_ts"),
          (unix_micros(col("ts")) - unix_micros(col("view_ts"))).as("gap_us"))
    }),

    // Distribution window functions: ntile / percent_rank / cume_dist.
    // ntile depends on row order, not rank, so the ORDER BY carries the
    // unique orderkey tiebreak to stay deterministic under ties.
    "q_window_dist" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 6).as("pct_rank"),
          round(cume_dist().over(w), 6).as("cdist"))
    }),

    // Value-based RANGE frame (vs q_window_running's ROWS frame): per
    // user, events and exact-decimal value in the trailing 24 h. The ORDER
    // BY column is epoch micros because a numeric range bound is what both
    // engines (and a 1000-executor sort) key on; peers (equal us) share a
    // frame by RANGE semantics, so no tiebreak column is needed for
    // determinism.
    "q_window_range_frame" -> ((s, d) => {
      val DayUs = 86400000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-DayUs, 0)
      t(s, d, "events")
        .withColumn("us", unix_micros(col("ts")))
        .select(col("user_id"), col("event_id"),
          count(lit(1)).over(w).as("n_24h"),
          sum(col("value").cast(DecimalType(18, 4))).over(w)
            .cast("double").as("val_24h"))
    }),

    // Quartile bucketing within each user's event history (spend-tier
    // labeling): ntile(4) with the unique (value, event_id) tiebreak, so
    // bucket boundaries are deterministic. Partitioned by user_id like
    // every window in this surface — high-cardinality at scale.
    "q_window_ntile" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("value").asc, col("event_id").asc)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("value"),
          ntile(4).over(w).as("quartile"))
    }),

    // Positional value extraction over the full partition frame:
    // first/third/last event type of each user's history on an
    // unbounded-both-ways frame — the nth_value surface (lead/lag's
    // frame-anchored sibling; the ignore-nulls variant lives in
    // q_gapfill_locf and the attribution queries). Deterministic via
    // the unique (ts, event_id) order; user-partitioned like every
    // window in this surface.
    "q_window_nth" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          first(col("event_type")).over(w).as("first_type"),
          nth_value(col("event_type"), 3).over(w).as("third_type"),
          last(col("event_type")).over(w).as("last_type"))
    }),

    // Per-group top-k: top-3 orders by value per customer.
    "q_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      t(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
    }),

    // SCD type-2 interval assembly: collapse each user's event stream to
    // its event_type CHANGE POINTS and attach [valid_from, valid_to)
    // validity intervals — the slowly-changing-dimension build step of a
    // warehouse load. Two user-partitioned windows over the SAME
    // (partition, order): the change-point filter between them shrinks
    // the data, and Catalyst runs both in one sort — the filter preserves
    // the sort order, so the second Window adds NO exchange and no
    // re-sort. valid_to is NULL on each user's current row
    // (is_current = 1). Ties in ts break by event_id in both engines.
    "q_scd2_intervals" -> ((s, d) => scd2Of(t(s, d, "events"))),

    // INCREMENTAL SCD2 maintenance — the production shape of the build
    // above: the dimension table exists (built from events before the
    // cutoff), a new batch arrives (events after), and the load must fold
    // the batch in WITHOUT re-reading history: close each still-open
    // interval at its user's first post-cutoff change, append the batch's
    // own change-point intervals, and pass closed history through
    // untouched. The batch's first change per user is seeded with the
    // open interval's type (a same-type continuation is NOT a change), so
    // the fold is exactly equivalent to a full rebuild — and the oracle
    // IS the full rebuild, so the hash match is the equivalence proof
    // (the dedup_incremental_reconcile discipline). Cost scales with the
    // batch + the open rows, never with history: history is touched only
    // by the is_current partition filter, which at 100 TB is the
    // partition-pruned current slice of the dimension table.
    "q_scd2_incremental" -> ((s, d) => {
      val cutoff = lit("2024-01-21 00:00:00").cast("timestamp")
      val ev = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .transform(graft.CacheScope.persisted(_))
      val baseScd = scd2Of(ev.filter(col("ts") < cutoff))
        .transform(graft.CacheScope.persisted(_))
      val open = baseScd.filter(col("is_current") === 1)
        .select(col("user_id"), col("event_type").as("open_type"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val dch = ev.filter(col("ts") >= cutoff)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
          lag(col("event_type"), 1).over(w).as("prevd"))
        .join(open, Seq("user_id"), "left")
        .withColumn("prev", coalesce(col("prevd"), col("open_type")))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      val w2 = Window.partitionBy(col("user_id"))
        .orderBy(col("valid_from").asc, col("event_id").asc)
      val newIv = dch
        .select(col("user_id"), col("event_type"),
          col("ts").as("valid_from"), col("event_id"))
        .withColumn("valid_to", lead(col("valid_from"), 1).over(w2))
        .select(col("user_id"), col("event_type"), col("valid_from"),
          col("valid_to"),
          when(col("valid_to").isNull, 1L).otherwise(0L).as("is_current"))
        .transform(graft.CacheScope.persisted(_))
      val firstNew = newIv.groupBy("user_id")
        .agg(min(col("valid_from")).as("first_from"))
      val closedOpen = baseScd.filter(col("is_current") === 1)
        .join(firstNew, Seq("user_id"), "left")
        .select(col("user_id"), col("event_type"), col("valid_from"),
          col("first_from").as("valid_to"),
          when(col("first_from").isNull, 1L).otherwise(0L).as("is_current"))
      baseScd.filter(col("is_current") === 0)
        .unionByName(closedOpen)
        .unionByName(newIv)
    })
  )

  /** SCD2 interval assembly over any (user_id, ts, event_id, event_type)
    * slice — the q_scd2_intervals body, factored so the incremental fold
    * builds its base dimension through the identical code path.
    */
  private[graft] def scd2Of(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    ev
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev"))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      .select(col("user_id"), col("event_type"),
        col("ts").as("valid_from"), col("event_id"),
        lead(col("ts"), 1).over(w).as("valid_to"))
      .select(col("user_id"), col("event_type"), col("valid_from"),
        col("valid_to"),
        when(col("valid_to").isNull, 1L).otherwise(0L).as("is_current"))
  }

  /** The full-rebuild SCD2 oracle — ALSO the q_scd2_incremental oracle:
    * the incremental fold must hash-equal the from-scratch rebuild.
    */
  private val Scd2RebuildSql =
    """WITH c AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         lag(event_type) OVER (PARTITION BY user_id
      |                               ORDER BY ts ASC, event_id ASC) AS prev
      |  FROM events
      |), ch AS (
      |  SELECT user_id, event_type, ts AS valid_from, event_id
      |  FROM c WHERE prev IS NULL OR prev <> event_type
      |)
      |SELECT user_id, event_type, valid_from,
      |       lead(valid_from) OVER (PARTITION BY user_id
      |                              ORDER BY valid_from ASC, event_id ASC) AS valid_to,
      |       CAST(CASE WHEN lead(valid_from) OVER (PARTITION BY user_id
      |                    ORDER BY valid_from ASC, event_id ASC) IS NULL
      |            THEN 1 ELSE 0 END AS BIGINT) AS is_current
      |FROM ch""".stripMargin

  override val oracles: Map[String, String] = Map(
    "q_scd2_intervals" -> Scd2RebuildSql,

    "q_scd2_incremental" -> Scd2RebuildSql,

    "q_window_rownum" ->
      """SELECT user_id, event_id, event_type, rn FROM (
        |  SELECT user_id, event_id, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn
        |  FROM events
        |) WHERE rn <= 3""".stripMargin,

    "q_window_rank" ->
      """SELECT event_type, event_id, value, rnk, drnk FROM (
        |  SELECT event_type, event_id, value,
        |         rank() OVER (PARTITION BY event_type ORDER BY value DESC) AS rnk,
        |         dense_rank() OVER (PARTITION BY event_type ORDER BY value DESC) AS drnk
        |  FROM events
        |) WHERE rnk <= 5""".stripMargin,

    "q_window_lag" ->
      """SELECT user_id, event_id, value,
        |       lag(value, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_value,
        |       lead(value, 1) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS next_value
        |FROM events""".stripMargin,

    "q_window_running" ->
      """SELECT user_id, event_id,
        |       CAST(sum(CAST(value AS DECIMAL(18,4)))
        |            OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value,
        |       count(*) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_n
        |FROM events""".stripMargin,

    "q_window_ntile" ->
      """SELECT user_id, event_id, value,
        |       CAST(ntile(4) OVER (PARTITION BY user_id
        |                           ORDER BY value ASC, event_id ASC) AS INT)
        |         AS quartile
        |FROM events""".stripMargin,

    "q_asof_join" ->
      """SELECT event_id, user_id, ts, last_view_ts,
        |       epoch_us(ts) - epoch_us(last_view_ts) AS gap_us
        |FROM (
        |  SELECT event_id, user_id, ts, event_type,
        |         last_value(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
        |           OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_ts
        |  FROM events
        |) WHERE event_type = 'purchase'""".stripMargin,

    // Correlated scalar-max formulation — independent of both the window
    // trick and the merge algorithm.
    "q_asof_join_native" ->
      """SELECT event_id, user_id, ts, last_view_ts,
        |       epoch_us(ts) - epoch_us(last_view_ts) AS gap_us
        |FROM (
        |  SELECT p.event_id, p.user_id, p.ts,
        |         (SELECT max(v.ts) FROM events v
        |          WHERE v.event_type = 'view' AND v.user_id = p.user_id
        |            AND v.ts <= p.ts) AS last_view_ts
        |  FROM events p WHERE p.event_type = 'purchase'
        |)""".stripMargin,

    "q_asof_join_tolerance" ->
      """SELECT event_id, user_id, ts, last_view_ts,
        |       epoch_us(ts) - epoch_us(last_view_ts) AS gap_us
        |FROM (
        |  SELECT p.event_id, p.user_id, p.ts,
        |         (SELECT max(v.ts) FROM events v
        |          WHERE v.event_type = 'view' AND v.user_id = p.user_id
        |            AND v.ts <= p.ts AND v.ts >= p.ts - INTERVAL 1 HOUR) AS last_view_ts
        |  FROM events p WHERE p.event_type = 'purchase'
        |)""".stripMargin,

    "q_window_dist" ->
      """SELECT o_orderpriority, o_orderkey,
        |       ntile(4) OVER w AS quartile,
        |       round(percent_rank() OVER w, 6) AS pct_rank,
        |       round(cume_dist() OVER w, 6) AS cdist
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY o_totalprice DESC, o_orderkey ASC)""".stripMargin,

    "q_window_range_frame" ->
      """WITH e AS (SELECT *, epoch_us(ts) AS us FROM events)
        |SELECT user_id, event_id,
        |       count(*) OVER w AS n_24h,
        |       CAST(sum(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS val_24h
        |FROM e
        |WINDOW w AS (PARTITION BY user_id ORDER BY us
        |             RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)""".stripMargin,

    "q_window_nth" ->
      """SELECT user_id, event_id,
        |       first_value(event_type) OVER w AS first_type,
        |       nth_value(event_type, 3) OVER w AS third_type,
        |       last_value(event_type) OVER w AS last_type
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"""
        .stripMargin,

    "q_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders
        |) WHERE rn <= 3""".stripMargin
  )
}
