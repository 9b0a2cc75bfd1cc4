package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}
import graft.relational.Det._

/** Event-analytics surface over the events stream: funnel, retention,
  * sessionization, streaks, multi-touch attribution, A/B z-test,
  * association rules, Markov transition dynamics, and the time-series
  * resample/smooth/flag family (OHLC, gap-fill LOCF, EWMA, z-score).
  * Every heavy relation is user- or type-keyed — no unpartitioned window
  * or data-by-data cross join anywhere in the pack.
  */
object EventOpsQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Minimum pair support (co-purchase order count) for q_assoc_rules. */
  val AssocMinSup = 3L

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Association rules (market-basket) over order baskets: for every
    // DIRECTED part pair (a -> b) co-purchased in >= AssocMinSup orders,
    // support, confidence sup(a,b)/sup(a), and lift n·sup(a,b)/(sup(a)·
    // sup(b)) — the A-priori 2-itemset pass, the classic retail
    // cross-sell primitive. Scale shape: baskets collapse to per-order
    // part SETS (collect_set bounds state at <= 7 keys), pairs explode
    // order-locally (<= 42 per order — never a self-join of the
    // lineitem relation), and the support filter prunes BEFORE the
    // singleton-support joins; the n_orders scalar rides a broadcast
    // 1-row aggregate. Exact integers until the two final divisions.
    "q_assoc_rules" -> ((s, d) => {
      val baskets = t(s, d, "lineitem")
        .groupBy(col("l_orderkey")).agg(collect_set(col("l_partkey")).as("pks"))
        .transform(graft.CacheScope.persisted(_))
      val pairSup = baskets
        .select(explode(col("pks")).as("a"), col("pks"))
        .select(col("a"), explode(array_remove(col("pks"), col("a"))).as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("sup_ab"))
        .filter(col("sup_ab") >= AssocMinSup)
      val singleSup = baskets
        .select(explode(col("pks")).as("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("sup"))
      val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
      pairSup
        .join(singleSup.select(col("pk").as("a"), col("sup").as("sup_a")), "a")
        .join(singleSup.select(col("pk").as("b"), col("sup").as("sup_b")), "b")
        .crossJoin(broadcast(nOrders))
        .select(col("a").as("antecedent"), col("b").as("consequent"),
          col("sup_ab"),
          round(col("sup_ab").cast("double") / col("sup_a").cast("double"), 6)
            .as("confidence"),
          round((col("n_orders") * col("sup_ab")).cast("double") /
            (col("sup_a") * col("sup_b")).cast("double"), 6).as("lift"))
    }),

    // Multi-step funnel with LAST-TOUCH attribution: for each purchase,
    // the latest prior click within 24 hours; for that click, the
    // latest prior view within 24 hours (the synthetic events are sparse
    // per user - ~2 per type per day - so a 30-minute funnel is empty) — the 3-step conversion chain.
    // Each step is a user-keyed equi-join with a time-interval residual
    // (the stream-stream-join shape; per-user event counts bound the
    // pair fan-out) followed by ONE max(struct(ts, id, ...)) aggregation
    // per attributed event — argmax without a window, deterministic ties
    // by id. The oracle takes the same argmax as row_number() DESC = 1.
    "q_events_funnel" -> ((s, d) => {
      // one events scan feeds all three type slices
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        .transform(graft.CacheScope.persisted(_))
      def slice(tpe: String, id: String, ts: String, u: String) =
        ev.filter(col("event_type") === tpe)
          .select(col("user_id").as(u), col("event_id").as(id), col("ts").as(ts))
      val v = slice("view", "view_id", "view_ts", "vu")
      val c = slice("click", "click_id", "click_ts", "cu")
      val p = slice("purchase", "buy_id", "buy_ts", "pu")
      val vc = c
        .join(v, col("cu") === col("vu") &&
          col("view_ts") <= col("click_ts") &&
          col("click_ts") <= col("view_ts") + expr("INTERVAL 24 HOURS"))
        .groupBy(col("cu"), col("click_id"), col("click_ts"))
        .agg(max(struct(col("view_ts"), col("view_id"))).as("mv"))
        .select(col("cu"), col("click_id"), col("click_ts"),
          col("mv.view_id").as("view_id"), col("mv.view_ts").as("view_ts"))
      p
        .join(vc, col("pu") === col("cu") &&
          col("click_ts") <= col("buy_ts") &&
          col("buy_ts") <= col("click_ts") + expr("INTERVAL 24 HOURS"))
        .groupBy(col("pu").as("user_id"), col("buy_id"), col("buy_ts"))
        .agg(max(struct(col("click_ts"), col("click_id"),
          col("view_ts"), col("view_id"))).as("mc"))
        .select(col("user_id"), col("mc.view_id").as("view_id"),
          col("mc.click_id").as("click_id"), col("buy_id"),
          col("mc.view_ts").as("view_ts"), col("mc.click_ts").as("click_ts"),
          col("buy_ts"))
    }),



    // DAU / WAU / MAU / stickiness per day — the product-analytics
    // rolling-distinct-users readout. A windowed COUNT DISTINCT cannot
    // ride a plain window frame at scale (per-frame distinct state is
    // unbounded); the standard shape is CONTRIBUTION EXPLOSION: each
    // (user, active-day) row contributes to the ≤MauWindow report days
    // it keeps the user "active" for, and one groupBy(report_day) with
    // three conditional count-distincts does the rest — a bounded ×28
    // fan-out on the deduplicated daily-actives relation (users × days,
    // a sliver of the event log), never on raw events. Edge days with a
    // partial lookback are flagged, not silently reported.
    "q_events_stickiness" -> ((s, d) => {
      val du = t(s, d, "events")
        .select(col("user_id"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .distinct()
        .transform(graft.CacheScope.persisted(_))
      val rng = du.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      val c = du
        .select(col("user_id"), col("day"),
          explode(expr(s"sequence(0, ${MauWindow - 1})")).as("j"))
        .select(col("user_id"), col("j"),
          date_add(col("day"), col("j")).as("rday"))
      c.crossJoin(broadcast(rng))
        .filter(col("rday") <= col("d1"))
        .groupBy(col("rday").as("day"))
        .agg(countDistinct(when(col("j") === 0, col("user_id"))).as("dau"),
          countDistinct(when(col("j") < WauWindow, col("user_id"))).as("wau"),
          countDistinct(col("user_id")).as("mau"),
          first(col("d0")).as("d0"))
        .select(col("day"), col("dau"), col("wau"), col("mau"),
          round(col("wau").cast("double") / col("mau").cast("double"), 6)
            .as("stickiness"),
          (datediff(col("day"), col("d0")) >= MauWindow - 1).as("full_window"))
    }),


    // Time-series resampling to OHLC bars: per (event_type, day) —
    // open/close via min/max(struct(ts, event_id, value)) argmin/argmax
    // (ties broken by event_id inside the struct order, no window, ONE
    // aggregation), high/low as plain min/max, volume as the exact
    // decimal sum. The finance-bars shape, but it is really "first/last
    // value per resample bucket" — the general downsampling primitive.
    // The oracle takes open/close through row_number windows instead —
    // an independent formulation of the same argmin/argmax.
    "q_ohlc_bars" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(
          min(struct(col("ts"), col("event_id"), col("value"))).as("o"),
          max(struct(col("ts"), col("event_id"), col("value"))).as("c"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          dsum(col("value"), 4).as("volume"),
          count(lit(1)).as("n_events"))
        .select(col("event_type"), col("day"),
          col("o.value").as("open"), col("high"), col("low"),
          col("c.value").as("close"), col("volume"), col("n_events"))),

    // Gap-fill + LOCF (last observation carried forward): the dense
    // hourly series per event_type, missing hours synthesized and filled
    // with the previous hour's total. The per-group hour range comes
    // from ONE tiny min/max agg; sequence+explode generates exactly the
    // missing slots (never a calendar cross join); the carry-forward is
    // last(value, ignoreNulls) over a type-partitioned window. Dense
    // output = |types| x |hours| rows at any scale — resampling cost is
    // output-bounded, not input-bounded.
    "q_gapfill_locf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hours = t(s, d, "events")
        .filter(col("event_type").isin("purchase", "signup"))
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hour"))
        .agg(dsum(col("value"), 4).as("total"))
      val dense = hours.groupBy("event_type")
        .agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"),
            expr("INTERVAL 1 HOUR"))).as("hour"))
      val w = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dense.join(hours, Seq("event_type", "hour"), "left")
        .select(col("event_type"), col("hour").cast("timestamp").as("hour"),
          col("total"),
          last(col("total"), ignoreNulls = true).over(w).as("filled"),
          when(col("total").isNull, 1L).otherwise(0L).as("was_gap"))
    }),

    // Weekly cohort retention: users grouped by their FIRST active week;
    // each (cohort_week, week_offset) cell counts how many of that
    // cohort were active that many weeks later — the standard
    // growth-analytics retention triangle. One (user, week) distinct
    // relation feeds both the cohort assignment and the activity matrix;
    // the join and both aggregations key on user_id (co-partitioned),
    // and the output is a constant |weeks|^2/2 cells at any corpus size.
    // date_trunc('week') is Monday-aligned in both engines, so the
    // day-difference divides by 7 exactly.
    "q_events_retention" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("week"))
        .distinct()
        .transform(graft.CacheScope.persisted(_))
      val cohort = ev.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
      ev.join(cohort, "user_id")
        .select(col("cohort_week"),
          expr("datediff(week, cohort_week) div 7").cast("long").as("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("n_users"))
    }),

    // Cohort lifetime-value curve — q_events_retention's revenue twin:
    // for each first-seen-week cohort, the cumulative average purchase
    // value per cohort user at each week of age. The "is newer traffic
    // monetizing like the old" readout every mixing/acquisition decision
    // reads next to retention counts. Scale shape: cohorts and weekly
    // spend are events-sized aggregations to the bounded (cohort × age)
    // relation; the cumulative sum runs as a triangular join over THAT
    // bounded relation (calendar-bounded at any corpus size) — never a
    // window over raw events. Spend is exact integer cents until the
    // single per-user division.
    "q_events_ltv" -> ((s, d) => {
      val ev = t(s, d, "events").transform(graft.CacheScope.persisted(_))
      val weeks = ev.select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("week"))
        .distinct()
        .transform(graft.CacheScope.persisted(_))
      val cohort = weeks.groupBy("user_id")
        .agg(min(col("week")).as("cohort_week"))
        .transform(graft.CacheScope.persisted(_))
      val sizes = cohort.groupBy("cohort_week")
        .agg(count(lit(1)).as("cohort_users"))
      val offsets = weeks.join(cohort, "user_id")
        .select(col("cohort_week"),
          expr("datediff(week, cohort_week) div 7").cast("long")
            .as("week_offset"))
        .distinct()
      val spend = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("week"),
          (col("value").cast(DecimalType(12, 2)) * 100).cast("long").as("cents"))
        .join(cohort, "user_id")
        .select(col("cohort_week"),
          expr("datediff(week, cohort_week) div 7").cast("long")
            .as("week_offset"), col("cents"))
        .groupBy("cohort_week", "week_offset")
        .agg(sum(col("cents")).as("sp"))
      val cum = offsets.as("o")
        .join(spend.as("s"),
          col("s.cohort_week") === col("o.cohort_week") &&
            col("s.week_offset") <= col("o.week_offset"), "left")
        .groupBy(col("o.cohort_week").as("cohort_week"),
          col("o.week_offset").as("week_offset"))
        .agg(coalesce(sum(col("s.sp")), lit(0L)).as("cum_cents"))
      cum.join(sizes, "cohort_week")
        .select(col("cohort_week"), col("week_offset"), col("cohort_users"),
          col("cum_cents"),
          round(col("cum_cents").cast("double") /
            col("cohort_users").cast("double") / 100.0, 4).as("ltv"))
    }),

    // Bounded-lag EWMA smoothing of the per-type daily value series —
    // the monitoring/trend primitive OHLC bars feed. The classic
    // recursive EWMA is inherently sequential (and its closed form
    // (1-a)^(-i) prefix trick overflows doubles past ~150 steps), so
    // this is the standard K-tap FIR approximation: 8 lags with weights
    // (1-a)^j, re-normalized over the lags that exist at the series
    // head. Weight j decays to (0.8)^7 ~ 0.21 of the current sample;
    // the dropped tail is < 17% of total mass — a dial, not a truth.
    // Determinism: daily totals are exact decimal sums, the weights are
    // round(,9)-pinned decimals, so numerator and denominator are exact
    // decimal dot products and the single final division is identical
    // IEEE. Scale shape: one events-sized aggregation, then a WINDOW
    // over the BOUNDED daily relation (|types| x |days|), partitioned by
    // type — never an unpartitioned window, never a self-join.
    "q_ts_ewma" -> ((s, d) => {
      // weights pinned at scale 6, NOT 9: (18,4)-totals x (18,6)-weights
      // gives num scale 10, whose scaled integer (~3e13) stays under
      // 2^53 — the decimal->double cast is exact in both engines. At
      // scale 9 the num integer (~3e16) is past 2^53 and the lossy casts
      // diverge per engine; downscaling first doesn't help either,
      // because Spark rounds HALF_UP on decimal downscale while DuckDB
      // TRUNCATES (both measured as 1-digit ewma drift).
      val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
      // the widened sum type (38,4) must come back down to (18,4) before
      // the weight products: (38,4) x (18,9) exceeds decimal-128 and
      // forces engine-SPECIFIC precision loss (measured: 1-ulp ewma
      // drift); (18,4) x (18,9) = (37,13) stays exact in both engines.
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(sum(col("value").cast(
          org.apache.spark.sql.types.DecimalType(18, 4))).as("total0"))
        .select(col("event_type"), col("day"),
          col("total0").cast(
            org.apache.spark.sql.types.DecimalType(18, 4)).as("total"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day")
      val weights = (0 until EwmaTaps).map(j =>
        BigDecimal(math.pow(1.0 - EwmaAlpha, j))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
      // each product comes down from its inferred (37,10) to an exact
      // (28,10) BEFORE the 8-term addition chain: Spark grows addition
      // precision by 1 per step and, past 38, allowPrecisionLoss shaves
      // the SCALE (measured: num silently rounded to 6 decimals, a
      // 1e-10-relative quotient drift vs the oracle's exact scale-10
      // sum). At (28,10) the chain peaks at (35,10) — exact end-to-end.
      val dec2810 = org.apache.spark.sql.types.DecimalType(28, 10)
      val num = weights.zipWithIndex.map { case (wj, j) =>
        (coalesce(lag(col("total"), j).over(w),
          lit(BigDecimal(0)).cast(org.apache.spark.sql.types.DecimalType(18, 4))) *
          lit(wj).cast(dec6)).cast(dec2810)
      }.reduce(_ + _)
      val den = weights.zipWithIndex.map { case (wj, j) =>
        when(lag(col("total"), j).over(w).isNotNull, lit(wj).cast(dec6))
          .otherwise(lit(BigDecimal(0)).cast(dec6))
      }.reduce(_ + _)
      daily.select(col("event_type"), col("day"),
        col("total").cast("double").as("total"),
        round(num.cast("double") / den.cast("double"), 6).as("ewma"))
    }),

    // Per-type 3-sigma anomaly flagging from exact integer-like moments:
    // population mean/variance via decimal sums kept EXACT through
    // var_num = n*ssq - sx^2, so the only float steps are two divisions
    // and one sqrt on identical operands in both engines — z-scores are
    // bit-identical, and the |z| >= 3 gate cannot flip on summation
    // order. Scale shape: one events aggregation to |types| rows of
    // moments, broadcast back into a narrow filter scan — the same
    // two-pass profile a streaming detector would maintain as running
    // state. (n^2 as int64 caps n at ~3e9 per type; past that, lift the
    // moments to DECIMAL(38) — the dial is explicit, and ANSI mode
    // makes the overflow loud, never silent.)
    "q_ts_zscore" -> ((s, d) => {
      val x = col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2))
      val ev = t(s, d, "events")
        .select(col("event_id"), col("event_type"), x.as("x"))
      val st = ev.groupBy("event_type")
        .agg(sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
          count(lit(1)).as("n"))
      val dev = (col("x") * col("n") - col("sx")).cast("double")
      val varD = (col("sxx") * col("n") - col("sx") * col("sx")).cast("double") /
        (col("n") * col("n")).cast("double")
      val z = round(dev / (col("n").cast("double") * sqrt(varD)), 6)
      ev.join(broadcast(st), "event_type")
        .select(col("event_id"), col("event_type"),
          col("x").cast("double").as("value"), z.as("z"))
        .filter(abs(col("z")) >= 3.0)
    }),

    // BATCH sessionization ([[sessionizeBatchOf]]) — the offline twin of
    // stream_session/stream_sessionize_custom: gap-based session ids via
    // the classic lag-flag + running-sum window pair (both user-keyed,
    // never a global sort), then per-session stats in one aggregation.
    // Micro-second integer arithmetic end to end, so the gap predicate
    // and durations are exact in both engines.
    "q_events_sessionize" -> ((s, d) => sessionizeBatchOf(t(s, d, "events"))),

    // Gaps-and-islands: each user's LONGEST run of consecutive active
    // days (the engagement-streak metric), via the classic day − rank
    // grouping key — consecutive days share a constant difference, so
    // the islands fall out of one user-partitioned row_number and a
    // per-(user, island) aggregate; the longest-streak argmax is
    // max(struct) with earliest-start tiebreak, no second window. The
    // q_events_sessionize sibling at day grain: that one cuts on TIME
    // gaps inside a day, this one on calendar holes across days.
    "q_events_streaks" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("day")
      val days = t(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val grp = days
        .withColumn("grp", expr("date_sub(day, row_number() OVER " +
          "(PARTITION BY user_id ORDER BY day))"))
      val islands = grp.groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"), min(col("day")).as("start"))
      islands.groupBy(col("user_id"))
        .agg(sum(col("len")).as("n_active_days"),
          count(lit(1)).as("n_streaks"),
          max(struct(col("len"),
            (-datediff(col("start"), to_date(lit("1970-01-01")))).as("negs")))
            .as("m"))
        .select(col("user_id"), col("n_active_days"), col("n_streaks"),
          col("m.len").as("longest_streak"),
          date_add(to_date(lit("1970-01-01")), -col("m.negs")).as("streak_start"))
    }),

    // U-shaped multi-touch attribution ([[attributionOf]]): every click in
    // the 72h lookback of a purchase gets fractional credit — 40/40 to the
    // first and last touch, the middle 20% split evenly (1.0 and 0.5/0.5
    // for 1- and 2-touch paths). The funnel query answers "which single
    // click converted"; this one distributes the conversion over the whole
    // path — the marketing-credit primitive.
    "q_events_attribution" -> ((s, d) => attributionOf(t(s, d, "events"))),

    // Two-sample (Welch) z-test on mean purchase value with a
    // deterministic 50/50 user split (user_id parity — the hash-keyed
    // assignment a real experiment framework uses, never rand()): exact
    // DECIMAL moment sums per variant in ONE aggregation (the q_ts_zscore
    // discipline — a float mean/variance could never hash-match), pivoted
    // to one row, then the z statistic as the same IEEE double tree in
    // both engines. (A conversion-RATE test is degenerate on this corpus —
    // every synthetic user purchases — so the value metric is also the
    // statistically interesting one.)
    "q_events_abtest" -> ((s, d) => {
      val x = col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2))
      val st = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(pmod(col("user_id"), lit(2)).as("variant"), x.as("x"))
        .groupBy("variant")
        .agg(sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
          count(lit(1)).as("n"))
      def side(v: Int, c: String) = max(when(col("variant") === v, col(c)))
      val w = st.agg(
        side(0, "n").as("n0"), side(0, "sx").as("sx0"), side(0, "sxx").as("sxx0"),
        side(1, "n").as("n1"), side(1, "sx").as("sx1"), side(1, "sxx").as("sxx1"))
      def mean(i: Int) =
        col(s"sx$i").cast("double") / col(s"n$i").cast("double")
      def variance(i: Int) =
        (col(s"sxx$i") * col(s"n$i") - col(s"sx$i") * col(s"sx$i")).cast("double") /
          (col(s"n$i") * col(s"n$i")).cast("double")
      w.select(col("n0"), col("n1"),
        round(mean(0), 6).as("mean0"), round(mean(1), 6).as("mean1"),
        round((mean(0) - mean(1)) /
          sqrt(variance(0) / col("n0").cast("double") +
            variance(1) / col("n1").cast("double")), 6).as("z"))
    }),
  )

  /** Attribution lookback window (hours before the purchase). */
  val AttrWindowHours = 72

  /** Session gap: a pause longer than this starts a new session. */
  val SessionGapMinutes = 30

  /** Gap-based batch sessionization over any events relation — public so
    * specs can plant gap patterns. Both windows are user-partitioned with
    * the same (ts, event_id) total order; the running sum of new-session
    * flags IS the per-user session index (no distinct/join), and the
    * session roll-up is one aggregation on (user, session_idx).
    */
  def sessionizeBatchOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val gapUs = SessionGapMinutes.toLong * 60L * 1000000L
    val flagged = events
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("new_sess",
        when(lag(col("ts"), 1).over(w).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) >
            gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("session_start"), col("session_end"),
        (unix_micros(col("session_end")) - unix_micros(col("session_start")))
          .as("duration_us"))
  }

  /** U-shaped attribution over any events relation — public so specs can
    * plant paths with known credits. Scale shape: the touch relation is a
    * user-keyed equi-join with a time residual (the stream-stream-join
    * shape, fan-out bounded by per-user click density x the window), the
    * per-purchase stats are ONE count/min/max aggregation (no window
    * function), and first/last flags come from struct equality against
    * the argmin/argmax — deterministic ties by event id.
    */
  def attributionOf(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .transform(graft.CacheScope.persisted(_))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val touches = p.join(c, col("pu") === col("cu") &&
        col("click_ts") <= col("buy_ts") &&
        col("buy_ts") <= col("click_ts") +
          expr(s"INTERVAL $AttrWindowHours HOURS"))
      .select(col("pu").as("user_id"), col("buy_id"), col("click_id"),
        col("click_ts"))
      .transform(graft.CacheScope.persisted(_))
    val st = touches.groupBy("buy_id")
      .agg(count(lit(1)).as("n"),
        min(struct(col("click_ts"), col("click_id"))).as("f"),
        max(struct(col("click_ts"), col("click_id"))).as("l"))
    val cur = struct(col("click_ts"), col("click_id"))
    touches.join(st, Seq("buy_id"))
      .select(col("user_id"), col("buy_id"), col("click_id"),
        when(col("n") === 1, "only")
          .when(cur === col("f"), "first")
          .when(cur === col("l"), "last")
          .otherwise("mid").as("pos"),
        when(col("n") === 1, lit(1.0))
          .when(col("n") === 2, lit(0.5))
          .when(cur === col("f") || cur === col("l"), lit(0.4))
          .otherwise(round(lit(0.2) / (col("n") - 2).cast("double"), 6))
          .as("credit"))
  }

  /** EWMA smoothing factor and FIR tap count (see q_ts_ewma). */
  val EwmaAlpha = 0.2
  val EwmaTaps = 8


  /** Rolling-active windows (days) for q_events_stickiness. */
  val WauWindow = 7
  val MauWindow = 28

  override val oracles: Map[String, String] = Map(

    // Distinct-pair self-join formulation — deliberately different from
    // the Spark side's basket-local explode.
    "q_assoc_rules" ->
      s"""WITH li AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         |), ps AS (
         |  SELECT a.pk AS a, b.pk AS b, count(*) AS sup_ab
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
         |  GROUP BY 1, 2 HAVING count(*) >= $AssocMinSup
         |), ss AS (
         |  SELECT pk, count(*) AS sup FROM li GROUP BY pk
         |), n AS (
         |  SELECT count(DISTINCT ok) AS n_orders FROM li
         |)
         |SELECT p.a AS antecedent, p.b AS consequent, p.sup_ab,
         |       round(CAST(p.sup_ab AS DOUBLE) / CAST(sa.sup AS DOUBLE), 6) AS confidence,
         |       round(CAST(n.n_orders * p.sup_ab AS DOUBLE) /
         |             CAST(sa.sup * sb.sup AS DOUBLE), 6) AS lift
         |FROM ps p
         |JOIN ss sa ON sa.pk = p.a
         |JOIN ss sb ON sb.pk = p.b
         |CROSS JOIN n""".stripMargin,

    "q_events_funnel" ->
      """WITH v AS (
        |  SELECT user_id, event_id AS view_id, ts AS view_ts
        |  FROM events WHERE event_type = 'view'
        |), c AS (
        |  SELECT user_id, event_id AS click_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, event_id AS buy_id, ts AS buy_ts
        |  FROM events WHERE event_type = 'purchase'
        |), vc AS (
        |  SELECT user_id, click_id, click_ts, view_id, view_ts FROM (
        |    SELECT c.user_id, c.click_id, c.click_ts, v.view_id, v.view_ts,
        |           row_number() OVER (PARTITION BY c.click_id
        |             ORDER BY v.view_ts DESC, v.view_id DESC) AS rn
        |    FROM c JOIN v ON v.user_id = c.user_id
        |      AND v.view_ts <= c.click_ts
        |      AND c.click_ts <= v.view_ts + INTERVAL 24 HOUR
        |  ) WHERE rn = 1
        |)
        |SELECT user_id, view_id, click_id, buy_id, view_ts, click_ts, buy_ts
        |FROM (
        |  SELECT p.user_id, vc.view_id, vc.click_id, p.buy_id,
        |         vc.view_ts, vc.click_ts, p.buy_ts,
        |         row_number() OVER (PARTITION BY p.buy_id
        |           ORDER BY vc.click_ts DESC, vc.click_id DESC) AS rn
        |  FROM p JOIN vc ON vc.user_id = p.user_id
        |    AND vc.click_ts <= p.buy_ts
        |    AND p.buy_ts <= vc.click_ts + INTERVAL 24 HOUR
        |) WHERE rn = 1""".stripMargin,

    "q_events_retention" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        |  FROM events
        |), c AS (
        |  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
        |)
        |SELECT c.cohort_week,
        |       CAST((ev.week - c.cohort_week) // 7 AS BIGINT) AS week_offset,
        |       count(*) AS n_users
        |FROM ev JOIN c ON c.user_id = ev.user_id
        |GROUP BY 1, 2""".stripMargin,

    "q_events_ltv" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        |  FROM events
        |), c AS (
        |  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
        |), sizes AS (
        |  SELECT cohort_week, count(*) AS cohort_users FROM c GROUP BY 1
        |), offs AS (
        |  SELECT DISTINCT c.cohort_week,
        |         CAST((ev.week - c.cohort_week) // 7 AS BIGINT) AS week_offset
        |  FROM ev JOIN c ON c.user_id = ev.user_id
        |), spend AS (
        |  SELECT c.cohort_week,
        |         CAST((CAST(date_trunc('week', e.ts) AS DATE) - c.cohort_week) // 7 AS BIGINT) AS week_offset,
        |         CAST(sum(CAST(CAST(e.value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS sp
        |  FROM events e JOIN c ON c.user_id = e.user_id
        |  WHERE e.event_type = 'purchase'
        |  GROUP BY 1, 2
        |), cum AS (
        |  SELECT o.cohort_week, o.week_offset,
        |         COALESCE(CAST(sum(s.sp) AS BIGINT), 0) AS cum_cents
        |  FROM offs o
        |  LEFT JOIN spend s ON s.cohort_week = o.cohort_week
        |                   AND s.week_offset <= o.week_offset
        |  GROUP BY 1, 2
        |)
        |SELECT m.cohort_week, m.week_offset, z.cohort_users, m.cum_cents,
        |       round(CAST(m.cum_cents AS DOUBLE) /
        |             CAST(z.cohort_users AS DOUBLE) / 100.0, 4) AS ltv
        |FROM cum m JOIN sizes z ON z.cohort_week = m.cohort_week""".stripMargin,

    "q_ts_ewma" -> {
      val weights = (0 until EwmaTaps).map(j =>
        BigDecimal(math.pow(1.0 - EwmaAlpha, j))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
      val num = weights.zipWithIndex.map { case (wj, j) =>
        s"COALESCE(lag(total, $j) OVER w, CAST(0 AS DECIMAL(18,4))) * CAST('$wj' AS DECIMAL(18,6))"
      }.mkString(" +\n         ")
      val den = weights.zipWithIndex.map { case (wj, j) =>
        s"CASE WHEN lag(total, $j) OVER w IS NOT NULL THEN CAST('$wj' AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END"
      }.mkString(" +\n         ")
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS total
         |  FROM events GROUP BY 1, 2
         |)
         |SELECT event_type, day, CAST(total AS DOUBLE) AS total,
         |       round(CAST($num AS DOUBLE) /
         |             CAST($den AS DOUBLE), 6) AS ewma
         |FROM daily
         |WINDOW w AS (PARTITION BY event_type ORDER BY day)""".stripMargin
    },

    "q_ts_zscore" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, CAST(value AS DECIMAL(12,2)) AS x
        |  FROM events
        |), st AS (
        |  SELECT event_type, sum(x) AS sx, sum(x * x) AS sxx, count(*) AS n
        |  FROM ev GROUP BY 1
        |)
        |SELECT * FROM (
        |  SELECT e.event_id, e.event_type, CAST(e.x AS DOUBLE) AS value,
        |         round(CAST(e.x * s.n - s.sx AS DOUBLE) /
        |               (CAST(s.n AS DOUBLE) *
        |                sqrt(CAST(s.sxx * s.n - s.sx * s.sx AS DOUBLE) /
        |                     CAST(s.n * s.n AS DOUBLE))), 6) AS z
        |  FROM ev e JOIN st s USING (event_type)
        |) WHERE abs(z) >= 3""".stripMargin,

    "q_events_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), grp AS (
        |  SELECT user_id, day,
        |         day - CAST(row_number() OVER (PARTITION BY user_id
        |                                       ORDER BY day) AS INT) AS grp
        |  FROM days
        |), islands AS (
        |  SELECT user_id, grp, count(*) AS len, min(day) AS start
        |  FROM grp GROUP BY 1, 2
        |)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |       count(*) AS n_streaks,
        |       -- composite scalar key: len dominates, earlier start wins ties
        |       -- (epoch day < 1e6 at any plausible horizon)
        |       CAST(max_by(len, len * 1000000 - (start - DATE '1970-01-01'))
        |            AS BIGINT) AS longest_streak,
        |       max_by(start, len * 1000000 - (start - DATE '1970-01-01'))
        |         AS streak_start
        |FROM islands GROUP BY user_id""".stripMargin,

    "q_events_sessionize" -> {
      val gapUs = SessionGapMinutes.toLong * 60L * 1000000L
      s"""WITH f AS (
         |  SELECT user_id, event_id, ts,
         |         CASE WHEN lag(ts) OVER w IS NULL
         |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $gapUs
         |              THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
         |), g AS (
         |  SELECT user_id, ts,
         |         sum(new_sess) OVER (PARTITION BY user_id
         |                             ORDER BY ts ASC, event_id ASC
         |                             ROWS BETWEEN UNBOUNDED PRECEDING
         |                             AND CURRENT ROW) AS session_idx
         |  FROM f
         |)
         |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         |       count(*) AS n_events,
         |       min(ts) AS session_start, max(ts) AS session_end,
         |       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
         |FROM g GROUP BY 1, 2""".stripMargin
    },

    // Window-function formulation — deliberately different from the Spark
    // side's single count/min/max aggregation (ra=1 <=> argmin struct).
    "q_events_attribution" ->
      s"""WITH t AS (
         |  SELECT p.user_id, p.event_id AS buy_id, p.ts AS buy_ts,
         |         c.event_id AS click_id, c.ts AS click_ts
         |  FROM events p
         |  JOIN events c ON c.user_id = p.user_id
         |   AND p.event_type = 'purchase' AND c.event_type = 'click'
         |   AND c.ts <= p.ts
         |   AND p.ts <= c.ts + INTERVAL $AttrWindowHours HOURS
         |), r AS (
         |  SELECT user_id, buy_id, click_id,
         |         row_number() OVER (PARTITION BY buy_id
         |                            ORDER BY click_ts ASC, click_id ASC) AS ra,
         |         row_number() OVER (PARTITION BY buy_id
         |                            ORDER BY click_ts DESC, click_id DESC) AS rd,
         |         count(*) OVER (PARTITION BY buy_id) AS n
         |  FROM t
         |)
         |SELECT user_id, buy_id, click_id,
         |       CASE WHEN n = 1 THEN 'only' WHEN ra = 1 THEN 'first'
         |            WHEN rd = 1 THEN 'last' ELSE 'mid' END AS pos,
         |       CASE WHEN n = 1 THEN 1.0 WHEN n = 2 THEN 0.5
         |            WHEN ra = 1 OR rd = 1 THEN 0.4
         |            ELSE round(0.2 / CAST(n - 2 AS DOUBLE), 6) END AS credit
         |FROM r""".stripMargin,

    "q_events_abtest" ->
      """WITH s AS (
        |  SELECT user_id % 2 AS variant,
        |         sum(CAST(value AS DECIMAL(12,2))) AS sx,
        |         sum(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS sxx,
        |         count(*) AS n
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1
        |), w AS (
        |  SELECT max(CASE WHEN variant = 0 THEN n END) AS n0,
        |         max(CASE WHEN variant = 0 THEN sx END) AS sx0,
        |         max(CASE WHEN variant = 0 THEN sxx END) AS sxx0,
        |         max(CASE WHEN variant = 1 THEN n END) AS n1,
        |         max(CASE WHEN variant = 1 THEN sx END) AS sx1,
        |         max(CASE WHEN variant = 1 THEN sxx END) AS sxx1
        |  FROM s
        |)
        |SELECT n0, n1,
        |       round(CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS mean0,
        |       round(CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS mean1,
        |       round((CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE) -
        |              CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)) /
        |             sqrt(CAST(sxx0 * n0 - sx0 * sx0 AS DOUBLE) /
        |                  CAST(n0 * n0 AS DOUBLE) / CAST(n0 AS DOUBLE) +
        |                  CAST(sxx1 * n1 - sx1 * sx1 AS DOUBLE) /
        |                  CAST(n1 * n1 AS DOUBLE) / CAST(n1 AS DOUBLE)), 6) AS z
        |FROM w""".stripMargin,

    "q_events_stickiness" ->
      s"""WITH du AS (
         |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
         |  FROM events
         |), rng AS (SELECT min(day) AS d0, max(day) AS d1 FROM du),
         |c AS (
         |  SELECT du.user_id, j.j,
         |         du.day + CAST(j.j AS INTEGER) AS rday
         |  FROM du, (SELECT unnest(generate_series(0, ${MauWindow - 1})) AS j) j
         |)
         |SELECT c.rday AS day,
         |       count(DISTINCT CASE WHEN c.j = 0 THEN c.user_id END) AS dau,
         |       count(DISTINCT CASE WHEN c.j < $WauWindow THEN c.user_id END) AS wau,
         |       count(DISTINCT c.user_id) AS mau,
         |       round(CAST(count(DISTINCT CASE WHEN c.j < $WauWindow
         |                                      THEN c.user_id END) AS DOUBLE) /
         |             CAST(count(DISTINCT c.user_id) AS DOUBLE), 6) AS stickiness,
         |       c.rday - max(rng.d0) >= ${MauWindow - 1} AS full_window
         |FROM c CROSS JOIN rng
         |WHERE c.rday <= rng.d1
         |GROUP BY c.rday""".stripMargin,

    "q_ohlc_bars" ->
      s"""WITH e AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         ts, event_id, value
         |  FROM events
         |), r AS (
         |  SELECT *,
         |         row_number() OVER (PARTITION BY event_type, day
         |                            ORDER BY ts ASC, event_id ASC) AS rn_a,
         |         row_number() OVER (PARTITION BY event_type, day
         |                            ORDER BY ts DESC, event_id DESC) AS rn_d
         |  FROM e
         |), agg AS (
         |  SELECT event_type, day, max(value) AS high, min(value) AS low,
         |         ${dsumSql("value", 4)} AS volume, count(*) AS n_events
         |  FROM e GROUP BY 1, 2
         |)
         |SELECT a.event_type, a.day, o.value AS open, a.high, a.low,
         |       c.value AS close, a.volume, a.n_events
         |FROM agg a
         |JOIN r o ON o.event_type = a.event_type AND o.day = a.day AND o.rn_a = 1
         |JOIN r c ON c.event_type = a.event_type AND c.day = a.day AND c.rn_d = 1""".stripMargin,

    "q_gapfill_locf" ->
      s"""WITH h AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour,
         |         ${dsumSql("value", 4)} AS total
         |  FROM events WHERE event_type IN ('purchase', 'signup')
         |  GROUP BY 1, 2
         |), rng AS (
         |  SELECT event_type, min(hour) AS lo, max(hour) AS hi FROM h GROUP BY 1
         |), dense AS (
         |  SELECT event_type,
         |         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
         |  FROM rng
         |)
         |SELECT d.event_type, CAST(d.hour AS TIMESTAMP) AS hour, h.total,
         |       last_value(h.total IGNORE NULLS)
         |         OVER (PARTITION BY d.event_type ORDER BY d.hour
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
         |       CAST(CASE WHEN h.total IS NULL THEN 1 ELSE 0 END AS BIGINT) AS was_gap
         |FROM dense d
         |LEFT JOIN h ON h.event_type = d.event_type AND h.hour = d.hour""".stripMargin,
  )
}
