package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}

/** Rolling-window robust statistics and behavioral profiling: the Hampel
  * filter (rolling-median outlier detection — the robust alternative to
  * the z-score detectors in TimeSeriesQueries), rolling OLS beta of a
  * series against the aggregate (the streaming-finance exposure
  * estimate), and per-user interarrival-regularity profiling (the
  * rate/regularity signature bot detection runs over an event log).
  *
  * Scale discipline: every window is PARTITIONED (event_type / user) and
  * the two time-series operators run on the bounded per-(type, day)
  * daily relation, so window state is |days| per partition whatever the
  * corpus size. The Hampel decision |x − med|·10⁴ > 44478·MAD and the
  * regularity flags (m·Σg²·10 < 11·S² ⇔ CV² < 0.1) compare EXACT
  * integers/DECIMALs — no float crosses an inequality; doubles appear
  * only in rounded output columns.
  */
object RollingQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Hampel threshold: 3·1.4826 = 4.4478 → compare ×10⁴ in integers. */
  val HampelK4 = 44478L

  /** Rolling-beta trailing window length (days). */
  val BetaWin = 14

  /** GARCH(1,1) dials: alpha (ARCH weight on the last squared return),
    * beta (persistence), omega (base variance, hundreds-of-currency²
    * units), and the FIR truncation depth. With fixed coefficients the
    * variance recursion is linear, so sigma²_t unrolls to omega·Σbʲ +
    * alpha·Σbʲ r²_{t-1-j} — the q_ts_ewma taps discipline; the dropped
    * bᵀσ²_{t-T} tail is < b⁸ ≈ 0.27 of a decaying term, the documented
    * truncation trade.
    */
  val GarchAlpha = 0.10
  val GarchBeta = 0.85
  val GarchOmega = 1.0
  val GarchTaps = 8

  /** bʲ pinned at 6dp — exact decimals shared by BOTH engine texts (the
    * EwmaTaps pattern: generate once in Scala, embed in each).
    */
  private val garchW: Seq[BigDecimal] = (0 until GarchTaps).map(j =>
    BigDecimal(math.pow(GarchBeta, j)).setScale(6, BigDecimal.RoundingMode.HALF_UP))
  private val garchWSum: BigDecimal = garchW.sum

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Hampel filter over the per-(type, day) exact-cents daily series:
    // rolling LOWER median and lower-median MAD over a ±3-row window via
    // ONE partitioned collect_list window + array ops (no second pass —
    // the MAD's deviations are recentered per-row, which a plain window
    // aggregate cannot express). The outlier test is exact-integer.
    "q_ts_hampel" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(sum(expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")).as("c"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day").rowsBetween(-3, 3)
      daily
        .withColumn("ws", collect_list(col("c")).over(w))
        .withColumn("med", expr(
          "element_at(array_sort(ws), CAST((size(ws) + 1) div 2 AS INT))"))
        .withColumn("mad", expr(
          "element_at(array_sort(transform(ws, x -> abs(x - med))), " +
            "CAST((size(ws) + 1) div 2 AS INT))"))
        .select(col("event_type"), col("day"), col("c"), col("med"), col("mad"),
          (abs(col("c") - col("med")) * 10000 > lit(HampelK4) * col("mad"))
            .as("is_outlier"))
    }),

    // Trailing-14-day rolling OLS beta of each type's daily event count
    // against the all-types daily total: exact integer window sums
    // (n, Σx, Σy, Σxy, Σx²) over the bounded daily relation, the
    // close-formed slope assembled in doubles only at output. The total
    // side is a broadcast join on day — |days| rows however large the
    // corpus.
    "q_ts_rolling_beta" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("y"))
        .transform(graft.CacheScope.persisted(_))
      val totals = daily.groupBy("day").agg(sum(col("y")).as("x"))
      val j = daily.join(broadcast(totals), "day")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day").rowsBetween(-(BetaWin - 1), 0)
      // (14,0)-narrowed products keep every moment inside DECIMAL(38)
      // even when a day aggregates billions of events (q_ts_acf pattern).
      val xd = col("x").cast(DecimalType(14, 0))
      val yd = col("y").cast(DecimalType(14, 0))
      j.select(col("event_type"), col("day"),
          count(lit(1)).over(w).as("n"),
          sum(xd).over(w).cast(DecimalType(16, 0)).as("sx"),
          sum(yd).over(w).cast(DecimalType(16, 0)).as("sy"),
          sum((xd * yd).cast(DecimalType(28, 0))).over(w)
            .cast(DecimalType(30, 0)).as("sxy"),
          sum((xd * xd).cast(DecimalType(28, 0))).over(w)
            .cast(DecimalType(30, 0)).as("sxx"))
        .filter(col("n") === BetaWin)
        .filter(col("n").cast(DecimalType(2, 0)) * col("sxx") =!=
          col("sx") * col("sx"))
        .select(col("event_type"), col("day"),
          round((col("n").cast(DecimalType(2, 0)) * col("sxy") -
            col("sx") * col("sy")).cast("double") /
            (col("n").cast(DecimalType(2, 0)) * col("sxx") -
              col("sx") * col("sx")).cast("double"), 6)
            .as("beta"))
    }),

    // New-high-watermark extraction: the events where a user's value
    // strictly exceeds every prior value — the running-max alert stream
    // (in streaming form this is one long of state per key in
    // mapGroupsWithState; here the batch twin is a partitioned
    // unbounded-preceding max window). Exact cents comparisons; the
    // first event per user is a watermark by definition (NULL prior).
    "q_events_high_watermark" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("us", "event_id")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("ts"),
          expr("unix_micros(ts)").as("us"),
          expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)").as("vc"))
        .withColumn("prev_max_cents", max(col("vc")).over(w))
        .filter(col("prev_max_cents").isNull || col("vc") > col("prev_max_cents"))
        .select(col("user_id"), col("event_id"), col("ts"),
          col("vc").as("value_cents"), col("prev_max_cents"))
    }),

    // Steady-state alpha-beta filter (the fixed-gain Kalman tracker,
    // α=1/2, β=1/4) over each type's daily cents series: predict
    // xp = x + v, then x ← xp + r div 2, v ← v + r div 4 on the residual
    // r = z − xp — exact integer truncating division end to end (Spark
    // `div` ≡ DuckDB `//`, both truncate toward zero), so the
    // whole trajectory is bit-reproducible. The recurrence is inherently
    // sequential PER SERIES but the series is the bounded daily relation:
    // ONE fold (aggregate lambda) per type over its sorted day array — a
    // narrow per-group map, embarrassingly parallel across types/keys at
    // any corpus size. The oracle replays it as a recursive CTE —
    // algorithmic diversity, identical integers.
    "q_ts_alphabeta" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(sum(expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")).as("z"))
      daily
        .groupBy("event_type")
        .agg(sort_array(collect_list(struct(col("day"), col("z")))).as("zs"))
        .withColumn("traj", expr(
          """aggregate(
            |  zs,
            |  struct(CAST(0 AS BIGINT) AS x, CAST(0 AS BIGINT) AS v,
            |         CAST(array() AS ARRAY<STRUCT<day: DATE, z: BIGINT,
            |                                      level: BIGINT, trend: BIGINT>>)
            |           AS outs,
            |         true AS first),
            |  (acc, e) -> CASE WHEN acc.first THEN
            |      named_struct('x', e.z, 'v', CAST(0 AS BIGINT),
            |        'outs', array(named_struct('day', e.day, 'z', e.z,
            |                      'level', e.z, 'trend', CAST(0 AS BIGINT))),
            |        'first', false)
            |    ELSE
            |      named_struct(
            |        'x', (acc.x + acc.v) + (e.z - (acc.x + acc.v)) div 2,
            |        'v', acc.v + (e.z - (acc.x + acc.v)) div 4,
            |        'outs', concat(acc.outs, array(named_struct(
            |          'day', e.day, 'z', e.z,
            |          'level', (acc.x + acc.v) + (e.z - (acc.x + acc.v)) div 2,
            |          'trend', acc.v + (e.z - (acc.x + acc.v)) div 4))),
            |        'first', false)
            |    END)""".stripMargin))
        .select(col("event_type"), explode(col("traj.outs")).as("o"))
        .select(col("event_type"), col("o.day").as("day"), col("o.z").as("z"),
          col("o.level").as("level"), col("o.trend").as("trend"))
    }),

    // Per-user interarrival-regularity profile — the bot signature: event
    // count, active span, CV² of the interarrival gaps
    // (CV² = (m·Σg² − S²)/S² over microsecond gaps held as exact
    // DECIMAL moments), and the top-event-type share. The regular/bursty
    // flags compare the round(,6)-pinned ratio — both engines assemble
    // it from identical exact-decimal operands with the identical
    // expression tree, so the pin makes the threshold decision
    // deterministic. One lag window partitioned by user + two bounded
    // aggregations.
    "q_events_regularity" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_type"),
          expr("unix_micros(ts)").as("us"))
        .transform(graft.CacheScope.persisted(_))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("us", "event_type")
      val gaps = ev
        .withColumn("g", col("us") - lag(col("us"), 1).over(w))
        .filter(col("g").isNotNull)
        .groupBy("user_id")
        .agg(count(lit(1)).as("m"),
          sum(col("g").cast(DecimalType(16, 0))).cast(DecimalType(24, 0)).as("sg"),
          sum((col("g").cast(DecimalType(16, 0)) * col("g").cast(DecimalType(16, 0)))
            .cast(DecimalType(32, 0))).cast(DecimalType(38, 0)).as("sgg"))
      val byType = ev.groupBy("user_id", "event_type").agg(count(lit(1)).as("c"))
      val users = byType.groupBy("user_id")
        .agg(sum(col("c")).as("n"), max(col("c")).as("topc"))
      val cv2 = round((col("m").cast("double") * col("sgg").cast("double") -
        col("sg").cast("double") * col("sg").cast("double")) /
        (col("sg").cast("double") * col("sg").cast("double")), 6)
      users.join(gaps, "user_id")
        .filter(col("n") >= 5)
        .select(col("user_id"), col("n"),
          expr("CAST(sg AS BIGINT) div 1000000").as("span_s"),
          cv2.as("cv2"),
          round(col("topc").cast("double") / col("n").cast("double"), 6)
            .as("top_share"),
          (cv2 < 0.1).as("is_regular"),
          (cv2 > 5.0).as("is_bursty"))
    }),

    // GARCH(1,1) conditional-volatility filter over each type's daily
    // returns — the vol estimate a risk monitor or anomaly gate reads
    // (a spike is judged against CURRENT vol, not all-time sd). Returns
    // are integer hundreds-of-currency day-over-day diffs (the unit is
    // the overflow dial: r² ≤ 1e8 at sf0.1 keeps every 6dp-scaled tap
    // product under 2^53, so the decimal→double casts are exact in both
    // engines — the q_ts_ewma bound); the 8 weighted taps accumulate as
    // exact DECIMAL(28,6) and the final sigma assembles in identical
    // doubles. One partitioned window over the bounded daily relation.
    "q_ts_garch" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(sum(expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")).as("c"))
        .withColumn("xh", expr("c div 10000"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day")
      val dec86 = DecimalType(8, 6)
      val dec19 = DecimalType(19, 0)
      val r = (col("xh") - lag(col("xh"), 1).over(w))
      val withR = daily.withColumn("r", r).withColumn("r2", col("r") * col("r"))
      val taps = garchW.zipWithIndex.map { case (bj, j) =>
        (lit(bj).cast(dec86) * lag(col("r2"), j + 1).over(w).cast(dec19))
          .cast(DecimalType(28, 6))
      }.reduce(_ + _)
      withR
        .withColumn("tap", taps)
        .withColumn("guard", lag(col("r2"), GarchTaps).over(w))
        .filter(col("guard").isNotNull)
        .select(col("event_type"), col("day"), col("r").as("ret_h"),
          round(sqrt(lit(GarchOmega * garchWSum.toDouble) +
            lit(GarchAlpha) * col("tap").cast("double")), 6).as("sigma_h"))
    }))

  override val oracles: Map[String, String] = Map(

    "q_ts_hampel" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
         |              AS BIGINT) AS c
         |  FROM events GROUP BY 1, 2
         |), win AS (
         |  SELECT event_type, day, c,
         |         list(c) OVER (PARTITION BY event_type ORDER BY day
         |                       ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS ws
         |  FROM daily
         |), med AS (
         |  SELECT event_type, day, c, ws,
         |         list_sort(ws)[(len(ws) + 1) // 2] AS med
         |  FROM win
         |)
         |SELECT event_type, day, c, med,
         |       list_sort(list_transform(ws, x -> abs(x - med)))
         |         [(len(ws) + 1) // 2] AS mad,
         |       abs(c - med) * 10000 >
         |         $HampelK4 * list_sort(list_transform(ws, x -> abs(x - med)))
         |                       [(len(ws) + 1) // 2] AS is_outlier
         |FROM med""".stripMargin,

    "q_ts_rolling_beta" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         count(*) AS y
         |  FROM events GROUP BY 1, 2
         |), totals AS (
         |  SELECT day, CAST(sum(y) AS BIGINT) AS x FROM daily GROUP BY 1
         |), win AS (
         |  SELECT d.event_type, d.day,
         |         count(*) OVER w AS n,
         |         CAST(sum(CAST(t.x AS DECIMAL(14,0))) OVER w
         |              AS DECIMAL(16,0)) AS sx,
         |         CAST(sum(CAST(d.y AS DECIMAL(14,0))) OVER w
         |              AS DECIMAL(16,0)) AS sy,
         |         CAST(sum(CAST(CAST(t.x AS DECIMAL(14,0)) *
         |                       CAST(d.y AS DECIMAL(14,0)) AS DECIMAL(28,0)))
         |              OVER w AS DECIMAL(30,0)) AS sxy,
         |         CAST(sum(CAST(CAST(t.x AS DECIMAL(14,0)) *
         |                       CAST(t.x AS DECIMAL(14,0)) AS DECIMAL(28,0)))
         |              OVER w AS DECIMAL(30,0)) AS sxx
         |  FROM daily d JOIN totals t ON t.day = d.day
         |  WINDOW w AS (PARTITION BY d.event_type ORDER BY d.day
         |               ROWS BETWEEN ${BetaWin - 1} PRECEDING AND CURRENT ROW)
         |)
         |SELECT event_type, day,
         |       round(CAST(CAST(n AS DECIMAL(2,0)) * sxy - sx * sy AS DOUBLE) /
         |             CAST(CAST(n AS DECIMAL(2,0)) * sxx - sx * sx AS DOUBLE), 6)
         |         AS beta
         |FROM win
         |WHERE n = $BetaWin
         |  AND CAST(n AS DECIMAL(2,0)) * sxx <> sx * sx""".stripMargin,

    "q_events_high_watermark" ->
      """WITH ev AS (
        |  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
        |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS vc
        |  FROM events
        |), wm AS (
        |  SELECT user_id, event_id, ts, vc,
        |         max(vc) OVER (PARTITION BY user_id ORDER BY us, event_id
        |                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |           AS prev_max_cents
        |  FROM ev
        |)
        |SELECT user_id, event_id, ts, vc AS value_cents, prev_max_cents
        |FROM wm
        |WHERE prev_max_cents IS NULL OR vc > prev_max_cents""".stripMargin,

    "q_ts_alphabeta" ->
      """WITH RECURSIVE daily AS (
        |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |         CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
        |              AS BIGINT) AS z
        |  FROM events GROUP BY 1, 2
        |), idx AS (
        |  SELECT event_type, day, z,
        |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS i
        |  FROM daily
        |), rec AS (
        |  SELECT event_type, day, z, i, z AS level, CAST(0 AS BIGINT) AS trend
        |  FROM idx WHERE i = 1
        |  UNION ALL
        |  SELECT n.event_type, n.day, n.z, n.i,
        |         (r.level + r.trend) + (n.z - (r.level + r.trend)) // 2,
        |         r.trend + (n.z - (r.level + r.trend)) // 4
        |  FROM rec r JOIN idx n
        |    ON n.event_type = r.event_type AND n.i = r.i + 1
        |)
        |SELECT event_type, day, z, level, trend FROM rec""".stripMargin,

    "q_events_regularity" ->
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events
        |), gaps AS (
        |  SELECT user_id, count(*) AS m,
        |         CAST(sum(CAST(g AS DECIMAL(16,0))) AS DECIMAL(24,0)) AS sg,
        |         -- (19,0) casts force the HUGEINT multiply path (DuckDB
        |         -- multiplies <=18-precision decimals in int64, which a
        |         -- squared multi-hour microsecond gap overflows)
        |         CAST(sum(CAST(CAST(g AS DECIMAL(19,0)) * CAST(g AS DECIMAL(19,0))
        |                       AS DECIMAL(32,0))) AS DECIMAL(38,0)) AS sgg
        |  FROM (
        |    SELECT user_id,
        |           us - lag(us) OVER (PARTITION BY user_id
        |                              ORDER BY us, event_type) AS g
        |    FROM ev)
        |  WHERE g IS NOT NULL
        |  GROUP BY 1
        |), bytype AS (
        |  SELECT user_id, event_type, count(*) AS c FROM ev GROUP BY 1, 2
        |), users AS (
        |  SELECT user_id, CAST(sum(c) AS BIGINT) AS n, CAST(max(c) AS BIGINT) AS topc
        |  FROM bytype GROUP BY 1
        |)
        |SELECT u.user_id, u.n,
        |       -- BIGINT division (DuckDB's decimal `//` rounds the decimal
        |       -- quotient before flooring, which can land one high)
        |       CAST(g.sg AS BIGINT) // 1000000 AS span_s,
        |       round((CAST(g.m AS DOUBLE) * CAST(g.sgg AS DOUBLE) -
        |              CAST(g.sg AS DOUBLE) * CAST(g.sg AS DOUBLE)) /
        |             (CAST(g.sg AS DOUBLE) * CAST(g.sg AS DOUBLE)), 6) AS cv2,
        |       round(CAST(u.topc AS DOUBLE) / CAST(u.n AS DOUBLE), 6) AS top_share,
        |       round((CAST(g.m AS DOUBLE) * CAST(g.sgg AS DOUBLE) -
        |              CAST(g.sg AS DOUBLE) * CAST(g.sg AS DOUBLE)) /
        |             (CAST(g.sg AS DOUBLE) * CAST(g.sg AS DOUBLE)), 6) < 0.1
        |         AS is_regular,
        |       round((CAST(g.m AS DOUBLE) * CAST(g.sgg AS DOUBLE) -
        |              CAST(g.sg AS DOUBLE) * CAST(g.sg AS DOUBLE)) /
        |             (CAST(g.sg AS DOUBLE) * CAST(g.sg AS DOUBLE)), 6) > 5.0
        |         AS is_bursty
        |FROM users u JOIN gaps g ON g.user_id = u.user_id
        |WHERE u.n >= 5""".stripMargin,

    "q_ts_garch" -> {
      val tapsSql = garchW.zipWithIndex.map { case (bj, j) =>
        s"CAST($bj AS DECIMAL(8,6)) * CAST(lag(r2, ${j + 1}) OVER tw AS DECIMAL(19,0))"
      }.mkString(" + ")
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
         |              AS BIGINT) // 10000 AS xh
         |  FROM events GROUP BY 1, 2
         |), r AS (
         |  SELECT event_type, day,
         |         xh - lag(xh, 1) OVER tw AS ret,
         |         (xh - lag(xh, 1) OVER tw) * (xh - lag(xh, 1) OVER tw) AS r2
         |  FROM daily
         |  WINDOW tw AS (PARTITION BY event_type ORDER BY day)
         |), tap AS (
         |  SELECT event_type, day, ret,
         |         $tapsSql AS tap,
         |         lag(r2, $GarchTaps) OVER tw AS guard
         |  FROM r
         |  WINDOW tw AS (PARTITION BY event_type ORDER BY day)
         |)
         |SELECT event_type, day, ret AS ret_h,
         |       round(sqrt(${GarchOmega * garchWSum.toDouble} +
         |                  $GarchAlpha * CAST(tap AS DOUBLE)), 6) AS sigma_h
         |FROM tap WHERE guard IS NOT NULL""".stripMargin
    })
}
