package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}

/** Long-memory / state-space diagnostics over the HOURLY value series —
  * the finer-grained sibling of [[TimeSeriesQueries]]'s daily operators
  * (720 points per type instead of 30, enough signal for block statistics):
  * a 1-D Kalman filter (the optimal-gain generalization of q_ts_alphabeta's
  * fixed gains), Hurst exponent by rescaled-range analysis, sample entropy
  * (regularity — the time-domain complement of q_ts_spectral_entropy), and
  * the Lo–MacKinlay variance-ratio random-walk test.
  *
  * Determinism ([[Det]]): series values are exact cents; every block/pair
  * statistic reduces to scale-0 DECIMAL combinations of integer sums
  * (n·Σx² − (Σx)² — DECIMAL(38,0)→DOUBLE is a single correctly-rounded
  * int→double conversion in both engines, no /10^scale step to diverge);
  * ln/sqrt run on those identical doubles and are round()-pinned. The
  * Kalman fold is the q_ts_holt contract: one `aggregate` HOF in Spark,
  * the same arithmetic unrolled as a recursive CTE in DuckDB.
  *
  * Scale shapes: the hourly relation is CALENDAR-BOUNDED (|types| × hours
  * in range — ~3.6k rows here, ~90k/decade at any data size), so every
  * window below partitions a bounded relation by type (and block) — the
  * q_ts_sax argument; the events table itself is touched exactly once per
  * query by a map-side-combining aggregation. The SampEn pair generator
  * broadcasts the bounded template relation — quadratic in the CALENDAR,
  * constant in the data.
  */
object TsDiagnosticsQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  private def cents(c: Column): Column =
    (c.cast(DecimalType(12, 2)) * 100).cast("long")

  /** Hourly cents totals per type — the shared series relation. */
  private def hourlyOf(ev: DataFrame): DataFrame =
    ev.groupBy(col("event_type"),
        date_trunc("hour", col("ts")).as("hr"))
      .agg(sum(cents(col("value"))).as("c"))

  private val HourlySql =
    """SELECT event_type, date_trunc('hour', ts) AS hr,
      |         sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS c
      |  FROM events GROUP BY 1, 2""".stripMargin

  /** Kalman local-level process/observation noise (units: (y in hundreds
    * of cents)²). Only the ratio shapes the gain trajectory; the
    * steady-state gain is (sqrt(q²+4qr) − q)/(2r) ≈ 0.27 here.
    */
  val KalmanQ = 1.0
  val KalmanR = 10.0

  /** R/S block sizes (hours). ln-spaced so the log-log regression has
    * leverage; 720 calendar hours give 45..5 complete blocks per size.
    */
  val HurstSizes: Seq[Int] = Seq(16, 32, 64, 128)

  /** Variance-ratio aggregation horizon (hours). */
  val VrQ = 4

  /** Allan-variance averaging times (hours). */
  val AllanTaus: Seq[Int] = Seq(1, 2, 4, 8)

  /** PACF depth (Durbin–Levinson recursion length). */
  val PacfMaxLag = 10

  /** Croston demand threshold (cents) — events above this are "demand"
    * (~p99 of the value distribution, so most days have zero demand —
    * the intermittency Croston exists for).
    */
  val CrostonCents = 25000L

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Ljung–Box portmanteau test on the daily series' autocorrelations —
    // the "is anything left in the residuals" gate run after any
    // q_ts_ar2/holt fit: Q = n(n+2)·Σ_k ρ_k²/(n−k) over the same lag
    // range (and the same exact-decimal correlation kernel) as q_ts_acf.
    // Each ρ is pinned at 6dp into DECIMAL (the acf output grain), the
    // per-lag terms at 12dp, so the sum is exact; Q against χ²(m)
    // quantiles is the caller's lookup. One events-sized aggregation,
    // then lag-bounded relations.
    "q_ts_ljungbox" -> ((s, d) => {
      val daily = TimeSeriesQueries.dailyOf(t(s, d, "events"))
        .transform(graft.CacheScope.persisted(_))
      val nlen = daily.groupBy("event_type").agg(count(lit(1)).as("n_len"))
      val lagged = daily.select(col("event_type"), col("day"), col("c"),
        explode(sequence(lit(1), lit(TimeSeriesQueries.AcfMaxLag))).as("lag"))
      val prev = daily.select(col("event_type").as("pet"),
        col("day").as("pday"), col("c").as("pc"))
      val x = col("c").cast(DecimalType(14, 0))
      val y = col("pc").cast(DecimalType(14, 0))
      val m = lagged.join(prev,
          col("event_type") === col("pet") &&
            col("pday") === date_sub(col("day"), col("lag")))
        .select(col("event_type"), col("lag"), x.as("x"), y.as("y"))
        .groupBy("event_type", "lag")
        .agg(count(lit(1)).cast(DecimalType(6, 0)).as("n"),
          sum(col("x")).cast(DecimalType(14, 0)).as("sx"),
          sum(col("y")).cast(DecimalType(14, 0)).as("sy"),
          sum(col("x") * col("y")).cast(DecimalType(28, 0)).as("sxy"),
          sum(col("x") * col("x")).cast(DecimalType(28, 0)).as("sxx"),
          sum(col("y") * col("y")).cast(DecimalType(28, 0)).as("syy"))
      val rho = m.select(col("event_type"), col("lag"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt(greatest(lit(0.0),
              (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))) *
             sqrt(greatest(lit(0.0),
               (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))),
            6).cast(DecimalType(8, 6)).as("rho"))
        .filter(col("rho").isNotNull)
      rho.join(nlen, "event_type")
        .select(col("event_type"), col("n_len"),
          round((col("rho") * col("rho")).cast("double") /
            (col("n_len") - col("lag")).cast("double"), 12)
            .cast(DecimalType(14, 12)).as("term"))
        .groupBy(col("event_type"), col("n_len"))
        .agg(count(lit(1)).as("n_lags"), sum(col("term")).as("sterm"))
        .select(col("event_type"), col("n_len").as("n_obs"), col("n_lags"),
          round((col("n_len") * (col("n_len") + 2)).cast("double") *
            col("sterm").cast("double"), 4).as("q_lb"))
    }),

    // Dickey–Fuller stationarity t-statistic (lag-0, with drift) on the
    // daily series: OLS of Δc_t on c_{t−1}; β near 0 (t above the ~−2.86
    // critical value) says unit root / random walk, strongly negative t
    // says mean-reverting. Everything reduces to six exact decimal sums
    // over consecutive-day pairs; β, the residual variance and the
    // t-stat are closed forms on the n-scaled centered kernels (single
    // correctly-rounded decimal→double conversions), so both engines
    // produce the identical statistic before the final round.
    "q_ts_dickey_fuller" -> ((s, d) => {
      val daily = TimeSeriesQueries.dailyOf(t(s, d, "events"))
        .transform(graft.CacheScope.persisted(_))
      val prev = daily.select(col("event_type").as("pet"),
        col("day").as("pday"), col("c").as("pc"))
      val pairs = daily.join(prev,
          col("event_type") === col("pet") &&
            col("pday") === date_sub(col("day"), 1))
        .select(col("event_type"),
          col("pc").cast(DecimalType(14, 0)).as("x"),
          (col("c") - col("pc")).cast(DecimalType(14, 0)).as("dd"))
      val m = pairs.groupBy("event_type")
        .agg(count(lit(1)).cast(DecimalType(6, 0)).as("n"),
          sum(col("x")).cast(DecimalType(18, 0)).as("s1"),
          sum(col("x") * col("x")).cast(DecimalType(30, 0)).as("s2"),
          sum(col("dd")).cast(DecimalType(18, 0)).as("sd"),
          sum(col("dd") * col("dd")).cast(DecimalType(30, 0)).as("sdd"),
          sum(col("x") * col("dd")).cast(DecimalType(30, 0)).as("sxd"))
        .filter(col("n") > 2)
        .select(col("event_type"), col("n").cast("long").as("n_obs"),
          col("s1").cast("double").as("s1d"), col("sd").cast("double").as("sdd0"),
          (col("n") * col("s2") - col("s1") * col("s1")).cast("double").as("a"),
          (col("n") * col("sxd") - col("s1") * col("sd")).cast("double").as("b"),
          (col("n") * col("sdd") - col("sd") * col("sd")).cast("double").as("g"))
        .filter(col("a") > 0)
      m.select(col("event_type"), col("n_obs"),
          (col("b") / col("a")).as("beta0"),
          col("a"), col("b"), col("g"), col("s1d"), col("sdd0"))
        .filter(col("g") - (col("b") / col("a")) * col("b") > 0)
        .select(col("event_type"), col("n_obs"),
          round((col("sdd0") - col("beta0") * col("s1d")) /
            col("n_obs").cast("double"), 6).as("alpha"),
          round(col("beta0"), 6).as("beta"),
          round(col("beta0") /
            sqrt((col("g") - col("beta0") * col("b")) /
              ((col("n_obs") - 2).cast("double") * col("a"))), 4).as("t_df"))
    }),

    // KPSS level-stationarity statistic — Dickey–Fuller's complement
    // (stationarity is the NULL here): η = Σ_t S_t² / (n²·σ̂²) over the
    // demeaned daily series. Scaling the residuals by n makes everything
    // integer — E_t = n·c_t − Σc, partial sums P_t = Σ E, and
    // η = ΣP_t² / (n·ΣE_t²) exactly (the n powers cancel), so the whole
    // statistic is ONE double ratio of two exact decimal sums. The
    // prefix sum rides a window PARTITIONED by type over the
    // calendar-bounded relation.
    "q_ts_kpss" -> ((s, d) => {
      val daily = TimeSeriesQueries.dailyOf(t(s, d, "events"))
        .transform(graft.CacheScope.persisted(_))
      val st = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
      val e = daily.join(st, "event_type")
        .select(col("event_type"), col("day"), col("n"),
          (col("n") * col("c") - col("sc")).cast(DecimalType(13, 0)).as("et"))
      val w = Window.partitionBy("event_type").orderBy(col("day").asc)
        .rowsBetween(Window.unboundedPreceding, 0)
      e.withColumn("pt", sum(col("et")).over(w).cast(DecimalType(14, 0)))
        .groupBy(col("event_type"), col("n"))
        .agg(sum(col("pt") * col("pt")).cast(DecimalType(38, 0)).as("sp2"),
          sum(col("et") * col("et")).cast(DecimalType(37, 0)).as("se2"))
        .filter(col("se2") > 0)
        .select(col("event_type"), col("n").as("n_obs"),
          round(col("sp2").cast("double") /
            (col("n").cast("double") * col("se2").cast("double")), 6)
            .as("kpss"))
    }),

    // 1-D Kalman filter, local-level model: predict p' = p + Q, gain
    // K = p'/(p'+R), update l += K(y − l), p = (1−K)p'. Unlike
    // q_ts_alphabeta's fixed gains, K converges from 1·p0 toward the
    // steady state — the optimal filter for a random-walk level observed
    // in noise. One bounded array fold per type (the q_ts_holt shape);
    // innovation MAE accumulates |y − l_pred| pre-update.
    "q_ts_kalman" -> ((s, d) => {
      val series = hourlyOf(t(s, d, "events"))
        .groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("hr"),
          (col("c").cast("double") / lit(100.0)).as("y")))).as("ys"))
      series.select(col("event_type"), size(col("ys")).as("n_hours"),
          expr(s"""aggregate(
            slice(ys, 2, size(ys) - 1),
            named_struct('l', ys[0].y, 'p', CAST($KalmanR AS DOUBLE),
                         'e', CAST(0.0 AS DOUBLE), 'k', CAST(0.0 AS DOUBLE)),
            (acc, s) -> named_struct(
              'l', acc.l + ((acc.p + $KalmanQ) / (acc.p + $KalmanQ + $KalmanR)) * (s.y - acc.l),
              'p', (1.0 - (acc.p + $KalmanQ) / (acc.p + $KalmanQ + $KalmanR)) * (acc.p + $KalmanQ),
              'e', acc.e + abs(s.y - acc.l),
              'k', (acc.p + $KalmanQ) / (acc.p + $KalmanQ + $KalmanR)))""").as("st"))
        .select(col("event_type"), col("n_hours"),
          round(col("st.l"), 6).as("level"),
          round(col("st.p"), 9).as("p_var"),
          round(col("st.k"), 9).as("gain"),
          when(col("n_hours") > 1,
            round(col("st.e") / (col("n_hours") - 1).cast("double"), 6))
            .otherwise(lit(0.0)).as("mae_1step"))
    }),

    // Hurst exponent via rescaled range: for each block size n, split the
    // series into complete n-blocks, compute R/S — the range of the
    // mean-adjusted cumulative sum over the population stddev — and
    // regress ln(avg R/S) on ln(n). H≈0.5 is a random walk; >0.5 long
    // memory. Exactness: the scaled cumulative deviation n·cum_k − k·tot
    // and the variance kernel n·Σx² − tot² are exact integers, so
    // R/S = (maxdev − mindev)/sqrt(n·Σx² − tot²) divides identical
    // doubles; per-size means decimal-sum round(,6)-pinned terms; the
    // 4-point regression is closed-form. Scale: windows partition the
    // calendar-bounded (type, size, block) relation.
    "q_ts_hurst" -> ((s, d) => {
      import s.implicits._
      val sizes = broadcast(HurstSizes.toDF("bn"))
      val wIdx = Window.partitionBy("event_type").orderBy("hr")
      val idx = hourlyOf(t(s, d, "events"))
        .withColumn("i", row_number().over(wIdx))
        .transform(graft.CacheScope.persisted(_))
      val blk = idx.crossJoin(sizes)
        .withColumn("b", expr("(i - 1) div bn"))
        .withColumn("j", (col("i") - 1) % col("bn") + 1)
      // Tight decimal casts keep every product under precision 38 in BOTH
      // engines (DuckDB errors out, Spark silently clamps): c ≤ 1e14
      // cents/hour, tot ≤ 1e16, s2 ≤ 1e19 — dials documented, raise with
      // the value magnitude, never with the row count (calendar-bounded).
      val wB = Window.partitionBy("event_type", "bn", "b")
      val wCum = wB.orderBy("i").rowsBetween(Window.unboundedPreceding, 0)
      val x = col("c").cast(DecimalType(14, 0))
      val bnD = col("bn").cast(DecimalType(4, 0))
      val scored = blk
        .withColumn("cnt", count(lit(1)).over(wB))
        .withColumn("tot", sum(x).over(wB).cast(DecimalType(16, 0)))
        .withColumn("s2", sum(x * x).over(wB).cast(DecimalType(19, 0)))
        .withColumn("cum", sum(x).over(wCum).cast(DecimalType(16, 0)))
        .filter(col("cnt") === col("bn"))
        .withColumn("dev", bnD * col("cum") -
          col("j").cast(DecimalType(4, 0)) * col("tot"))
      val rs = scored.groupBy(col("event_type"), col("bn"), col("b"))
        .agg(max(col("dev")).as("dmax"), min(col("dev")).as("dmin"),
          first(col("tot")).as("tot"), first(col("s2")).as("s2"))
        .withColumn("vk", bnD * col("s2") - col("tot") * col("tot"))
        .filter(col("vk") > 0)
        .select(col("event_type"), col("bn"),
          round((col("dmax") - col("dmin")).cast("double") /
            sqrt(col("vk").cast("double")), 6).as("rsv"))
      val perSize = rs.groupBy(col("event_type"), col("bn"))
        .agg((sum(col("rsv").cast(DecimalType(20, 6))).cast("double") /
          count(lit(1))).as("rs_avg"), count(lit(1)).as("nb"))
        .filter(col("nb") >= 2)
        .select(col("event_type"), round(log(col("bn")), 9).as("lx"),
          round(log(col("rs_avg")), 9).as("ly"))
      // Pin-before-decimal-sum (ADVICE r11): lx and every summed product
      // is pinned at 9dp and folded in DECIMAL, so the four-term sums are
      // partition-order- and engine-independent; the regression itself
      // then runs as a fixed-shape double expression over those exact
      // sums — the same discipline as the file's other summed kernels.
      perSize.groupBy("event_type")
        .agg(count(lit(1)).as("n_sizes"),
          sum(col("lx").cast(DecimalType(20, 9))).as("sx"),
          sum(col("ly").cast(DecimalType(20, 9))).as("sy"),
          sum(round(col("lx") * col("ly"), 9)
            .cast(DecimalType(20, 9))).as("sxy"),
          sum(round(col("lx") * col("lx"), 9)
            .cast(DecimalType(20, 9))).as("sxx"))
        .filter(col("n_sizes") >= 3)
        .select(col("event_type"), col("n_sizes"),
          round((col("n_sizes").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (col("n_sizes").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")), 6)
            .as("hurst"))
    }),

    // Sample entropy SampEn(m=2, r=0.2σ): −ln(A/B) where B counts template
    // pairs of length 2 within Chebyshev distance r and A the pairs still
    // matching at length 3 — low entropy = regular, self-similar series.
    // The tolerance is floored to integer cents (identical doubles →
    // identical floor in both engines), so every match decision is an
    // exact integer comparison. The pair generator broadcasts the
    // calendar-bounded template relation: quadratic in hours-in-range,
    // constant in data size.
    "q_ts_sampen" -> ((s, d) => {
      val wIdx = Window.partitionBy("event_type").orderBy("hr")
      val tmpl = hourlyOf(t(s, d, "events"))
        .withColumn("i", row_number().over(wIdx))
        .withColumn("y1", lead(col("c"), 1).over(wIdx))
        .withColumn("y2", lead(col("c"), 2).over(wIdx))
        .transform(graft.CacheScope.persisted(_))
      val x = col("c").cast(DecimalType(14, 0))
      val tol = tmpl.groupBy(col("event_type").as("et"))
        .agg(count(lit(1)).cast(DecimalType(7, 0)).as("n"),
          sum(x).cast(DecimalType(16, 0)).as("s1"),
          sum(x * x).cast(DecimalType(22, 0)).as("s2"))
        .select(col("et"),
          floor(sqrt((col("n") * col("s2") - col("s1") * col("s1"))
            .cast("double")) /
            (lit(5.0) * col("n").cast("double"))).cast("long").as("r"))
      val a = tmpl.filter(col("y1").isNotNull)
      val b = a.select(col("event_type").as("et2"), col("i").as("i2"),
        col("c").as("c2"), col("y1").as("y12"), col("y2").as("y22"))
      val pairs = a.join(broadcast(b),
          col("event_type") === col("et2") && col("i") < col("i2"))
        .join(broadcast(tol), col("event_type") === col("et"))
        .withColumn("m2", greatest(abs(col("c") - col("c2")),
          abs(col("y1") - col("y12"))) <= col("r"))
        .withColumn("m3", col("y2").isNotNull && col("y22").isNotNull &&
          col("m2") && abs(col("y2") - col("y22")) <= col("r"))
      pairs.groupBy(col("event_type"))
        .agg(sum(when(col("m2"), 1L).otherwise(0L)).as("b_pairs"),
          sum(when(col("m3"), 1L).otherwise(0L)).as("a_pairs"))
        .filter(col("a_pairs") > 0)
        .select(col("event_type"), col("b_pairs"), col("a_pairs"),
          round(log(col("b_pairs").cast("double") /
            col("a_pairs").cast("double")), 6).as("sampen"))
    }),

    // Partial autocorrelation function via Durbin–Levinson: pacf(k) is
    // the correlation at lag k AFTER removing the shorter-lag structure —
    // the AR-order selector q_ts_acf alone cannot provide (an AR(2)
    // series has nonzero acf at every lag but pacf cuts off at 2). The
    // autocorrelations ρ_k = Σ d_t·d_{t+k} / Σ d_t² run on EXACT scaled
    // deviations d_t = n·x_t − Σx (integers — no rational mean ever
    // materializes), are round(,9)-pinned, and the Levinson recursion
    // folds the pinned vector identically in both engines: one aggregate
    // HOF with array state here, a recursive CTE with LIST state in the
    // oracle. Scale: the lag join and windows ride the calendar-bounded
    // hourly relation; the recursion state is K doubles per type.
    "q_ts_pacf" -> ((s, d) => {
      val wIdx = Window.partitionBy("event_type").orderBy("hr")
      val idx = hourlyOf(t(s, d, "events"))
        .withColumn("i", row_number().over(wIdx))
      val m = idx.groupBy(col("event_type").as("met"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
      val dRel = idx.join(broadcast(m), col("event_type") === col("met"))
        .select(col("event_type"), col("i"),
          (col("n") * col("c") - col("sc")).cast(DecimalType(19, 0)).as("dv"))
        .transform(graft.CacheScope.persisted(_))
      val a0 = dRel.groupBy(col("event_type"))
        .agg(sum(col("dv") * col("dv")).cast(DecimalType(38, 0)).as("a0"))
      val lagged = dRel.select(col("event_type"), col("i"), col("dv"),
          explode(sequence(lit(1), lit(PacfMaxLag))).as("k"))
        .join(dRel.select(col("event_type").as("et2"), col("i").as("i2"),
          col("dv").as("dv2")),
          col("event_type") === col("et2") && col("i2") === col("i") + col("k"))
        .groupBy(col("event_type"), col("k"))
        .agg(sum(col("dv") * col("dv2")).cast(DecimalType(38, 0)).as("ak"))
      val rhos = lagged.join(broadcast(a0), "event_type")
        .select(col("event_type"), col("k"),
          round(col("ak").cast("double") / col("a0").cast("double"), 9).as("rho"))
        .groupBy(col("event_type"))
        .agg(array_sort(collect_list(struct(col("k"), col("rho")))).as("rs"))
        .filter(size(col("rs")) === PacfMaxLag)
        .select(col("event_type"),
          expr("transform(rs, x -> x.rho)").as("r"))
      // φ_kk for the NEW lag k given state a over rhos r — repeated
      // inline because SQL lambdas have no let-binding; the nested fold
      // is ≤ K elements, re-evaluation is free.
      val phik = "((element_at(r, k) - aggregate(sequence(1, k - 1), " +
        "CAST(0.0 AS DOUBLE), (s2, j2) -> s2 + element_at(a.phi, j2) * " +
        "element_at(r, k - j2))) / a.v)"
      val pacf = rhos.select(col("event_type"),
        expr(s"""aggregate(sequence(2, $PacfMaxLag),
            named_struct('phi', array(element_at(r, 1)),
                         'v', 1.0 - element_at(r, 1) * element_at(r, 1),
                         'pk', array(element_at(r, 1))),
            (a, k) -> named_struct(
              'phi', concat(transform(sequence(1, k - 1),
                       j -> element_at(a.phi, j) - $phik * element_at(a.phi, k - j)),
                     array($phik)),
              'v', a.v * (1.0 - $phik * $phik),
              'pk', concat(a.pk, array($phik))),
            a -> a.pk)""").as("pk"))
      pacf.select(col("event_type"), posexplode(col("pk")).as(Seq("k0", "p")))
        .select(col("event_type"), (col("k0") + 1).as("lag"),
          round(col("p"), 6).as("pacf"))
    }),

    // Allan variance of the hourly series at averaging times τ ∈
    // {1,2,4,8}: σ²(τ) = Σ(ȳ_{k+1} − ȳ_k)²/(2(M−1)) over consecutive
    // non-overlapping block means — the drift-vs-noise stability metric
    // (white noise slopes −1 on log-log; random-walk drift +1), the
    // frequency-domain cousin of q_ts_hurst. With exact block sums S_k,
    // σ²(τ) = Σ(ΔS)²/(2τ²(M−1)) — every term an exact integer, one
    // division. Blocks ride the same calendar-bounded windows as hurst.
    "q_ts_allan" -> ((s, d) => {
      import s.implicits._
      val taus = broadcast(AllanTaus.toDF("tau"))
      val wIdx = Window.partitionBy("event_type").orderBy("hr")
      val idx = hourlyOf(t(s, d, "events"))
        .withColumn("i", row_number().over(wIdx))
      val blk = idx.crossJoin(taus)
        .withColumn("b", expr("(i - 1) div tau"))
        .groupBy(col("event_type"), col("tau"), col("b"))
        .agg(count(lit(1)).as("cnt"), sum(col("c")).as("sb"))
        .filter(col("cnt") === col("tau"))
      val wLag = Window.partitionBy("event_type", "tau").orderBy("b")
      val dd = blk
        .withColumn("ds", (col("sb") - lag(col("sb"), 1).over(wLag))
          .cast(DecimalType(16, 0)))
        .filter(col("ds").isNotNull)
        .groupBy(col("event_type"), col("tau"))
        .agg(count(lit(1)).as("mdiff"),
          sum(col("ds") * col("ds")).cast(DecimalType(36, 0)).as("ssq"))
        .filter(col("mdiff") >= 1)
      dd.select(col("event_type"), col("tau"), (col("mdiff") + 1).as("m_blocks"),
        round(col("ssq").cast("double") /
          (lit(2.0) * col("tau").cast("double") * col("tau").cast("double") *
            col("mdiff").cast("double") * lit(10000.0)), 6).as("avar_value"))
    }),

    // Croston's method for intermittent demand: daily counts of
    // high-value events per type are mostly zero; separate EWMAs track
    // the nonzero demand size (z) and the inter-demand interval (p), and
    // the flat forecast is z/p per day. The calendar (including zero
    // days) is materialized per type as a bounded day sequence with a
    // count-map lookup, then ONE array fold (the q_ts_kalman shape); the
    // oracle replays the identical recursion over generate_series days.
    "q_ts_croston" -> ((s, d) => {
      val daily = t(s, d, "events")
        .filter(cents(col("value")) > CrostonCents)
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(count(lit(1)).as("dem"))
      val rng = t(s, d, "events")
        .agg(date_trunc("day", min(col("ts"))).cast("date").as("d0"),
          date_trunc("day", max(col("ts"))).cast("date").as("d1"))
      val series = daily.groupBy(col("event_type"))
        .agg(map_from_entries(collect_list(struct(col("day"), col("dem"))))
          .as("dm"))
        .crossJoin(broadcast(rng))
        .select(col("event_type"),
          expr("transform(sequence(d0, d1, interval 1 day), dd -> coalesce(element_at(dm, dd), CAST(0 AS BIGINT)))")
            .as("ds"))
      series.select(col("event_type"), size(col("ds")).as("n_days"),
          expr("""aggregate(ds, named_struct(
              'z', CAST(0.0 AS DOUBLE), 'p', CAST(0.0 AS DOUBLE),
              'i', CAST(1 AS INT), 'k', CAST(0 AS INT)),
            (a, x) -> CASE
              WHEN x > 0 AND a.k = 0 THEN named_struct(
                'z', CAST(x AS DOUBLE), 'p', CAST(a.i AS DOUBLE),
                'i', 1, 'k', 1)
              WHEN x > 0 THEN named_struct(
                'z', 0.1 * CAST(x AS DOUBLE) + 0.9 * a.z,
                'p', 0.1 * CAST(a.i AS DOUBLE) + 0.9 * a.p,
                'i', 1, 'k', a.k + 1)
              ELSE named_struct('z', a.z, 'p', a.p, 'i', a.i + 1, 'k', a.k)
            END)""").as("st"))
        .filter(col("st.k") > 0)
        .select(col("event_type"), col("n_days"), col("st.k").as("n_demand_days"),
          round(col("st.z"), 6).as("demand_size"),
          round(col("st.p"), 6).as("interval_days"),
          round(col("st.z") / col("st.p"), 6).as("forecast_per_day"))
    }),

    // Lo–MacKinlay variance ratio at horizon q: VR = Var(q-step diffs) /
    // (q·Var(1-step diffs)) on the hourly level series; VR≈1 is a random
    // walk, <1 mean reversion. Both variances are population variances
    // from the exact scale-0 DECIMAL kernel n·Σd² − (Σd)², combined in one
    // closed-form double expression; the z-statistic uses the asymptotic
    // homoskedastic variance 2(2q−1)(q−1)/(3q·n).
    "q_ts_varratio" -> ((s, d) => {
      val wIdx = Window.partitionBy("event_type").orderBy("hr")
      val diffs = hourlyOf(t(s, d, "events"))
        .withColumn("d1", col("c") - lag(col("c"), 1).over(wIdx))
        .withColumn("dq", col("c") - lag(col("c"), VrQ).over(wIdx))
      val d1 = col("d1").cast(DecimalType(14, 0))
      val dq = col("dq").cast(DecimalType(14, 0))
      val m = diffs.groupBy("event_type")
        .agg(sum(when(col("d1").isNotNull, 1L).otherwise(0L))
            .cast(DecimalType(7, 0)).as("n1"),
          sum(d1).cast(DecimalType(16, 0)).as("sa"),
          sum(d1 * d1).cast(DecimalType(22, 0)).as("saa"),
          sum(when(col("dq").isNotNull, 1L).otherwise(0L))
            .cast(DecimalType(7, 0)).as("nq"),
          sum(dq).cast(DecimalType(16, 0)).as("sb"),
          sum(dq * dq).cast(DecimalType(22, 0)).as("sbb"))
        .filter(col("n1") > 1 && col("nq") > 1)
      val k1 = (col("n1") * col("saa") - col("sa") * col("sa")).cast("double")
      val kq = (col("nq") * col("sbb") - col("sb") * col("sb")).cast("double")
      val vr = (kq * col("n1").cast("double") * col("n1").cast("double")) /
        (k1 * col("nq").cast("double") * col("nq").cast("double") * lit(VrQ.toDouble))
      m.filter(k1 > 0)
        .select(col("event_type"), col("nq").cast("long").as("n_diffs"),
          round(vr, 6).as("vr"),
          round((vr - 1.0) /
            sqrt(lit(2.0 * (2 * VrQ - 1) * (VrQ - 1) / (3.0 * VrQ)) /
              col("nq").cast("double")), 6).as("z"))
    }))

  override val oracles: Map[String, String] = Map(

    "q_ts_ljungbox" ->
      s"""WITH daily AS (${TimeSeriesQueries.DailySql}),
         |nlen AS (SELECT event_type, count(*) AS n_len FROM daily GROUP BY 1),
         |lagged AS (
         |  SELECT event_type, day, c,
         |         CAST(unnest(generate_series(1, ${TimeSeriesQueries.AcfMaxLag})) AS INTEGER) AS lag
         |  FROM daily
         |), m AS (
         |  SELECT a.event_type, a.lag,
         |         CAST(count(*) AS DECIMAL(6,0)) AS n,
         |         CAST(sum(CAST(a.c AS DECIMAL(14,0))) AS DECIMAL(14,0)) AS sx,
         |         CAST(sum(CAST(b.c AS DECIMAL(14,0))) AS DECIMAL(14,0)) AS sy,
         |         CAST(sum(CAST(a.c AS DECIMAL(14,0)) * CAST(b.c AS DECIMAL(14,0))) AS DECIMAL(28,0)) AS sxy,
         |         CAST(sum(CAST(a.c AS DECIMAL(14,0)) * CAST(a.c AS DECIMAL(14,0))) AS DECIMAL(28,0)) AS sxx,
         |         CAST(sum(CAST(b.c AS DECIMAL(14,0)) * CAST(b.c AS DECIMAL(14,0))) AS DECIMAL(28,0)) AS syy
         |  FROM lagged a JOIN daily b
         |    ON b.event_type = a.event_type AND b.day = a.day - a.lag
         |  GROUP BY 1, 2
         |), rho AS (
         |  SELECT event_type, lag, CAST(r AS DECIMAL(8,6)) AS rho FROM (
         |    SELECT event_type, lag,
         |           round(CAST(n * sxy - sx * sy AS DOUBLE) /
         |                 (sqrt(greatest(0.0, CAST(n * sxx - sx * sx AS DOUBLE))) *
         |                  sqrt(greatest(0.0, CAST(n * syy - sy * sy AS DOUBLE)))),
         |                 6) AS r
         |    FROM m
         |  ) WHERE r IS NOT NULL
         |), terms AS (
         |  SELECT r.event_type, nl.n_len,
         |         CAST(round(CAST(r.rho * r.rho AS DOUBLE) /
         |                    (nl.n_len - r.lag), 12) AS DECIMAL(14,12)) AS term
         |  FROM rho r JOIN nlen nl ON nl.event_type = r.event_type
         |)
         |SELECT event_type, CAST(n_len AS BIGINT) AS n_obs,
         |       count(*) AS n_lags,
         |       round(CAST(n_len * (n_len + 2) AS DOUBLE) *
         |             CAST(sum(term) AS DOUBLE), 4) AS q_lb
         |FROM terms GROUP BY event_type, n_len""".stripMargin,

    "q_ts_kpss" ->
      s"""WITH daily AS (${TimeSeriesQueries.DailySql}),
         |st AS (
         |  SELECT event_type, count(*) AS n, CAST(sum(c) AS BIGINT) AS sc
         |  FROM daily GROUP BY 1
         |), e AS (
         |  SELECT d.event_type, d.day, st.n,
         |         CAST(st.n * d.c - st.sc AS DECIMAL(13,0)) AS et
         |  FROM daily d JOIN st ON st.event_type = d.event_type
         |), p AS (
         |  SELECT event_type, n, et,
         |         CAST(sum(et) OVER (PARTITION BY event_type ORDER BY day
         |                            ROWS UNBOUNDED PRECEDING)
         |              AS DECIMAL(14,0)) AS pt
         |  FROM e
         |), m AS (
         |  SELECT event_type, n,
         |         CAST(sum(pt * pt) AS DECIMAL(38,0)) AS sp2,
         |         CAST(sum(et * et) AS DECIMAL(37,0)) AS se2
         |  FROM p GROUP BY 1, 2 HAVING sum(et * et) > 0
         |)
         |SELECT event_type, CAST(n AS BIGINT) AS n_obs,
         |       round(CAST(sp2 AS DOUBLE) /
         |             (CAST(n AS DOUBLE) * CAST(se2 AS DOUBLE)), 6) AS kpss
         |FROM m""".stripMargin,

    "q_ts_dickey_fuller" ->
      s"""WITH daily AS (${TimeSeriesQueries.DailySql}),
         |pairs AS (
         |  SELECT a.event_type,
         |         CAST(b.c AS DECIMAL(14,0)) AS x,
         |         CAST(a.c - b.c AS DECIMAL(14,0)) AS dd
         |  FROM daily a JOIN daily b
         |    ON b.event_type = a.event_type AND b.day = a.day - 1
         |), m AS (
         |  SELECT event_type, CAST(count(*) AS DECIMAL(6,0)) AS n,
         |         CAST(sum(x) AS DECIMAL(18,0)) AS s1,
         |         CAST(sum(x * x) AS DECIMAL(30,0)) AS s2,
         |         CAST(sum(dd) AS DECIMAL(18,0)) AS sd,
         |         CAST(sum(dd * dd) AS DECIMAL(30,0)) AS sdd,
         |         CAST(sum(x * dd) AS DECIMAL(30,0)) AS sxd
         |  FROM pairs GROUP BY 1 HAVING count(*) > 2
         |), k AS (
         |  SELECT event_type, CAST(n AS BIGINT) AS n_obs,
         |         CAST(s1 AS DOUBLE) AS s1d, CAST(sd AS DOUBLE) AS sdd0,
         |         CAST(n * s2 - s1 * s1 AS DOUBLE) AS a,
         |         CAST(n * sxd - s1 * sd AS DOUBLE) AS b,
         |         CAST(n * sdd - sd * sd AS DOUBLE) AS g
         |  FROM m
         |), f AS (
         |  SELECT event_type, n_obs, s1d, sdd0, a, b, g, b / a AS beta0
         |  FROM k WHERE a > 0
         |)
         |SELECT event_type, n_obs,
         |       round((sdd0 - beta0 * s1d) / n_obs, 6) AS alpha,
         |       round(beta0, 6) AS beta,
         |       round(beta0 / sqrt((g - beta0 * b) /
         |             ((n_obs - 2) * a)), 4) AS t_df
         |FROM f WHERE g - beta0 * b > 0""".stripMargin,

    "q_ts_kalman" ->
      s"""WITH RECURSIVE hourly AS ($HourlySql),
         |idx AS (
         |  SELECT event_type, c,
         |         row_number() OVER (PARTITION BY event_type ORDER BY hr ASC) AS i
         |  FROM hourly
         |), nn AS (
         |  SELECT event_type, CAST(max(i) AS INTEGER) AS n FROM idx GROUP BY 1
         |), rec(event_type, i, l, p, e, k) AS (
         |  SELECT event_type, 1, CAST(c AS DOUBLE) / 100.0,
         |         CAST($KalmanR AS DOUBLE), CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE)
         |  FROM idx WHERE i = 1
         |  UNION ALL
         |  SELECT r.event_type, r.i + 1,
         |         r.l + ((r.p + $KalmanQ) / (r.p + $KalmanQ + $KalmanR)) *
         |               (CAST(x.c AS DOUBLE) / 100.0 - r.l),
         |         (1.0 - (r.p + $KalmanQ) / (r.p + $KalmanQ + $KalmanR)) *
         |         (r.p + $KalmanQ),
         |         r.e + abs(CAST(x.c AS DOUBLE) / 100.0 - r.l),
         |         (r.p + $KalmanQ) / (r.p + $KalmanQ + $KalmanR)
         |  FROM rec r JOIN idx x ON x.event_type = r.event_type AND x.i = r.i + 1
         |)
         |SELECT r.event_type, CAST(n.n AS INTEGER) AS n_hours,
         |       round(r.l, 6) AS level, round(r.p, 9) AS p_var,
         |       round(r.k, 9) AS gain,
         |       CASE WHEN n.n > 1 THEN round(r.e / CAST(n.n - 1 AS DOUBLE), 6)
         |            ELSE 0.0 END AS mae_1step
         |FROM rec r JOIN nn n ON n.event_type = r.event_type AND r.i = n.n""".stripMargin,

    "q_ts_hurst" ->
      s"""WITH hourly AS ($HourlySql),
         |idx AS (
         |  SELECT event_type, CAST(c AS DECIMAL(14,0)) AS c,
         |         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS i
         |  FROM hourly
         |), blk AS (
         |  SELECT i.event_type, s.bn, (i.i - 1) // s.bn AS b,
         |         (i.i - 1) % s.bn + 1 AS j, i.c, i.i
         |  FROM idx i CROSS JOIN (VALUES ${graft.ConstTab.valuesRows(HurstSizes)}) s(bn)
         |), scored AS (
         |  SELECT event_type, bn, b, CAST(j AS DECIMAL(4,0)) AS j,
         |         count(*) OVER (PARTITION BY event_type, bn, b) AS cnt,
         |         CAST(sum(c) OVER (PARTITION BY event_type, bn, b) AS DECIMAL(16,0)) AS tot,
         |         CAST(sum(c * c) OVER (PARTITION BY event_type, bn, b) AS DECIMAL(19,0)) AS s2,
         |         CAST(sum(c) OVER (PARTITION BY event_type, bn, b ORDER BY i
         |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(16,0)) AS cum
         |  FROM blk
         |), rsq AS (
         |  SELECT event_type, bn, b,
         |         max(CAST(bn AS DECIMAL(4,0)) * cum - j * tot) AS dmax,
         |         min(CAST(bn AS DECIMAL(4,0)) * cum - j * tot) AS dmin,
         |         any_value(tot) AS tot, any_value(s2) AS s2
         |  FROM scored WHERE cnt = bn GROUP BY 1, 2, 3
         |), rs AS (
         |  SELECT event_type, bn,
         |         round(CAST(dmax - dmin AS DOUBLE) /
         |               sqrt(CAST(CAST(bn AS DECIMAL(4,0)) * s2 - tot * tot AS DOUBLE)), 6) AS rsv
         |  FROM rsq WHERE CAST(bn AS DECIMAL(4,0)) * s2 - tot * tot > 0
         |), persize AS (
         |  SELECT event_type, round(ln(bn), 9) AS lx,
         |         round(ln(CAST(sum(CAST(rsv AS DECIMAL(20,6))) AS DOUBLE) / count(*)), 9) AS ly
         |  FROM rs GROUP BY event_type, bn HAVING count(*) >= 2
         |)
         |SELECT event_type, count(*) AS n_sizes,
         |       round((CAST(count(*) AS DOUBLE) *
         |                CAST(sum(CAST(round(lx * ly, 9) AS DECIMAL(20,9))) AS DOUBLE) -
         |              CAST(sum(CAST(lx AS DECIMAL(20,9))) AS DOUBLE) *
         |                CAST(sum(CAST(ly AS DECIMAL(20,9))) AS DOUBLE)) /
         |             (CAST(count(*) AS DOUBLE) *
         |                CAST(sum(CAST(round(lx * lx, 9) AS DECIMAL(20,9))) AS DOUBLE) -
         |              CAST(sum(CAST(lx AS DECIMAL(20,9))) AS DOUBLE) *
         |                CAST(sum(CAST(lx AS DECIMAL(20,9))) AS DOUBLE)), 6) AS hurst
         |FROM persize GROUP BY event_type HAVING count(*) >= 3""".stripMargin,

    "q_ts_sampen" ->
      s"""WITH hourly AS ($HourlySql),
         |tmpl AS (
         |  SELECT event_type, c,
         |         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS i,
         |         lead(c, 1) OVER (PARTITION BY event_type ORDER BY hr) AS y1,
         |         lead(c, 2) OVER (PARTITION BY event_type ORDER BY hr) AS y2
         |  FROM hourly
         |), tol AS (
         |  SELECT event_type AS et,
         |         CAST(floor(sqrt(CAST(CAST(count(*) AS DECIMAL(7,0)) *
         |                               CAST(sum(CAST(c AS DECIMAL(14,0)) * CAST(c AS DECIMAL(14,0))) AS DECIMAL(22,0))
         |                             - CAST(sum(CAST(c AS DECIMAL(14,0))) AS DECIMAL(16,0)) *
         |                               CAST(sum(CAST(c AS DECIMAL(14,0))) AS DECIMAL(16,0)) AS DOUBLE)) /
         |                    (5.0 * CAST(count(*) AS DOUBLE))) AS BIGINT) AS r
         |  FROM tmpl GROUP BY 1
         |), pairs AS (
         |  SELECT a.event_type,
         |         greatest(abs(a.c - b.c), abs(a.y1 - b.y1)) <= t.r AS m2,
         |         a.y2 IS NOT NULL AND b.y2 IS NOT NULL AND
         |         greatest(abs(a.c - b.c), abs(a.y1 - b.y1)) <= t.r AND
         |         abs(a.y2 - b.y2) <= t.r AS m3
         |  FROM tmpl a
         |  JOIN tmpl b ON b.event_type = a.event_type AND a.i < b.i
         |  JOIN tol t ON t.et = a.event_type
         |  WHERE a.y1 IS NOT NULL AND b.y1 IS NOT NULL
         |)
         |SELECT event_type,
         |       CAST(sum(CASE WHEN m2 THEN 1 ELSE 0 END) AS BIGINT) AS b_pairs,
         |       CAST(sum(CASE WHEN m3 THEN 1 ELSE 0 END) AS BIGINT) AS a_pairs,
         |       round(ln(CAST(sum(CASE WHEN m2 THEN 1 ELSE 0 END) AS DOUBLE) /
         |                CAST(sum(CASE WHEN m3 THEN 1 ELSE 0 END) AS DOUBLE)), 6) AS sampen
         |FROM pairs GROUP BY event_type
         |HAVING sum(CASE WHEN m3 THEN 1 ELSE 0 END) > 0""".stripMargin,

    "q_ts_pacf" ->
      s"""WITH RECURSIVE hourly AS ($HourlySql),
         |idx AS (
         |  SELECT event_type, c,
         |         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS i
         |  FROM hourly
         |), m AS (
         |  SELECT event_type, count(*) AS n, sum(c) AS sc FROM idx GROUP BY 1
         |), dd AS MATERIALIZED (
         |  SELECT i.event_type, i.i,
         |         CAST(m.n * i.c - m.sc AS DECIMAL(19,0)) AS dv
         |  FROM idx i JOIN m USING (event_type)
         |), a0 AS (
         |  SELECT event_type, CAST(sum(dv * dv) AS DECIMAL(38,0)) AS a0
         |  FROM dd GROUP BY 1
         |), ak AS (
         |  SELECT a.event_type, k.k,
         |         CAST(sum(a.dv * b.dv) AS DECIMAL(38,0)) AS ak
         |  FROM dd a
         |  CROSS JOIN (SELECT unnest(generate_series(1, $PacfMaxLag)) AS k) k
         |  JOIN dd b ON b.event_type = a.event_type AND b.i = a.i + k.k
         |  GROUP BY 1, 2
         |), rhos AS MATERIALIZED (
         |  SELECT ak.event_type,
         |         list(round(CAST(ak.ak AS DOUBLE) / CAST(a0.a0 AS DOUBLE), 9)
         |              ORDER BY ak.k) AS r
         |  FROM ak JOIN a0 USING (event_type)
         |  GROUP BY 1 HAVING count(*) = $PacfMaxLag
         |), rec(event_type, k, phi, v, pk) AS (
         |  SELECT event_type, 1, [r[1]], 1.0 - r[1] * r[1], [r[1]] FROM rhos
         |  UNION ALL
         |  SELECT event_type, k + 1,
         |         list_transform(generate_series(1, k),
         |           j -> phi[j] - phik * phi[k + 1 - j]) || [phik],
         |         v * (1.0 - phik * phik),
         |         pk || [phik]
         |  FROM (
         |    SELECT rec.event_type, rec.k, rec.phi, rec.v, rec.pk,
         |           (r2.r[rec.k + 1] -
         |            coalesce(list_sum(list_transform(generate_series(1, rec.k),
         |              j -> rec.phi[j] * r2.r[rec.k + 1 - j])), 0.0)) / rec.v AS phik
         |    FROM rec JOIN rhos r2 USING (event_type)
         |    WHERE rec.k < $PacfMaxLag
         |  )
         |)
         |SELECT r.event_type, CAST(j.j AS INT) AS lag, round(r.pk[j.j], 6) AS pacf
         |FROM rec r
         |CROSS JOIN (SELECT unnest(generate_series(1, $PacfMaxLag)) AS j) j
         |WHERE r.k = $PacfMaxLag""".stripMargin,

    "q_ts_allan" ->
      s"""WITH hourly AS ($HourlySql),
         |idx AS (
         |  SELECT event_type, c,
         |         row_number() OVER (PARTITION BY event_type ORDER BY hr) AS i
         |  FROM hourly
         |), blk AS (
         |  SELECT i.event_type, t.tau, (i.i - 1) // t.tau AS b,
         |         count(*) AS cnt, sum(i.c) AS sb
         |  FROM idx i CROSS JOIN (SELECT unnest(${graft.ConstTab.duckArray(AllanTaus)}) AS tau) t
         |  GROUP BY 1, 2, 3
         |), dd AS (
         |  SELECT event_type, tau,
         |         CAST(sb - lag(sb, 1) OVER (PARTITION BY event_type, tau ORDER BY b)
         |              AS DECIMAL(16,0)) AS ds
         |  FROM blk WHERE cnt = tau
         |), m AS (
         |  SELECT event_type, tau, CAST(count(*) AS BIGINT) AS mdiff,
         |         CAST(sum(CAST(ds AS DECIMAL(19,0)) * ds) AS DECIMAL(36,0)) AS ssq
         |  FROM dd WHERE ds IS NOT NULL GROUP BY 1, 2
         |  HAVING count(*) >= 1
         |)
         |SELECT event_type, tau, mdiff + 1 AS m_blocks,
         |       round(CAST(ssq AS DOUBLE) /
         |             (2.0 * CAST(tau AS DOUBLE) * CAST(tau AS DOUBLE) *
         |              CAST(mdiff AS DOUBLE) * 10000.0), 6) AS avar_value
         |FROM m""".stripMargin,

    "q_ts_croston" ->
      s"""WITH RECURSIVE rng AS (
         |  SELECT CAST(date_trunc('day', min(ts)) AS DATE) AS d0,
         |         CAST(date_trunc('day', max(ts)) AS DATE) AS d1
         |  FROM events
         |), types AS (SELECT DISTINCT event_type FROM events),
         |dem AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         count(*) AS dem
         |  FROM events
         |  WHERE CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) > $CrostonCents
         |  GROUP BY 1, 2
         |), grid AS (
         |  SELECT ty.event_type, CAST(dd.day AS DATE) AS day,
         |         coalesce(dem.dem, 0) AS x,
         |         row_number() OVER (PARTITION BY ty.event_type
         |                            ORDER BY CAST(dd.day AS DATE)) AS j
         |  FROM types ty
         |  CROSS JOIN (SELECT unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS day
         |              FROM rng) dd
         |  LEFT JOIN dem ON dem.event_type = ty.event_type
         |              AND dem.day = CAST(dd.day AS DATE)
         |), nn AS (SELECT event_type, CAST(max(j) AS INT) AS n FROM grid GROUP BY 1),
         |rec(event_type, j, z, p, i, k) AS (
         |  SELECT event_type, 0, CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE), 1, 0
         |  FROM types
         |  UNION ALL
         |  SELECT r.event_type, r.j + 1,
         |         CASE WHEN g.x > 0 AND r.k = 0 THEN CAST(g.x AS DOUBLE)
         |              WHEN g.x > 0 THEN 0.1 * CAST(g.x AS DOUBLE) + 0.9 * r.z
         |              ELSE r.z END,
         |         CASE WHEN g.x > 0 AND r.k = 0 THEN CAST(r.i AS DOUBLE)
         |              WHEN g.x > 0 THEN 0.1 * CAST(r.i AS DOUBLE) + 0.9 * r.p
         |              ELSE r.p END,
         |         CASE WHEN g.x > 0 THEN 1 ELSE r.i + 1 END,
         |         CASE WHEN g.x > 0 THEN r.k + 1 ELSE r.k END
         |  FROM rec r JOIN grid g ON g.event_type = r.event_type AND g.j = r.j + 1
         |)
         |SELECT r.event_type, CAST(n.n AS INT) AS n_days, r.k AS n_demand_days,
         |       round(r.z, 6) AS demand_size,
         |       round(r.p, 6) AS interval_days,
         |       round(r.z / r.p, 6) AS forecast_per_day
         |FROM rec r JOIN nn n ON n.event_type = r.event_type AND r.j = n.n
         |WHERE r.k > 0""".stripMargin,

    "q_ts_varratio" ->
      s"""WITH hourly AS ($HourlySql),
         |diffs AS (
         |  SELECT event_type,
         |         CAST(c - lag(c, 1) OVER (PARTITION BY event_type ORDER BY hr) AS DECIMAL(14,0)) AS d1,
         |         CAST(c - lag(c, $VrQ) OVER (PARTITION BY event_type ORDER BY hr) AS DECIMAL(14,0)) AS dq
         |  FROM hourly
         |), m AS (
         |  SELECT event_type,
         |         CAST(sum(CASE WHEN d1 IS NOT NULL THEN 1 ELSE 0 END) AS DECIMAL(7,0)) AS n1,
         |         CAST(sum(d1) AS DECIMAL(16,0)) AS sa,
         |         CAST(sum(d1 * d1) AS DECIMAL(22,0)) AS saa,
         |         CAST(sum(CASE WHEN dq IS NOT NULL THEN 1 ELSE 0 END) AS DECIMAL(7,0)) AS nq,
         |         CAST(sum(dq) AS DECIMAL(16,0)) AS sb,
         |         CAST(sum(dq * dq) AS DECIMAL(22,0)) AS sbb
         |  FROM diffs GROUP BY 1
         |  HAVING sum(CASE WHEN d1 IS NOT NULL THEN 1 ELSE 0 END) > 1
         |     AND sum(CASE WHEN dq IS NOT NULL THEN 1 ELSE 0 END) > 1
         |)
         |SELECT event_type, CAST(nq AS BIGINT) AS n_diffs,
         |       round(CAST(nq * sbb - sb * sb AS DOUBLE) *
         |             CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE) /
         |             (CAST(n1 * saa - sa * sa AS DOUBLE) *
         |              CAST(nq AS DOUBLE) * CAST(nq AS DOUBLE) * $VrQ.0), 6) AS vr,
         |       round((CAST(nq * sbb - sb * sb AS DOUBLE) *
         |              CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE) /
         |              (CAST(n1 * saa - sa * sa AS DOUBLE) *
         |               CAST(nq AS DOUBLE) * CAST(nq AS DOUBLE) * $VrQ.0) - 1.0) /
         |             sqrt((2.0 * (2 * $VrQ - 1) * ($VrQ - 1) / (3.0 * $VrQ)) /
         |                  CAST(nq AS DOUBLE)), 6) AS z
         |FROM m
         |WHERE n1 * saa - sa * sa > 0""".stripMargin)
}
