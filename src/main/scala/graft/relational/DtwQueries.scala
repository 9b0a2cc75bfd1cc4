package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{CacheScope, QueryPack, Tables}

/** Dynamic Time Warping distance between every pair of event types' daily
  * value series — the shape-similarity measure q_ts_crosscorr's fixed
  * lags cannot give you (a signal that leads by 2 days mid-month and 4
  * days at month-end correlates poorly at EVERY fixed lag but warps
  * cheaply). The alignment-cost matrix is the classic O(n·m) DP, run
  * entirely inside ONE row per type pair.
  *
  * Scale shape: the corpus collapses to the calendar-bounded daily
  * relation (the TimeSeriesQueries contract), so the DP over a
  * (days × days) grid is corpus-size-independent; pairs are |types|²/2
  * rows, each carrying two bounded arrays. For year-scale series the
  * standard Sakoe-Chiba band bounds each DP row — the dial is noted, not
  * needed at calendar-month scale.
  *
  * Determinism: the ENTIRE DP runs on exact int64 — z-scores are computed
  * from exact decimal moments as the all-exact numerator (c·n − sx) over
  * one identical sqrt, scaled by 1e4 and round-pinned to integers, and
  * DTW is then min/plus arithmetic on integers, so both engines must
  * agree bit-for-bit however they order the DP. The oracle cannot express
  * the row-serial DP directly, so it uses the prefix-min closed form
  * newRow[j] = C[j] + min_{k<=j}(M[k] − C[k−1]) (C = cost prefix sums,
  * M[k] = min(P[k], P[k−1])) inside a recursive CTE — algebraically equal
  * integers through a deliberately different algorithm.
  */
object DtwQueries extends QueryPack {

  import TimeSeriesQueries.{dailyOf, DailySql}

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_ts_dtw" -> ((s, d) => {
      val daily = dailyOf(t(s, d, "events"))
        .transform(CacheScope.persisted(_))
      val x = col("c").cast(DecimalType(14, 0))
      val m = daily.groupBy(col("event_type").as("et_m"))
        .agg(count(lit(1)).cast(DecimalType(6, 0)).as("n"),
          sum(x).cast(DecimalType(16, 0)).as("sx"),
          sum(x * x).cast(DecimalType(30, 0)).as("sxx"))
        .filter(col("n") >= 2 &&
          col("n") * col("sxx") - col("sx") * col("sx") > 0)
      // z·1e4 as exact int64: (c·n − sx) / sqrt(n·sxx − sx²) — numerator
      // exact decimal, ONE sqrt+divide on identical operands, one pin.
      val zz = daily.join(broadcast(m), col("event_type") === col("et_m"))
        .select(col("event_type"), col("day"),
          round((x * col("n") - col("sx")).cast("double") * 10000 /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double")), 0).cast("long").as("z"))
      val series = zz.groupBy("event_type")
        .agg(array_sort(collect_list(struct(col("day"), col("z")))).as("zp"))
        .select(col("event_type"),
          expr("transform(zp, p -> p.z)").as("zs"))
        .transform(CacheScope.persisted(_))
      val pairs = series
        .select(col("event_type").as("type_a"), col("zs").as("za"))
        .join(series.select(col("event_type").as("type_b"),
          col("zs").as("zb")), col("type_a") < col("type_b"))
      // Row-serial DP: fold rows i = 2..n_a over the i=1 prefix-sum row;
      // within a row, the j-1 dependency folds left-to-right with an
      // array accumulator. All int64 min/plus.
      val dp = expr(
        """aggregate(
          |  slice(za, 2, size(za) - 1),
          |  transform(sequence(1, size(zb)), j ->
          |    aggregate(slice(zb, 1, j), CAST(0 AS BIGINT),
          |      (a, v) -> a + abs(element_at(za, 1) - v))),
          |  (p, xi) -> aggregate(
          |    sequence(2, size(zb)),
          |    array(element_at(p, 1) + abs(xi - element_at(zb, 1))),
          |    (row, j) -> array_append(row,
          |      abs(xi - element_at(zb, j)) +
          |      least(element_at(p, j), element_at(p, j - 1),
          |            element_at(row, j - 1)))))""".stripMargin)
      pairs.select(col("type_a"), col("type_b"),
          size(col("za")).as("n_a"), size(col("zb")).as("n_b"),
          element_at(dp, size(col("zb"))).as("sc"))
        .select(col("type_a"), col("type_b"),
          col("n_a").cast("long").as("n_a"), col("n_b").cast("long").as("n_b"),
          round(col("sc").cast("double") / 10000.0, 4).as("dtw"),
          round(col("sc").cast("double") /
            ((col("n_a") + col("n_b")).cast("double") * 10000.0), 6)
            .as("dtw_per_step"))
    }),

    // Holt-Winters additive triple smoothing — the model above the
    // forecasting ladder's q_ts_holt rung: level + trend + a 7-slot
    // weekly seasonal state, the classic answer once q_ts_periodogram /
    // q_ts_seasonality confirm a weekly cycle. The inherently sequential
    // recursion runs as ONE ordered array fold per type over the
    // calendar-bounded daily series (the q_ts_holt legality argument);
    // the state struct carries (l, b, s[7], e) with the level update
    // inlined at each use site so both engines evaluate the identical
    // double expression tree. α=0.5, β=0.3, γ=0.3 with prefolded
    // complements; the oracle replays the identical recursion as a
    // per-type recursive CTE carrying the seasonal LIST.
    "q_ts_holtwinters" -> ((s, d) => {
      val daily = dailyOf(t(s, d, "events"))
      val series = daily
        .select(col("event_type"),
          datediff(col("day"), to_date(lit("1970-01-01"))).as("ti"),
          (col("c").cast("double") / lit(100.0)).as("y"))
        .groupBy("event_type")
        .agg(array_sort(collect_list(struct(col("ti"), col("y")))).as("sr"))
      series
        .select(col("event_type"), size(col("sr")).as("n_days"),
          expr("element_at(sr, -1).ti").as("last_ti"),
          expr(
            """aggregate(
              |  slice(sr, 2, size(sr) - 1),
              |  named_struct('l', CAST(element_at(sr, 1).y AS DOUBLE),
              |               'b', CAST(0.0 AS DOUBLE),
              |               's', array(CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
              |                          CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
              |                          CAST(0.0 AS DOUBLE), CAST(0.0 AS DOUBLE),
              |                          CAST(0.0 AS DOUBLE)),
              |               'e', CAST(0.0 AS DOUBLE)),
              |  (acc, o) -> named_struct(
              |    'l', 0.5 * (o.y - element_at(acc.s, CAST(o.ti % 7 AS INT) + 1)) + 0.5 * (acc.l + acc.b),
              |    'b', 0.3 * ((0.5 * (o.y - element_at(acc.s, CAST(o.ti % 7 AS INT) + 1)) + 0.5 * (acc.l + acc.b)) - acc.l) + 0.7 * acc.b,
              |    's', transform(acc.s, (sv, i) ->
              |      CASE WHEN i = CAST(o.ti % 7 AS INT)
              |           THEN 0.3 * (o.y - (0.5 * (o.y - element_at(acc.s, CAST(o.ti % 7 AS INT) + 1)) + 0.5 * (acc.l + acc.b))) + 0.7 * sv
              |           ELSE sv END),
              |    'e', acc.e + abs((acc.l + acc.b + element_at(acc.s, CAST(o.ti % 7 AS INT) + 1)) - o.y)))"""
              .stripMargin).as("st"))
        .select(col("event_type"), col("n_days").cast("long").as("n_days"),
          round(col("st.l"), 6).as("level"),
          round(col("st.b"), 6).as("trend"),
          round(col("st.l") + col("st.b") +
            expr("element_at(st.s, CAST((last_ti + 1) % 7 AS INT) + 1)"), 6)
            .as("forecast_1d"),
          when(col("n_days") > 1,
            round(col("st.e") / (col("n_days") - 1).cast("double"), 6))
            .otherwise(lit(0.0)).as("mae_1step"))
    }),

    // Binary-segmentation changepoints — q_ts_cusum recursed one level:
    // find the level-1 argmax of |D_k| = |n·C_k − k·S|, split the series
    // there, and re-run the same exact-integer CUSUM inside each half
    // (halves shorter than 4 days emit no row). Two changepoints is
    // where step-shaped regime shifts (deploy + rollback) stop fooling
    // the single-cusum reading. Everything runs on the calendar-bounded
    // daily relation with (type, segment)-partitioned windows — never
    // global — and all D_k arithmetic is exact DECIMAL with the
    // (absd desc, earliest day) argmax pinned via max(struct).
    "q_ts_cusum_binseg" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val daily = dailyOf(t(s, d, "events"))
        .transform(CacheScope.persisted(_))
      val epoch = to_date(lit("1970-01-01"))
      def cpOf(dd: DataFrame, keys: Seq[String]): DataFrame = {
        val w = Window.partitionBy(keys.map(col): _*).orderBy("day")
        val wr = w.rowsBetween(Window.unboundedPreceding, 0)
        val cum = dd.select(keys.map(col) :+ col("day") :+
          sum(col("c")).over(wr).as("ck") :+
          row_number().over(w).cast("long").as("k"): _*)
        val tot = dd.groupBy(keys.map(col): _*)
          .agg(sum(col("c")).as("s"), count(lit(1)).as("n"))
        val dk = col("n").cast(DecimalType(10, 0)) * col("ck").cast(DecimalType(20, 0)) -
          col("k").cast(DecimalType(10, 0)) * col("s").cast(DecimalType(20, 0))
        cum.join(tot, keys)
          .select(keys.map(col) :+ col("n") :+
            abs(dk).cast(DecimalType(31, 0)).as("absd") :+
            datediff(col("day"), epoch).as("ti"): _*)
          .groupBy(keys.map(col) :+ col("n"): _*)
          .agg(max(struct(col("absd"), (-col("ti")).as("negti"))).as("m"))
          .select(keys.map(col) :+
            date_add(epoch, -col("m.negti")).as("cp_day") :+
            col("n") :+ col("m.absd").as("absd"): _*)
      }
      val cp1 = cpOf(daily, Seq("event_type"))
        .transform(CacheScope.persisted(_))
      val seg = daily.join(cp1.select(col("event_type"), col("cp_day")),
          "event_type")
        .withColumn("segment",
          when(col("day") <= col("cp_day"), "L").otherwise("R"))
        .select(col("event_type"), col("segment"), col("day"), col("c"))
      val cp2 = cpOf(seg, Seq("event_type", "segment"))
        .filter(col("n") >= 4)
      val stat = round(col("absd").cast("double") /
        (col("n") * 100).cast("double"), 4)
      cp1.select(col("event_type"), lit(1L).as("level"), lit("-").as("segment"),
          col("cp_day").as("change_day"), col("n").as("seg_days"),
          stat.as("stat"))
        .unionByName(cp2.select(col("event_type"), lit(2L).as("level"),
          col("segment"), col("cp_day").as("change_day"),
          col("n").as("seg_days"), stat.as("stat")))
    }),

    // Mann–Kendall trend test (with tau-b) per event type — the
    // distribution-free "is this series trending?" gate that q_stats_linreg's
    // least-squares slope cannot give when the trend is monotone but
    // nonlinear or the noise is heavy-tailed. S = Σ_{i<j} sign(y_j − y_i)
    // over the calendar-bounded daily series; the tie-corrected variance
    // n(n−1)(2n+5) − Σt(t−1)(2t+5) and the tau-b denominator run on exact
    // int64 (n ≤ calendar days keeps every product far under 2^63);
    // doubles only in the final z/tau divisions. Scale shape: the pair
    // join is equi on event_type over the DAILY relation, so its fan-out
    // is calendar² per type, corpus-size-independent (the documented dial
    // for year-scale series is the O(n log n) rank formulation of S).
    "q_ts_mannkendall" -> ((s, d) => {
      val daily = dailyOf(t(s, d, "events"))
        .transform(CacheScope.persisted(_))
      val b = daily.select(col("event_type").as("et2"),
        col("day").as("day2"), col("c").as("c2"))
      val sRel = daily.join(b,
          col("event_type") === col("et2") && col("day") < col("day2"))
        .groupBy("event_type")
        .agg(sum(when(col("c2") > col("c"), 1L)
          .when(col("c2") < col("c"), -1L).otherwise(0L)).as("s_stat"))
      val ties = daily.groupBy(col("event_type"), col("c"))
        .agg(count(lit(1)).as("tt"))
        .groupBy("event_type")
        .agg(sum(col("tt") * (col("tt") - 1) * (col("tt") * 2 + 5)).as("tsum"),
          sum(col("tt") * (col("tt") - 1)).as("t2sum"))
      val cnt = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"))
      val j = cnt.join(broadcast(ties), "event_type")
        .join(broadcast(sRel), "event_type")
        .filter(col("n") >= 5 &&
          col("n") * (col("n") - 1) > col("t2sum"))
      val varS = (col("n") * (col("n") - 1) * (col("n") * 2 + 5) -
        col("tsum")).cast("double") / 18.0
      val nn1 = (col("n") * (col("n") - 1)).cast("double")
      j.select(col("event_type"), col("n").as("n_days"), col("s_stat"),
          round(when(col("s_stat") > 0,
              (col("s_stat") - 1).cast("double") / sqrt(varS))
            .when(col("s_stat") < 0,
              (col("s_stat") + 1).cast("double") / sqrt(varS))
            .otherwise(lit(0.0)), 9).as("z_mk"),
          round(col("s_stat").cast("double") * 2.0 /
            sqrt(nn1 * (nn1 - col("t2sum").cast("double"))), 9).as("tau_b"))
    }),

    // AR(2) fit by Yule–Walker plus a one-step forecast, per event type —
    // the autoregressive rung between q_ts_holt's exponential smoothers
    // (no memory structure) and a full ARIMA: φ1, φ2 from the lag-1/lag-2
    // autocovariances, which fall out of the SAME calendar-lag equi-join
    // pattern as q_ts_acf. Every covariance is cleared of the rational
    // mean by scaling through n² — n²·C_k = n²·S_k − n·Σy·(A_k+B_k) +
    // m_k·(Σy)² — so r1, r2 are ratios of EXACT decimals and doubles
    // appear only in the final φ algebra; φ's are round(,9)-pinned before
    // the forecast uses them, so both engines extrapolate with identical
    // coefficients. Degenerate series (short, constant, or |1−r1²| ≈ 0)
    // are gated out on the same exact decimals.
    "q_ts_ar2" -> ((s, d) => {
      val daily = dailyOf(t(s, d, "events"))
        .transform(CacheScope.persisted(_))
      val dec = DecimalType(16, 0)
      val base = daily.groupBy("event_type")
        .agg(count(lit(1)).cast(DecimalType(6, 0)).as("n"),
          sum(col("c").cast(dec)).cast(dec).as("sy"),
          sum((col("c").cast(dec) * col("c").cast(dec))
            .cast(DecimalType(30, 0))).cast(DecimalType(30, 0)).as("syy"),
          max(col("day")).as("maxday"))
      def lagAgg(k: Int) = {
        val b2 = daily.select(col("event_type").as("et2"),
          col("day").as("day2"), col("c").cast(dec).as("c2"))
        daily.join(b2, col("event_type") === col("et2") &&
            col("day2") === date_add(col("day"), k))
          .groupBy("event_type")
          .agg(count(lit(1)).cast(DecimalType(6, 0)).as(s"m$k"),
            sum((col("c").cast(dec) * col("c2")).cast(DecimalType(30, 0)))
              .cast(DecimalType(30, 0)).as(s"s$k"),
            sum(col("c").cast(dec)).cast(dec).as(s"a$k"),
            sum(col("c2")).cast(dec).as(s"b$k"))
      }
      val last2 = daily.join(
          daily.groupBy(col("event_type").as("et3")).agg(max(col("day")).as("md")),
          col("event_type") === col("et3") &&
            (col("day") === col("md") || col("day") === date_sub(col("md"), 1)))
        .groupBy("event_type")
        .agg(max(when(col("day") === col("md"), col("c"))).as("ylast"),
          max(when(col("day") =!= col("md"), col("c"))).as("yprev"),
          count(lit(1)).as("nlast"))
        .filter(col("nlast") === 2)
      val j = base.join(broadcast(lagAgg(1)), "event_type")
        .join(broadcast(lagAgg(2)), "event_type")
        .join(broadcast(last2), "event_type")
      def dd(c: Column) = c.cast("double")
      val g0 = col("n") * col("n") * col("syy") - col("n") * col("sy") * col("sy")
      def gk(k: Int) = col("n") * col("n") * col(s"s$k") -
        col("n") * col("sy") * (col(s"a$k") + col(s"b$k")) +
        col(s"m$k") * col("sy") * col("sy")
      val r1 = dd(gk(1)) / dd(g0)
      val r2 = dd(gk(2)) / dd(g0)
      val phi1 = round(r1 * (lit(1.0) - r2) / (lit(1.0) - r1 * r1), 9)
      val phi2 = round((r2 - r1 * r1) / (lit(1.0) - r1 * r1), 9)
      val ybar = dd(col("sy")) / dd(col("n"))
      j.filter(col("n") >= 8 && col("m1") >= 2 && col("m2") >= 2 && g0 > 0 &&
          abs(lit(1.0) - r1 * r1) > 1e-9)
        .select(col("event_type"), col("n").cast("long").as("n_days"),
          phi1.as("phi1"), phi2.as("phi2"),
          round((ybar + phi1 * (dd(col("ylast")) - ybar) +
            phi2 * (dd(col("yprev")) - ybar)) / 100.0, 4).as("forecast_1d"))
    }),

    // Unnormalized Haar wavelet decomposition of the first 16 days of
    // each type's daily series — the multi-resolution feature a series
    // compressor or anomaly localizer extracts (which SCALE carries the
    // energy: day-pair jitter vs week-over-week drift). Integer Haar
    // (a = x₀+x₁, d = x₀−x₁ per pair, recursing on the approximations)
    // keeps every coefficient an exact int64, so the pyramid is
    // engine-exact with zero float anywhere. The series rides the same
    // dense-position array as q_ts_dtw (collect per type, calendar-
    // bounded); the four levels are fixed-size array transforms — one
    // narrow map per type, no shuffle beyond the daily aggregation.
    "q_ts_haar" -> ((s, d) => {
      val daily = dailyOf(t(s, d, "events"))
      val series = daily.groupBy("event_type")
        .agg(array_sort(collect_list(struct(col("day"), col("c")))).as("dp"))
        .select(col("event_type"), expr("transform(dp, p -> p.c)").as("xs"))
        .filter(size(col("xs")) >= HaarN)
        .select(col("event_type"), expr(s"slice(xs, 1, $HaarN)").as("a0"))
      val lv = series
        .withColumn("a1", expr(haarPairs("a0", 8, diff = false)))
        .withColumn("d1", expr(haarPairs("a0", 8, diff = true)))
        .withColumn("a2", expr(haarPairs("a1", 4, diff = false)))
        .withColumn("d2", expr(haarPairs("a1", 4, diff = true)))
        .withColumn("a3", expr(haarPairs("a2", 2, diff = false)))
        .withColumn("d3", expr(haarPairs("a2", 2, diff = true)))
        .withColumn("a4", expr(haarPairs("a3", 1, diff = false)))
        .withColumn("d4", expr(haarPairs("a3", 1, diff = true)))
        .transform(CacheScope.persisted(_))
      def coefs(arr: String, level: Int, kind: String): DataFrame =
        lv.select(col("event_type"), lit(level).as("level"), lit(kind).as("kind"),
            posexplode(col(arr)).as(Seq("pos", "coef")))
          .select(col("event_type"), col("level"), col("kind"),
            col("pos").cast("long").as("pos"), col("coef"))
      Seq(coefs("d1", 1, "detail"), coefs("d2", 2, "detail"),
        coefs("d3", 3, "detail"), coefs("d4", 4, "detail"),
        coefs("a4", 4, "approx")).reduce(_ unionByName _)
    }),

    // Matrix profile (w = 7 days) of the daily series: for every window
    // position, the squared Euclidean distance to its nearest
    // NON-TRIVIAL match (|i−j| ≥ w exclusion zone) — the motif/discord
    // primitive (Yeh et al., "Matrix Profile I"): low profile = repeated
    // weekly motif, high profile = discord (anomalous week). Windows are
    // slices of the same dense-position array as q_ts_dtw; the pair
    // relation is an equi-join on event_type over the WINDOW-START
    // relation, so its size is starts² per type — calendar-bounded,
    // corpus-size-independent (year-scale series dial: STOMP's O(n²)
    // incremental dot products ride the identical pair relation).
    // Distances are exact int64 sums of squared cent diffs; the argmin
    // tie-breaks on smallest j via one min(struct) — no window function.
    "q_ts_matrixprofile" -> ((s, d) => {
      val daily = dailyOf(t(s, d, "events"))
      val series = daily.groupBy("event_type")
        .agg(array_sort(collect_list(struct(col("day"), col("c")))).as("dp"))
        .select(col("event_type"), expr("transform(dp, p -> p.c)").as("xs"))
        .filter(size(col("xs")) >= 2 * MpW)
        .transform(CacheScope.persisted(_))
      def starts(side: String) = series
        .select(col("event_type"),
          explode(expr(s"sequence(0, size(xs) - $MpW)")).as(s"i$side"),
          col("xs").as(s"xs$side"))
        .select(col("event_type"), col(s"i$side"),
          expr(s"slice(xs$side, i$side + 1, $MpW)").as(s"w$side"))
      val pairs = starts("a").join(starts("b"), "event_type")
        .filter(abs(col("ia") - col("ib")) >= MpW)
        .select(col("event_type"), col("ia"), col("ib"),
          expr("""aggregate(zip_with(wa, wb, (x, y) -> (x - y) * (x - y)),
                |  CAST(0 AS BIGINT), (acc, v) -> acc + v)""".stripMargin).as("d2"))
      pairs.groupBy(col("event_type"), col("ia").as("pos"))
        .agg(min(struct(col("d2"), col("ib"))).as("m"))
        .select(col("event_type"), col("pos").cast("long").as("pos"),
          col("m.ib").cast("long").as("nn_pos"),
          round(col("m.d2").cast("double") / 1e4, 4).as("nn_dist2"))
    }))

  /** Haar prefix length (2^4 days) — fixed so the pyramid depth is static. */
  val HaarN = 16

  /** Matrix-profile window length (days). */
  val MpW = 7

  /** One Haar level: pairwise sums (approximations) or differences
    * (details) over `m` pairs of `src`. Spark text uses element_at
    * (1-based); the oracle builder emits DuckDB's 1-based `src[i]`.
    */
  private def haarPairs(src: String, m: Int, diff: Boolean): String = {
    val op = if (diff) "-" else "+"
    s"transform(sequence(0, ${m - 1}), " +
      s"p -> element_at($src, 2 * p + 1) $op element_at($src, 2 * p + 2))"
  }

  private def haarPairsSql(src: String, m: Int, diff: Boolean): String = {
    val op = if (diff) "-" else "+"
    s"list_transform(range(0, $m), p -> $src[2 * p + 1] $op $src[2 * p + 2])"
  }

  override val oracles: Map[String, String] = Map(

    "q_ts_dtw" ->
      s"""WITH RECURSIVE daily AS ($DailySql),
         |m AS (
         |  SELECT event_type,
         |         CAST(count(*) AS DECIMAL(6,0)) AS n,
         |         CAST(sum(CAST(c AS DECIMAL(14,0))) AS DECIMAL(16,0)) AS sx,
         |         CAST(sum(CAST(c AS DECIMAL(14,0)) * CAST(c AS DECIMAL(14,0))) AS DECIMAL(30,0)) AS sxx
         |  FROM daily GROUP BY 1
         |  HAVING count(*) >= 2 AND
         |         CAST(count(*) AS DECIMAL(6,0)) *
         |         CAST(sum(CAST(c AS DECIMAL(14,0)) * CAST(c AS DECIMAL(14,0))) AS DECIMAL(30,0)) -
         |         CAST(sum(CAST(c AS DECIMAL(14,0))) AS DECIMAL(16,0)) *
         |         CAST(sum(CAST(c AS DECIMAL(14,0))) AS DECIMAL(16,0)) > 0
         |), zz AS (
         |  SELECT d.event_type, d.day,
         |         CAST(round(CAST(CAST(d.c AS DECIMAL(14,0)) * m.n - m.sx AS DOUBLE) * 10000 /
         |              sqrt(CAST(m.n * m.sxx - m.sx * m.sx AS DOUBLE)), 0) AS BIGINT) AS z
         |  FROM daily d JOIN m ON m.event_type = d.event_type
         |), series AS (
         |  SELECT event_type, list(z ORDER BY day) AS zs FROM zz GROUP BY 1
         |), pairs AS (
         |  SELECT a.event_type AS ta, a.zs AS za, b.event_type AS tb, b.zs AS zb
         |  FROM series a JOIN series b ON a.event_type < b.event_type
         |), r AS (
         |  SELECT ta, tb, za, zb, 1 AS i,
         |         list_transform(range(1, len(zb) + 1), j ->
         |           list_sum(list_transform(range(1, j + 1), t ->
         |             abs(za[1] - zb[t])))) AS p
         |  FROM pairs
         |  UNION ALL
         |  SELECT ta, tb, za, zb, i + 1,
         |         list_transform(range(1, len(zb) + 1), j ->
         |           list_sum(list_transform(range(1, j + 1), t ->
         |             abs(za[i + 1] - zb[t]))) +
         |           list_min(list_transform(range(1, j + 1), k ->
         |             (CASE WHEN k = 1 THEN p[1]
         |                   ELSE least(p[k], p[k - 1]) END) -
         |             COALESCE(list_sum(list_transform(range(1, k), t ->
         |               abs(za[i + 1] - zb[t]))), 0))))
         |  FROM r WHERE i < len(za)
         |)
         |SELECT ta AS type_a, tb AS type_b,
         |       CAST(len(za) AS BIGINT) AS n_a, CAST(len(zb) AS BIGINT) AS n_b,
         |       round(CAST(p[len(zb)] AS DOUBLE) / 10000.0, 4) AS dtw,
         |       round(CAST(p[len(zb)] AS DOUBLE) /
         |             (CAST(len(za) + len(zb) AS DOUBLE) * 10000.0), 6) AS dtw_per_step
         |FROM r WHERE i = len(za)""".stripMargin,

    "q_ts_holtwinters" ->
      s"""WITH RECURSIVE daily AS ($DailySql),
         |idx AS (
         |  SELECT event_type,
         |         CAST(day - DATE '1970-01-01' AS INTEGER) AS ti,
         |         CAST(c AS DOUBLE) / 100.0 AS y,
         |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS k
         |  FROM daily
         |), r AS (
         |  SELECT event_type, k, ti, y AS l, CAST(0.0 AS DOUBLE) AS b,
         |         CAST([0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0] AS DOUBLE[]) AS s,
         |         CAST(0.0 AS DOUBLE) AS e
         |  FROM idx WHERE k = 1
         |  UNION ALL
         |  SELECT i.event_type, i.k, i.ti,
         |         0.5 * (i.y - r.s[(i.ti % 7) + 1]) + 0.5 * (r.l + r.b),
         |         0.3 * ((0.5 * (i.y - r.s[(i.ti % 7) + 1]) + 0.5 * (r.l + r.b)) - r.l) + 0.7 * r.b,
         |         list_transform(range(0, 7), j ->
         |           CASE WHEN j = (i.ti % 7)
         |                THEN 0.3 * (i.y - (0.5 * (i.y - r.s[(i.ti % 7) + 1]) + 0.5 * (r.l + r.b))) + 0.7 * r.s[j + 1]
         |                ELSE r.s[j + 1] END),
         |         r.e + abs((r.l + r.b + r.s[(i.ti % 7) + 1]) - i.y)
         |  FROM r JOIN idx i ON i.event_type = r.event_type AND i.k = r.k + 1
         |), mk AS (
         |  SELECT event_type, max(k) AS mk FROM idx GROUP BY 1
         |)
         |SELECT r.event_type, CAST(m.mk AS BIGINT) AS n_days,
         |       round(r.l, 6) AS level,
         |       round(r.b, 6) AS trend,
         |       round(r.l + r.b + r.s[((r.ti + 1) % 7) + 1], 6) AS forecast_1d,
         |       CASE WHEN m.mk > 1 THEN round(r.e / CAST(m.mk - 1 AS DOUBLE), 6)
         |            ELSE 0.0 END AS mae_1step
         |FROM r JOIN mk m ON m.event_type = r.event_type AND r.k = m.mk""".stripMargin,

    "q_ts_cusum_binseg" ->
      s"""WITH daily AS ($DailySql),
         |cum AS (
         |  SELECT event_type, day,
         |         sum(c) OVER (PARTITION BY event_type ORDER BY day
         |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ck,
         |         row_number() OVER (PARTITION BY event_type ORDER BY day) AS k
         |  FROM daily
         |), tot AS (
         |  SELECT event_type, sum(c) AS s, count(*) AS n FROM daily GROUP BY 1
         |), d1 AS (
         |  SELECT c.event_type, c.day, t.n,
         |         abs(CAST(t.n AS HUGEINT) * c.ck - CAST(c.k AS HUGEINT) * t.s) AS absd
         |  FROM cum c JOIN tot t USING (event_type)
         |), cp1 AS (
         |  SELECT event_type, day AS cp_day, n, absd FROM (
         |    SELECT *, row_number() OVER (PARTITION BY event_type
         |               ORDER BY absd DESC, day ASC) AS rn
         |    FROM d1) WHERE rn = 1
         |), seg AS (
         |  SELECT d.event_type,
         |         CASE WHEN d.day <= p.cp_day THEN 'L' ELSE 'R' END AS segment,
         |         d.day, d.c
         |  FROM daily d JOIN cp1 p USING (event_type)
         |), cum2 AS (
         |  SELECT event_type, segment, day,
         |         sum(c) OVER (PARTITION BY event_type, segment ORDER BY day
         |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ck,
         |         row_number() OVER (PARTITION BY event_type, segment ORDER BY day) AS k
         |  FROM seg
         |), tot2 AS (
         |  SELECT event_type, segment, sum(c) AS s, count(*) AS n
         |  FROM seg GROUP BY 1, 2 HAVING count(*) >= 4
         |), d2 AS (
         |  SELECT c.event_type, c.segment, c.day, t.n,
         |         abs(CAST(t.n AS HUGEINT) * c.ck - CAST(c.k AS HUGEINT) * t.s) AS absd
         |  FROM cum2 c
         |  JOIN tot2 t ON t.event_type = c.event_type AND t.segment = c.segment
         |), cp2 AS (
         |  SELECT event_type, segment, day AS cp_day, n, absd FROM (
         |    SELECT *, row_number() OVER (PARTITION BY event_type, segment
         |               ORDER BY absd DESC, day ASC) AS rn
         |    FROM d2) WHERE rn = 1
         |)
         |SELECT event_type, CAST(1 AS BIGINT) AS level, '-' AS segment,
         |       cp_day AS change_day, CAST(n AS BIGINT) AS seg_days,
         |       round(CAST(absd AS DOUBLE) / CAST(n * 100 AS DOUBLE), 4) AS stat
         |FROM cp1
         |UNION ALL
         |SELECT event_type, CAST(2 AS BIGINT), segment, cp_day, CAST(n AS BIGINT),
         |       round(CAST(absd AS DOUBLE) / CAST(n * 100 AS DOUBLE), 4)
         |FROM cp2""".stripMargin,

    "q_ts_mannkendall" ->
      s"""WITH daily AS ($DailySql),
         |srel AS (
         |  SELECT a.event_type,
         |         CAST(sum(CASE WHEN b.c > a.c THEN 1 WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT) AS s_stat
         |  FROM daily a JOIN daily b
         |    ON b.event_type = a.event_type AND a.day < b.day
         |  GROUP BY 1
         |), ties AS (
         |  SELECT event_type,
         |         sum(tt * (tt - 1) * (2 * tt + 5)) AS tsum,
         |         sum(tt * (tt - 1)) AS t2sum
         |  FROM (SELECT event_type, c, count(*) AS tt FROM daily GROUP BY 1, 2)
         |  GROUP BY 1
         |), cnt AS (
         |  SELECT event_type, count(*) AS n FROM daily GROUP BY 1
         |)
         |SELECT c.event_type, c.n AS n_days, s.s_stat,
         |       round(CASE WHEN s.s_stat > 0
         |                  THEN CAST(s.s_stat - 1 AS DOUBLE) /
         |                       sqrt(CAST(c.n * (c.n - 1) * (2 * c.n + 5) - t.tsum AS DOUBLE) / 18.0)
         |                  WHEN s.s_stat < 0
         |                  THEN CAST(s.s_stat + 1 AS DOUBLE) /
         |                       sqrt(CAST(c.n * (c.n - 1) * (2 * c.n + 5) - t.tsum AS DOUBLE) / 18.0)
         |                  ELSE 0.0 END, 9) AS z_mk,
         |       round(CAST(s.s_stat AS DOUBLE) * 2.0 /
         |             sqrt(CAST(c.n * (c.n - 1) AS DOUBLE) *
         |                  (CAST(c.n * (c.n - 1) AS DOUBLE) - CAST(t.t2sum AS DOUBLE))), 9) AS tau_b
         |FROM cnt c JOIN ties t USING (event_type) JOIN srel s USING (event_type)
         |WHERE c.n >= 5 AND c.n * (c.n - 1) > t.t2sum""".stripMargin,

    "q_ts_ar2" ->
      s"""WITH daily AS ($DailySql),
         |base AS (
         |  SELECT event_type, CAST(count(*) AS DECIMAL(6,0)) AS n,
         |         CAST(sum(CAST(c AS DECIMAL(16,0))) AS DECIMAL(16,0)) AS sy,
         |         CAST(sum(CAST(CAST(c AS DECIMAL(16,0)) * CAST(c AS DECIMAL(16,0)) AS DECIMAL(30,0))) AS DECIMAL(30,0)) AS syy,
         |         max(day) AS maxday
         |  FROM daily GROUP BY 1
         |), lag1 AS (
         |  SELECT a.event_type, CAST(count(*) AS DECIMAL(6,0)) AS m1,
         |         CAST(sum(CAST(CAST(a.c AS DECIMAL(16,0)) * CAST(b.c AS DECIMAL(16,0)) AS DECIMAL(30,0))) AS DECIMAL(30,0)) AS s1,
         |         CAST(sum(CAST(a.c AS DECIMAL(16,0))) AS DECIMAL(16,0)) AS a1,
         |         CAST(sum(CAST(b.c AS DECIMAL(16,0))) AS DECIMAL(16,0)) AS b1
         |  FROM daily a JOIN daily b
         |    ON b.event_type = a.event_type AND b.day = a.day + 1
         |  GROUP BY 1
         |), lag2 AS (
         |  SELECT a.event_type, CAST(count(*) AS DECIMAL(6,0)) AS m2,
         |         CAST(sum(CAST(CAST(a.c AS DECIMAL(16,0)) * CAST(b.c AS DECIMAL(16,0)) AS DECIMAL(30,0))) AS DECIMAL(30,0)) AS s2,
         |         CAST(sum(CAST(a.c AS DECIMAL(16,0))) AS DECIMAL(16,0)) AS a2,
         |         CAST(sum(CAST(b.c AS DECIMAL(16,0))) AS DECIMAL(16,0)) AS b2
         |  FROM daily a JOIN daily b
         |    ON b.event_type = a.event_type AND b.day = a.day + 2
         |  GROUP BY 1
         |), last2 AS (
         |  SELECT d.event_type,
         |         max(CASE WHEN d.day = m.md THEN d.c END) AS ylast,
         |         max(CASE WHEN d.day <> m.md THEN d.c END) AS yprev,
         |         count(*) AS nlast
         |  FROM daily d
         |  JOIN (SELECT event_type, max(day) AS md FROM daily GROUP BY 1) m
         |    ON m.event_type = d.event_type AND (d.day = m.md OR d.day = m.md - 1)
         |  GROUP BY 1 HAVING count(*) = 2
         |), j AS (
         |  SELECT b.*, l1.m1, l1.s1, l1.a1, l1.b1, l2.m2, l2.s2, l2.a2, l2.b2,
         |         z.ylast, z.yprev,
         |         b.n * b.n * b.syy - b.n * b.sy * b.sy AS g0,
         |         b.n * b.n * l1.s1 - b.n * b.sy * (l1.a1 + l1.b1) + l1.m1 * b.sy * b.sy AS g1,
         |         b.n * b.n * l2.s2 - b.n * b.sy * (l2.a2 + l2.b2) + l2.m2 * b.sy * b.sy AS g2
         |  FROM base b JOIN lag1 l1 USING (event_type)
         |  JOIN lag2 l2 USING (event_type) JOIN last2 z USING (event_type)
         |), r AS (
         |  SELECT *, CAST(g1 AS DOUBLE) / CAST(g0 AS DOUBLE) AS r1,
         |         CAST(g2 AS DOUBLE) / CAST(g0 AS DOUBLE) AS r2,
         |         CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar
         |  FROM j
         |), p AS (
         |  SELECT *, round(r1 * (1.0 - r2) / (1.0 - r1 * r1), 9) AS phi1,
         |         round((r2 - r1 * r1) / (1.0 - r1 * r1), 9) AS phi2
         |  FROM r
         |  WHERE n >= 8 AND m1 >= 2 AND m2 >= 2 AND g0 > 0
         |    AND abs(1.0 - r1 * r1) > 1e-9
         |)
         |SELECT event_type, CAST(n AS BIGINT) AS n_days, phi1, phi2,
         |       round((ybar + phi1 * (CAST(ylast AS DOUBLE) - ybar) +
         |              phi2 * (CAST(yprev AS DOUBLE) - ybar)) / 100.0, 4) AS forecast_1d
         |FROM p""".stripMargin,

    "q_ts_haar" ->
      s"""WITH daily AS ($DailySql),
         |series AS (
         |  SELECT event_type, list(CAST(c AS BIGINT) ORDER BY day) AS xs
         |  FROM daily GROUP BY 1
         |), h0 AS (
         |  SELECT event_type, xs[1:$HaarN] AS a0 FROM series WHERE len(xs) >= $HaarN
         |), h1 AS (
         |  SELECT event_type, ${haarPairsSql("a0", 8, diff = false)} AS a1,
         |         ${haarPairsSql("a0", 8, diff = true)} AS d1 FROM h0
         |), h2 AS (
         |  SELECT event_type, ${haarPairsSql("a1", 4, diff = false)} AS a2,
         |         ${haarPairsSql("a1", 4, diff = true)} AS d2, d1 FROM h1
         |), h3 AS (
         |  SELECT event_type, ${haarPairsSql("a2", 2, diff = false)} AS a3,
         |         ${haarPairsSql("a2", 2, diff = true)} AS d3, d1, d2 FROM h2
         |), h4 AS (
         |  SELECT event_type, ${haarPairsSql("a3", 1, diff = false)} AS a4,
         |         ${haarPairsSql("a3", 1, diff = true)} AS d4, d1, d2, d3 FROM h3
         |)
         |SELECT event_type, 1 AS level, 'detail' AS kind,
         |       CAST(generate_subscripts(d1, 1) - 1 AS BIGINT) AS pos,
         |       unnest(d1) AS coef FROM h4
         |UNION ALL
         |SELECT event_type, 2, 'detail',
         |       CAST(generate_subscripts(d2, 1) - 1 AS BIGINT), unnest(d2) FROM h4
         |UNION ALL
         |SELECT event_type, 3, 'detail',
         |       CAST(generate_subscripts(d3, 1) - 1 AS BIGINT), unnest(d3) FROM h4
         |UNION ALL
         |SELECT event_type, 4, 'detail',
         |       CAST(generate_subscripts(d4, 1) - 1 AS BIGINT), unnest(d4) FROM h4
         |UNION ALL
         |SELECT event_type, 4, 'approx',
         |       CAST(generate_subscripts(a4, 1) - 1 AS BIGINT), unnest(a4) FROM h4""".stripMargin,

    "q_ts_matrixprofile" ->
      s"""WITH daily AS ($DailySql),
         |series AS (
         |  SELECT event_type, list(c ORDER BY day) AS xs FROM daily GROUP BY 1
         |  HAVING count(*) >= ${2 * MpW}
         |), starts AS (
         |  SELECT event_type, xs, unnest(range(0, len(xs) - ${MpW - 1})) AS i
         |  FROM series
         |), p AS (
         |  SELECT a.event_type, a.i AS ia, b.i AS ib,
         |         list_sum(list_transform(range(0, $MpW), t ->
         |           (a.xs[a.i + t + 1] - b.xs[b.i + t + 1]) *
         |           (a.xs[a.i + t + 1] - b.xs[b.i + t + 1]))) AS d2
         |  FROM starts a JOIN starts b
         |    ON a.event_type = b.event_type AND abs(a.i - b.i) >= $MpW
         |)
         |SELECT event_type, CAST(ia AS BIGINT) AS pos, CAST(ib AS BIGINT) AS nn_pos,
         |       round(CAST(d2 AS DOUBLE) / 1e4, 4) AS nn_dist2
         |FROM (SELECT *, row_number() OVER (PARTITION BY event_type, ia
         |                                   ORDER BY d2, ib) AS rn FROM p)
         |WHERE rn = 1""".stripMargin)
}
