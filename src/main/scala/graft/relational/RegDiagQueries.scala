package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}
import InferenceQueries.cents

/** Model-diagnostics kernels: the checks that run AFTER a regression or a
  * survival fit to say whether its assumptions held — serially-independent
  * errors (Durbin–Watson), homoskedastic errors (Breusch–Pagan),
  * non-collinear regressors (VIF), and equal hazards between arms
  * (log-rank). A fit whose diagnostics fail is retrained or re-specified;
  * at 100 TB these run as cheaply as the fit itself because they reuse the
  * same bounded moment relations.
  *
  * Determinism: the shared linreg daily relation is exact DECIMAL
  * (q_stats_linreg's discipline); residuals are fixed-shape double
  * expressions over those exact decimals, round()-pinned BEFORE any re-sum
  * and folded as DECIMAL (pin-before-decimal-sum). Every product keeps at
  * least one operand at DECIMAL width >= 19 so DuckDB computes it in
  * int128 (an int64*int64 decimal multiply overflows there), and combined
  * widths stay <= 38 on both engines.
  */
object RegDiagQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** The q_stats_linreg daily relation + per-type exact moments, joined
    * back so every day row carries its type's fitted line. Values in
    * CURRENCY units (cents/100, still exact at 2dp in DECIMAL) to keep
    * the higher powers the diagnostics need inside DECIMAL range.
    */
  private def dailyFit(s: SparkSession, d: String): DataFrame = {
    val daily = t(s, d, "events")
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum(cents(col("value"))).as("c"))
      .crossJoin(broadcast(t(s, d, "events")
        .agg(min(date_trunc("day", col("ts")).cast("date")).as("d0"))))
      .select(col("event_type"),
        datediff(col("day"), col("d0")).cast(DecimalType(8, 0)).as("ti"),
        col("c").cast(DecimalType(16, 0)).as("y"))
    val m = daily.groupBy(col("event_type").as("et"))
      .agg(count(lit(1)).cast(DecimalType(6, 0)).as("n"),
        sum(col("ti")).cast(DecimalType(19, 0)).as("st"),
        sum(col("y")).cast(DecimalType(19, 0)).as("sy"),
        sum(col("ti") * col("y")).cast(DecimalType(24, 0)).as("sty"),
        sum(col("ti") * col("ti")).cast(DecimalType(19, 0)).as("stt"))
      .filter(col("n") >= 3 && col("n") * col("stt") - col("st") * col("st") > 0)
    val slope = (col("n") * col("sty") - col("st") * col("sy")).cast("double") /
      (col("n") * col("stt") - col("st") * col("st")).cast("double")
    daily.join(broadcast(m), col("event_type") === col("et"))
      .select(col("event_type"), col("ti"), col("n"), col("st"), col("stt"),
        // residual = y - slope*ti - (sy - slope*st)/n, pinned at 6dp: the
        // one derived double that downstream kernels re-sum.
        round((col("y").cast("double") - slope * col("ti").cast("double") -
          (col("sy").cast("double") - slope * col("st").cast("double")) /
            col("n").cast("double")) / 100.0, 6).as("e"))
  }

  private val DailyFitSql =
    """daily AS (
      |  SELECT event_type,
      |         CAST(CAST(CAST(date_trunc('day', ts) AS DATE) -
      |              (SELECT min(CAST(date_trunc('day', ts) AS DATE)) FROM events)
      |              AS INTEGER) AS DECIMAL(8,0)) AS ti,
      |         CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
      |              AS DECIMAL(16,0)) AS y
      |  FROM events GROUP BY event_type, date_trunc('day', ts)
      |), m AS (
      |  SELECT event_type AS et,
      |         CAST(count(*) AS DECIMAL(6,0)) AS n,
      |         CAST(sum(ti) AS DECIMAL(19,0)) AS st,
      |         CAST(sum(y) AS DECIMAL(19,0)) AS sy,
      |         CAST(sum(ti * y) AS DECIMAL(24,0)) AS sty,
      |         CAST(sum(ti * ti) AS DECIMAL(19,0)) AS stt
      |  FROM daily GROUP BY 1
      |  HAVING count(*) >= 3 AND CAST(count(*) AS DECIMAL(6,0)) * CAST(sum(ti * ti) AS DECIMAL(19,0)) -
      |         CAST(sum(ti) AS DECIMAL(19,0)) * CAST(sum(ti) AS DECIMAL(19,0)) > 0
      |), fit AS (
      |  SELECT event_type, ti, n, st, stt,
      |         round((CAST(y AS DOUBLE) -
      |               CAST(n * sty - st * sy AS DOUBLE) /
      |               CAST(n * stt - st * st AS DOUBLE) * CAST(ti AS DOUBLE) -
      |               (CAST(sy AS DOUBLE) -
      |                CAST(n * sty - st * sy AS DOUBLE) /
      |                CAST(n * stt - st * st AS DOUBLE) * CAST(st AS DOUBLE)) /
      |               CAST(n AS DOUBLE)) / 100.0, 6) AS e
      |  FROM daily JOIN m ON event_type = et
      |)""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Durbin–Watson serial-correlation statistic on the daily-trend
    // residuals: DW ~ 2 means independent errors (the OLS trend's се are
    // honest), DW -> 0 means the "trend" is really autocorrelation and
    // q_stats_linreg's inference is overconfident. Consecutive-residual
    // diffs ride a type-partitioned lag window; each squared term is
    // pinned and DECIMAL-folded. Scale: per-type day relations are
    // bounded (~time-range days), the window partitions by type.
    "q_stats_durbin_watson" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type")).orderBy(col("ti").asc)
      val diff = dailyFit(s, d)
        .withColumn("ep", lag(col("e"), 1).over(w))
      diff.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_days"),
          sum(round(col("e") * col("e"), 6).cast(DecimalType(24, 6))).as("see"),
          sum(when(col("ep").isNotNull,
            round((col("e") - col("ep")) * (col("e") - col("ep")), 6)
              .cast(DecimalType(24, 6)))
            .otherwise(lit(BigDecimal(0)).cast(DecimalType(24, 6)))).as("sdd"),
          sum(when(col("ep").isNotNull, round(col("e") * col("ep"), 6)
              .cast(DecimalType(24, 6)))
            .otherwise(lit(BigDecimal(0)).cast(DecimalType(24, 6)))).as("sep"))
        .filter(col("see") > 0)
        .select(col("event_type"), col("n_days"),
          round(col("sdd").cast("double") / col("see").cast("double"), 6).as("dw"),
          round(col("sep").cast("double") / col("see").cast("double"), 6)
            .as("rho1"))
    }),

    // Breusch–Pagan heteroskedasticity test (Koenker form): regress the
    // squared residual on the day index; BP = n * R²(e² ~ t). A large BP
    // means error variance drifts over time — the fit needs weighting or
    // a variance model before its intervals are usable. The auxiliary
    // moments fold pinned terms as DECIMAL; widths keep every cross-
    // engine product int128-backed and <= 38 digits.
    "q_stats_breusch_pagan" -> ((s, d) => {
      val u = dailyFit(s, d)
        .select(col("event_type"), col("ti"), round(col("e") * col("e"), 6).as("pu"))
      val m = u.groupBy(col("event_type"))
        .agg(count(lit(1)).cast(DecimalType(6, 0)).as("n"),
          sum(col("ti")).cast(DecimalType(19, 0)).as("st"),
          sum(col("ti") * col("ti")).cast(DecimalType(19, 0)).as("stt"),
          sum(col("pu").cast(DecimalType(19, 6))).cast(DecimalType(19, 6)).as("su"),
          sum(round(col("ti").cast("double") * col("pu"), 6)
            .cast(DecimalType(24, 6))).cast(DecimalType(24, 6)).as("stu"),
          sum(round(col("pu") * col("pu"), 6).cast(DecimalType(30, 6)))
            .cast(DecimalType(30, 6)).as("suu"))
      val sTT = col("n") * col("stt") - col("st") * col("st")
      val sTU = col("n") * col("stu") - col("st") * col("su")
      // su*su pinned to scale 6 BEFORE subtracting — without it the
      // difference needs precision 39 and Spark's allowPrecisionLoss
      // rescales to a different scale than DuckDB's int128 keeps (the
      // CausalQueries q_causal_cuped note has the full arithmetic;
      // ADVICE r12).
      val sUU = col("n") * col("suu") - round(col("su") * col("su").cast(DecimalType(18, 6)), 6)
      val r2 = sTU.cast("double") * sTU.cast("double") /
        (sTT.cast("double") * sUU.cast("double"))
      m.filter(col("n") >= 3 && sTT > 0 && sUU > 0)
        .select(col("event_type"), col("n").cast("long").as("n_days"),
          round(r2, 6).as("r2_aux"),
          round(col("n").cast("double") * r2, 6).as("bp_stat"))
    }),

    // Variance-inflation factors over the lineitem regressors (quantity,
    // extended price, discount): VIF_j = 1/(1 - R²_j) from the closed-form
    // 3-variable correlation identities — the multicollinearity audit run
    // before trusting any coefficient's sign. One lineitem-sized exact
    // aggregation to a single moment row; the three pairwise correlations
    // are pinned doubles and the VIFs are fixed-shape expressions over
    // those pinned values, so both engines combine identical operands.
    "q_stats_vif" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(
        col("l_quantity").cast(DecimalType(12, 0)).as("q"),
        cents(col("l_extendedprice")).cast(DecimalType(19, 0)).as("p"),
        cents(col("l_discount")).cast(DecimalType(12, 0)).as("dc"))
      val m = li.agg(count(lit(1)).cast(DecimalType(12, 0)).as("n"),
          sum(col("q")).cast(DecimalType(19, 0)).as("sq"),
          sum(col("p")).cast(DecimalType(19, 0)).as("sp"),
          sum(col("dc")).cast(DecimalType(19, 0)).as("sd"),
          sum(col("q") * col("q")).cast(DecimalType(25, 0)).as("sqq"),
          sum(col("p") * col("p")).cast(DecimalType(25, 0)).as("spp"),
          sum(col("dc") * col("dc")).cast(DecimalType(25, 0)).as("sdd"),
          sum(col("q") * col("p")).cast(DecimalType(25, 0)).as("sqp"),
          sum(col("q") * col("dc")).cast(DecimalType(25, 0)).as("sqd"),
          sum(col("p") * col("dc")).cast(DecimalType(25, 0)).as("spd"))
      def cov(sab: String, sa: String, sb: String): Column =
        (col("n") * col(sab) - col(sa) * col(sb)).cast("double")
      def varOk(saa: String, sa: String): Column =
        col("n") * col(saa) - col(sa) * col(sa) > 0
      val r12 = round(cov("sqp", "sq", "sp") /
        sqrt(cov("sqq", "sq", "sq") * cov("spp", "sp", "sp")), 6)
      val r13 = round(cov("sqd", "sq", "sd") /
        sqrt(cov("sqq", "sq", "sq") * cov("sdd", "sd", "sd")), 6)
      val r23 = round(cov("spd", "sp", "sd") /
        sqrt(cov("spp", "sp", "sp") * cov("sdd", "sd", "sd")), 6)
      // R²_j of each regressor on the other two, from the pinned r's —
      // det-based identities of the 3x3 correlation matrix.
      def r2of(rab: Column, rac: Column, rbc: Column): Column =
        (rab * rab + rac * rac - lit(2.0) * rab * rac * rbc) /
          (lit(1.0) - rbc * rbc)
      m.filter(col("n") >= 3 && varOk("sqq", "sq") && varOk("spp", "sp") &&
          varOk("sdd", "sd"))
        .select(col("n").cast("long").as("n_rows"),
          r12.as("r_qty_price"), r13.as("r_qty_disc"), r23.as("r_price_disc"))
        .filter(abs(col("r_price_disc")) < 1.0 &&
          abs(col("r_qty_disc")) < 1.0 && abs(col("r_qty_price")) < 1.0)
        .select(col("n_rows"), col("r_qty_price"), col("r_qty_disc"),
          col("r_price_disc"),
          round(lit(1.0) / (lit(1.0) -
            r2of(col("r_qty_price"), col("r_qty_disc"), col("r_price_disc"))), 6)
            .as("vif_quantity"),
          round(lit(1.0) / (lit(1.0) -
            r2of(col("r_qty_price"), col("r_price_disc"), col("r_qty_disc"))), 6)
            .as("vif_price"),
          round(lit(1.0) / (lit(1.0) -
            r2of(col("r_qty_disc"), col("r_price_disc"), col("r_qty_price"))), 6)
            .as("vif_discount"))
    }),

    // Two-arm log-rank test on time-to-first-conversion (arm = the user
    // bucket; death = the user's first purchase day, right-censored at
    // their last observed day): do the arms convert on the same hazard
    // schedule? O, E and the hypergeometric variance
    // at each death time come from exact at-risk counts built with the
    // constant-size triangular broadcast join (no unpartitioned window);
    // per-time E and V are pinned at 9dp and DECIMAL-folded. Scale: one
    // events-sized agg to per-user rows, then bounded per-day relations.
    // Cook's distance on the daily-trend fit: which single days, if
    // dropped, would move the fitted line the most? The influence audit
    // that catches "the trend is three outlier days" before anyone trusts
    // the slope. Leverage and D are fixed-shape double expressions over
    // the same exact moments as the fit; per-type SSE folds pinned e²
    // terms as DECIMAL; ranking windows partition by type over the
    // bounded day relation. Released: each type's top-3 most influential
    // days.
    "q_stats_cooks_distance" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("cooks_d").desc, col("ti").asc)
      val f = dailyFit(s, d)
      val sse = f.groupBy(col("event_type").as("et2"))
        .agg(sum(round(col("e") * col("e"), 6).cast(DecimalType(24, 6)))
          .as("sse"), count(lit(1)).as("nd"))
        .filter(col("nd") >= 4 && col("sse") > 0)
      val tBar = col("st").cast("double") / col("n").cast("double")
      val sxxC = (col("n") * col("stt") - col("st") * col("st")).cast("double") /
        col("n").cast("double")
      val h = lit(1.0) / col("n").cast("double") +
        (col("ti").cast("double") - tBar) * (col("ti").cast("double") - tBar) / sxxC
      val s2 = col("sse").cast("double") / (col("n").cast("double") - 2.0)
      f.join(broadcast(sse), col("event_type") === col("et2"))
        .select(col("event_type"), col("ti"), col("e"),
          round(h, 6).as("leverage"),
          round(col("e") * col("e") * h /
            (lit(2.0) * s2 * (lit(1.0) - h) * (lit(1.0) - h)), 6).as("cooks_d"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
        .select(col("event_type"), col("ti").cast("long").as("day_idx"),
          col("e").as("residual"), col("leverage"), col("cooks_d"),
          col("rnk"))
    }),

    // Anderson–Darling uniformity test of event TIMING per type: under
    // "events arrive uniformly over the range", the scaled timestamps are
    // U(0,1) and A² stays small; bursty or ramping types blow it up —
    // the arrival-model check behind capacity planning and synthetic-
    // corpus QA. The PIT is an exact integer ratio (smoothed to keep ln
    // off the 0/1 endpoints); each order-statistic term is pinned at 9dp
    // and DECIMAL-folded; the rank window partitions by type.
    "q_stats_anderson_darling" -> ((s, d) => {
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("us").asc, col("event_id").asc)
      val ev = t(s, d, "events")
        .select(col("event_type"), col("event_id"),
          unix_micros(col("ts")).as("us"))
      val rng = ev.agg(min(col("us")).as("us0"), max(col("us")).as("us1"))
      val u = ev.crossJoin(broadcast(rng))
        .select(col("event_type"), col("us"), col("event_id"),
          ((col("us") - col("us0") + 1).cast("double") /
            (col("us1") - col("us0") + 2).cast("double")).as("pit"))
        .withColumn("i", row_number().over(w))
        .withColumn("nn", count(lit(1)).over(
          Window.partitionBy(col("event_type"))))
      u.groupBy(col("event_type"))
        .agg(max(col("nn")).as("n"),
          sum(round((lit(2.0) * col("i").cast("double") - 1.0) *
              log(col("pit")), 9).cast(DecimalType(28, 9))).as("slo"),
          sum(round((lit(2.0) * (col("nn") - col("i")).cast("double") + 1.0) *
              log(lit(1.0) - col("pit")), 9).cast(DecimalType(28, 9))).as("shi"))
        .filter(col("n") >= 2)
        .select(col("event_type"), col("n").as("n_events"),
          round(lit(-1.0) * col("n").cast("double") -
            (col("slo").cast("double") + col("shi").cast("double")) /
              col("n").cast("double"), 6).as("ad_stat"))
    }),

    "q_stats_logrank" -> ((s, d) => {
      val u = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(min(date_trunc("day", col("ts")).cast("date")).as("fd"),
          max(date_trunc("day", col("ts")).cast("date")).as("ld"),
          min(when(col("event_type") === "purchase",
            date_trunc("day", col("ts")).cast("date"))).as("pd"))
        .select((col("user_id") % 2 === 0).as("w"),
          when(col("pd").isNotNull, datediff(col("pd"), col("fd")))
            .otherwise(datediff(col("ld"), col("fd"))).as("lt"),
          col("pd").isNotNull.as("churned"))
      val l = u.groupBy(col("lt"))
        .agg(sum(when(col("churned") && col("w"), 1L).otherwise(0L)).as("d1"),
          sum(when(col("churned"), 1L).otherwise(0L)).as("dd"),
          sum(when(col("w"), 1L).otherwise(0L)).as("a1"),
          count(lit(1)).as("aa"))
        .transform(graft.CacheScope.persisted(_))
      val nr = l
        .join(broadcast(l.select(col("lt").as("t2"), col("a1").as("a12"),
          col("aa").as("aa2"))), col("t2") >= col("lt"))
        .groupBy(col("lt"), col("d1"), col("dd"))
        .agg(sum(col("a12")).as("n1"), sum(col("aa2")).as("n"))
        .filter(col("dd") > 0 && col("n") > 1)
      val e1 = col("dd").cast("double") * col("n1").cast("double") /
        col("n").cast("double")
      val v = e1 * (lit(1.0) - col("n1").cast("double") / col("n").cast("double")) *
        (col("n").cast("double") - col("dd").cast("double")) /
        (col("n").cast("double") - 1.0)
      val tot = nr.agg(count(lit(1)).as("n_times"),
          sum(col("d1")).as("o1"),
          sum(round(e1, 9).cast(DecimalType(24, 9))).as("se"),
          sum(round(v, 9).cast(DecimalType(24, 9))).as("sv"))
        .filter(col("sv") > 0)
      tot.select(col("n_times"), col("o1"),
        round(col("se").cast("double"), 6).as("e1_total"),
        round(col("sv").cast("double"), 6).as("var_total"),
        round((col("o1").cast("double") - col("se").cast("double")) *
          (col("o1").cast("double") - col("se").cast("double")) /
          col("sv").cast("double"), 6).as("logrank_chi2"))
    }))

  override val oracles: Map[String, String] = Map(

    "q_stats_cooks_distance" ->
      s"""WITH $DailyFitSql, sse AS (
         |  SELECT event_type AS et2,
         |         sum(CAST(round(e * e, 6) AS DECIMAL(24,6))) AS sse,
         |         count(*) AS nd
         |  FROM fit GROUP BY 1
         |  HAVING count(*) >= 4 AND sum(CAST(round(e * e, 6) AS DECIMAL(24,6))) > 0
         |), cd AS (
         |  SELECT f.event_type, f.ti, f.e,
         |         round(1.0 / CAST(n AS DOUBLE) +
         |               (CAST(ti AS DOUBLE) - CAST(st AS DOUBLE) / CAST(n AS DOUBLE)) *
         |               (CAST(ti AS DOUBLE) - CAST(st AS DOUBLE) / CAST(n AS DOUBLE)) /
         |               (CAST(n * stt - st * st AS DOUBLE) / CAST(n AS DOUBLE)), 6)
         |           AS leverage,
         |         round(e * e * (1.0 / CAST(n AS DOUBLE) +
         |               (CAST(ti AS DOUBLE) - CAST(st AS DOUBLE) / CAST(n AS DOUBLE)) *
         |               (CAST(ti AS DOUBLE) - CAST(st AS DOUBLE) / CAST(n AS DOUBLE)) /
         |               (CAST(n * stt - st * st AS DOUBLE) / CAST(n AS DOUBLE))) /
         |               (2.0 * (CAST(sse AS DOUBLE) / (CAST(n AS DOUBLE) - 2.0)) *
         |                (1.0 - (1.0 / CAST(n AS DOUBLE) +
         |               (CAST(ti AS DOUBLE) - CAST(st AS DOUBLE) / CAST(n AS DOUBLE)) *
         |               (CAST(ti AS DOUBLE) - CAST(st AS DOUBLE) / CAST(n AS DOUBLE)) /
         |               (CAST(n * stt - st * st AS DOUBLE) / CAST(n AS DOUBLE)))) *
         |                (1.0 - (1.0 / CAST(n AS DOUBLE) +
         |               (CAST(ti AS DOUBLE) - CAST(st AS DOUBLE) / CAST(n AS DOUBLE)) *
         |               (CAST(ti AS DOUBLE) - CAST(st AS DOUBLE) / CAST(n AS DOUBLE)) /
         |               (CAST(n * stt - st * st AS DOUBLE) / CAST(n AS DOUBLE))))), 6)
         |           AS cooks_d
         |  FROM fit f JOIN sse ON f.event_type = et2
         |), rk AS (
         |  SELECT event_type, ti, e, leverage, cooks_d,
         |         row_number() OVER (PARTITION BY event_type
         |                            ORDER BY cooks_d DESC, ti ASC) AS rnk
         |  FROM cd
         |)
         |SELECT event_type, CAST(ti AS BIGINT) AS day_idx, e AS residual,
         |       leverage, cooks_d, rnk
         |FROM rk WHERE rnk <= 3""".stripMargin,

    "q_stats_anderson_darling" ->
      """WITH ev AS (
        |  SELECT event_type, event_id, epoch_us(ts) AS us FROM events
        |), rng AS (
        |  SELECT min(us) AS us0, max(us) AS us1 FROM ev
        |), u AS (
        |  SELECT event_type,
        |         CAST(us - us0 + 1 AS DOUBLE) /
        |         CAST(us1 - us0 + 2 AS DOUBLE) AS pit,
        |         row_number() OVER (PARTITION BY event_type
        |                            ORDER BY us ASC, event_id ASC) AS i,
        |         count(*) OVER (PARTITION BY event_type) AS nn
        |  FROM ev CROSS JOIN rng
        |)
        |SELECT event_type, CAST(max(nn) AS BIGINT) AS n_events,
        |       round(-1.0 * CAST(max(nn) AS DOUBLE) -
        |             (CAST(sum(CAST(round((2.0 * CAST(i AS DOUBLE) - 1.0) * ln(pit), 9)
        |                        AS DECIMAL(28,9))) AS DOUBLE) +
        |              CAST(sum(CAST(round((2.0 * CAST(nn - i AS DOUBLE) + 1.0) * ln(1.0 - pit), 9)
        |                        AS DECIMAL(28,9))) AS DOUBLE)) /
        |             CAST(max(nn) AS DOUBLE), 6) AS ad_stat
        |FROM u GROUP BY 1 HAVING max(nn) >= 2""".stripMargin,

    "q_stats_durbin_watson" ->
      s"""WITH $DailyFitSql, diff AS (
         |  SELECT event_type, e,
         |         lag(e) OVER (PARTITION BY event_type ORDER BY ti ASC) AS ep
         |  FROM fit
         |), agg AS (
         |  SELECT event_type, count(*) AS n_days,
         |         sum(CAST(round(e * e, 6) AS DECIMAL(24,6))) AS see,
         |         sum(CASE WHEN ep IS NOT NULL
         |               THEN CAST(round((e - ep) * (e - ep), 6) AS DECIMAL(24,6))
         |               ELSE CAST(0 AS DECIMAL(24,6)) END) AS sdd,
         |         sum(CASE WHEN ep IS NOT NULL
         |               THEN CAST(round(e * ep, 6) AS DECIMAL(24,6))
         |               ELSE CAST(0 AS DECIMAL(24,6)) END) AS sep
         |  FROM diff GROUP BY 1
         |)
         |SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
         |       round(CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE), 6) AS dw,
         |       round(CAST(sep AS DOUBLE) / CAST(see AS DOUBLE), 6) AS rho1
         |FROM agg WHERE see > 0""".stripMargin,

    "q_stats_breusch_pagan" ->
      s"""WITH $DailyFitSql, u AS (
         |  SELECT event_type, ti, round(e * e, 6) AS pu FROM fit
         |), bm AS (
         |  SELECT event_type,
         |         CAST(count(*) AS DECIMAL(6,0)) AS n,
         |         CAST(sum(ti) AS DECIMAL(19,0)) AS st,
         |         CAST(sum(ti * ti) AS DECIMAL(19,0)) AS stt,
         |         CAST(sum(CAST(pu AS DECIMAL(19,6))) AS DECIMAL(19,6)) AS su,
         |         CAST(sum(CAST(round(CAST(ti AS DOUBLE) * pu, 6) AS DECIMAL(24,6)))
         |              AS DECIMAL(24,6)) AS stu,
         |         CAST(sum(CAST(round(pu * pu, 6) AS DECIMAL(30,6)))
         |              AS DECIMAL(30,6)) AS suu
         |  FROM u GROUP BY 1
         |)
         |SELECT event_type, CAST(n AS BIGINT) AS n_days,
         |       round(CAST(n * stu - st * su AS DOUBLE) * CAST(n * stu - st * su AS DOUBLE) /
         |             (CAST(n * stt - st * st AS DOUBLE) *
         |              CAST(n * suu - round(su * CAST(su AS DECIMAL(18,6)), 6) AS DOUBLE)), 6) AS r2_aux,
         |       round(CAST(n AS DOUBLE) *
         |             CAST(n * stu - st * su AS DOUBLE) * CAST(n * stu - st * su AS DOUBLE) /
         |             (CAST(n * stt - st * st AS DOUBLE) *
         |              CAST(n * suu - round(su * CAST(su AS DECIMAL(18,6)), 6) AS DOUBLE)), 6) AS bp_stat
         |FROM bm
         |WHERE n >= 3 AND n * stt - st * st > 0
         |  AND n * suu - round(su * CAST(su AS DECIMAL(18,6)), 6) > 0""".stripMargin,

    "q_stats_vif" ->
      """WITH li AS (
        |  SELECT CAST(l_quantity AS DECIMAL(12,0)) AS q,
        |         CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)
        |              AS DECIMAL(19,0)) AS p,
        |         CAST(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)
        |              AS DECIMAL(12,0)) AS dc
        |  FROM lineitem
        |), m AS (
        |  SELECT CAST(count(*) AS DECIMAL(12,0)) AS n,
        |         CAST(sum(q) AS DECIMAL(19,0)) AS sq,
        |         CAST(sum(p) AS DECIMAL(19,0)) AS sp,
        |         CAST(sum(dc) AS DECIMAL(19,0)) AS sd,
        |         CAST(sum(q * q) AS DECIMAL(25,0)) AS sqq,
        |         CAST(sum(p * p) AS DECIMAL(25,0)) AS spp,
        |         CAST(sum(dc * dc) AS DECIMAL(25,0)) AS sdd,
        |         CAST(sum(q * p) AS DECIMAL(25,0)) AS sqp,
        |         CAST(sum(q * dc) AS DECIMAL(25,0)) AS sqd,
        |         CAST(sum(p * dc) AS DECIMAL(25,0)) AS spd
        |  FROM li
        |), r AS (
        |  SELECT CAST(n AS BIGINT) AS n_rows,
        |         round(CAST(n * sqp - sq * sp AS DOUBLE) /
        |               sqrt(CAST(n * sqq - sq * sq AS DOUBLE) *
        |                    CAST(n * spp - sp * sp AS DOUBLE)), 6) AS r_qty_price,
        |         round(CAST(n * sqd - sq * sd AS DOUBLE) /
        |               sqrt(CAST(n * sqq - sq * sq AS DOUBLE) *
        |                    CAST(n * sdd - sd * sd AS DOUBLE)), 6) AS r_qty_disc,
        |         round(CAST(n * spd - sp * sd AS DOUBLE) /
        |               sqrt(CAST(n * spp - sp * sp AS DOUBLE) *
        |                    CAST(n * sdd - sd * sd AS DOUBLE)), 6) AS r_price_disc
        |  FROM m
        |  WHERE n >= 3 AND n * sqq - sq * sq > 0 AND n * spp - sp * sp > 0
        |    AND n * sdd - sd * sd > 0
        |)
        |SELECT n_rows, r_qty_price, r_qty_disc, r_price_disc,
        |       round(1.0 / (1.0 - (r_qty_price * r_qty_price + r_qty_disc * r_qty_disc -
        |             2.0 * r_qty_price * r_qty_disc * r_price_disc) /
        |             (1.0 - r_price_disc * r_price_disc)), 6) AS vif_quantity,
        |       round(1.0 / (1.0 - (r_qty_price * r_qty_price + r_price_disc * r_price_disc -
        |             2.0 * r_qty_price * r_price_disc * r_qty_disc) /
        |             (1.0 - r_qty_disc * r_qty_disc)), 6) AS vif_price,
        |       round(1.0 / (1.0 - (r_qty_disc * r_qty_disc + r_price_disc * r_price_disc -
        |             2.0 * r_qty_disc * r_price_disc * r_qty_price) /
        |             (1.0 - r_qty_price * r_qty_price)), 6) AS vif_discount
        |FROM r
        |WHERE abs(r_price_disc) < 1.0 AND abs(r_qty_disc) < 1.0
        |  AND abs(r_qty_price) < 1.0""".stripMargin,

    "q_stats_logrank" ->
      """WITH pu AS (
        |  SELECT user_id,
        |         min(CAST(date_trunc('day', ts) AS DATE)) AS fd,
        |         max(CAST(date_trunc('day', ts) AS DATE)) AS ld,
        |         min(CASE WHEN event_type = 'purchase'
        |               THEN CAST(date_trunc('day', ts) AS DATE) END) AS pd
        |  FROM events GROUP BY user_id
        |), u AS (
        |  SELECT user_id % 2 = 0 AS w,
        |         CAST(COALESCE(pd, ld) - fd AS INTEGER) AS lt,
        |         pd IS NOT NULL AS churned
        |  FROM pu
        |), l AS (
        |  SELECT lt,
        |         CAST(sum(CASE WHEN churned AND w THEN 1 ELSE 0 END) AS BIGINT) AS d1,
        |         CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS dd,
        |         CAST(sum(CASE WHEN w THEN 1 ELSE 0 END) AS BIGINT) AS a1,
        |         count(*) AS aa
        |  FROM u GROUP BY 1
        |), nr AS (
        |  SELECT lt, d1, dd,
        |         CAST(sum(a1) OVER (ORDER BY lt DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n1,
        |         CAST(sum(aa) OVER (ORDER BY lt DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n
        |  FROM l
        |), f AS (
        |  SELECT lt, d1, dd, n1, n FROM nr WHERE dd > 0 AND n > 1
        |), tot AS (
        |  SELECT count(*) AS n_times, CAST(sum(d1) AS BIGINT) AS o1,
        |         sum(CAST(round(CAST(dd AS DOUBLE) * CAST(n1 AS DOUBLE) /
        |               CAST(n AS DOUBLE), 9) AS DECIMAL(24,9))) AS se,
        |         sum(CAST(round(CAST(dd AS DOUBLE) * CAST(n1 AS DOUBLE) /
        |               CAST(n AS DOUBLE) *
        |               (1.0 - CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE)) *
        |               (CAST(n AS DOUBLE) - CAST(dd AS DOUBLE)) /
        |               (CAST(n AS DOUBLE) - 1.0), 9) AS DECIMAL(24,9))) AS sv
        |  FROM f
        |)
        |SELECT n_times, o1,
        |       round(CAST(se AS DOUBLE), 6) AS e1_total,
        |       round(CAST(sv AS DOUBLE), 6) AS var_total,
        |       round((CAST(o1 AS DOUBLE) - CAST(se AS DOUBLE)) *
        |             (CAST(o1 AS DOUBLE) - CAST(se AS DOUBLE)) /
        |             CAST(sv AS DOUBLE), 6) AS logrank_chi2
        |FROM tot WHERE sv > 0""".stripMargin)
}
