package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}
import InferenceQueries.{cents, withHalf, FisherSample, CentsSql, HalfSql}

/** Effect-size and experiment-design companions to the hypothesis tests
  * in [[InferenceQueries]]: the odds ratio with its Woolf logit CI, the
  * two-proportion power / sample-size calculator, Cohen's d, and the
  * two-proportion z-test. A p-value at 100 TB is always ~0 (everything is
  * "significant" at n=1e12); these are the numbers that still mean
  * something at that scale, which is why they ship as their own pack.
  * Shares [[InferenceQueries]]'s exact-cents pinning and epoch-midpoint
  * half split; the same determinism discipline applies (exact integers
  * order and select, doubles only in final pinned closed forms).
  */
object InferenceEffectQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Standard-normal quantiles for q_stats_power: z_{0.025} (two-sided
    * alpha=0.05) and z_{0.2} (80% power) — compile-time literals shared
    * verbatim with the oracle SQL.
    */
  val PowerZAlpha = 1.959964
  val PowerZBeta = 0.841621

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Odds ratio with the Woolf logit CI on the SAME bounded 2×2 as
    // q_stats_fisher_exact — the effect-size companion to that test's
    // p-value (a tiny p with OR ≈ 1 is a large-sample artifact; the CI
    // says whether the association is material). Cells are exact
    // integers; ln(OR) and se ride identical IEEE operands, the CI
    // endpoints pin exp at 4dp (the perplexity discipline).
    "q_stats_oddsratio" -> ((s, d) => {
      val o = t(s, d, "events")
        .filter(col("event_id") < FisherSample)
        .select((col("event_type") === "purchase").cast("long").as("x"),
          (col("value") >= 50.0).cast("long").as("y"))
      val m = o.agg(count(lit(1)).as("n"),
          sum(col("x") * col("y")).as("a"),
          sum(col("x") * (lit(1L) - col("y"))).as("b"),
          sum((lit(1L) - col("x")) * col("y")).as("c"),
          sum((lit(1L) - col("x")) * (lit(1L) - col("y"))).as("dd"))
        .filter(col("a") > 0 && col("b") > 0 && col("c") > 0 && col("dd") > 0)
      val or0 = (col("a") * col("dd")).cast("double") /
        (col("b") * col("c")).cast("double")
      val se0 = sqrt(lit(1.0) / col("a") + lit(1.0) / col("b") +
        lit(1.0) / col("c") + lit(1.0) / col("dd"))
      m.select(col("n"), col("a"), col("b"), col("c"), col("dd").as("d"),
        round(or0, 6).as("odds_ratio"),
        round(log(or0), 6).as("log_or"),
        round(se0, 6).as("se_log_or"),
        round(exp(log(or0) - lit(1.96) * se0), 4).as("ci_lo"),
        round(exp(log(or0) + lit(1.96) * se0), 4).as("ci_hi"))
    }),

    // Power analysis / sample-size calculator for the two-proportion
    // test — the experiment-design step BEFORE q_stats_two_prop runs:
    // given the observed purchase vs click conversion-to-high-value
    // rates, the minimum n per arm to detect that difference at
    // α=0.05 (two-sided) with 80% power is
    // n = (z_α/2+z_β)²·(p1q1+p2q2)/Δ². The z quantiles are compile-time
    // literals (identical in both engines); the p's are exact rationals
    // from one bounded aggregation; ceil of the one shared double is
    // the released integer.
    "q_stats_power" -> ((s, d) => {
      val ev = t(s, d, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .select((col("event_type") === "purchase").as("g1"),
          (col("value") >= 50.0).cast("long").as("y"))
      val agg = ev.agg(
        sum(when(col("g1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("g1"), col("y")).otherwise(0L)).as("x1"),
        sum(when(!col("g1"), 1L).otherwise(0L)).as("n2"),
        sum(when(!col("g1"), col("y")).otherwise(0L)).as("x2"))
        .filter(col("n1") > 0 && col("n2") > 0)
      val p1 = col("x1").cast("double") / col("n1").cast("double")
      val p2 = col("x2").cast("double") / col("n2").cast("double")
      agg.select(col("n1"), col("x1"), col("n2"), col("x2"),
          round(p1, 6).as("p1"), round(p2, 6).as("p2"),
          round(p1 - p2, 6).as("delta"),
          (p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2)).as("vsum0"),
          ((p1 - p2) * (p1 - p2)).as("d20"))
        .filter(col("d20") > 0)
        .select(col("n1"), col("x1"), col("n2"), col("x2"),
          col("p1"), col("p2"), col("delta"),
          ceil(lit((PowerZAlpha + PowerZBeta) * (PowerZAlpha + PowerZBeta)) *
            col("vsum0") / col("d20")).cast("long").as("n_per_arm"))
    }),

    // Cohen's d per event type: the standardized first-half vs
    // second-half mean shift — the effect size behind q_stats_ttest's
    // significance answer, and the threshold a retraining trigger should
    // gate on instead of a p-value (same rationale as Cramér's V at
    // scale). Variances from exact cents sums; pooled sd and d on
    // identical doubles; means reported in currency units. Scale shape:
    // one 1-row range broadcast + one events-sized agg to type×half.
    "q_stats_cohens_d" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"), unix_micros(col("ts")).as("us"),
          cents(col("value")).as("c"))
      val h = withHalf(ev)
        .groupBy("event_type")
        .agg(
          sum(when(col("first_half"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("first_half"), col("c")).otherwise(0L)).as("t1"),
          sum(when(col("first_half"), col("c") * col("c")).otherwise(0L)).as("q1"),
          sum(when(col("first_half"), 0L).otherwise(1L)).as("n2"),
          sum(when(col("first_half"), 0L).otherwise(col("c"))).as("t2"),
          sum(when(col("first_half"), 0L).otherwise(col("c") * col("c"))).as("q2"))
        .filter(col("n1") >= 2 && col("n2") >= 2)
      val v1 = (col("n1").cast("double") * col("q1").cast("double") -
        col("t1").cast("double") * col("t1").cast("double")) /
        (col("n1").cast("double") * (col("n1").cast("double") - 1))
      val v2 = (col("n2").cast("double") * col("q2").cast("double") -
        col("t2").cast("double") * col("t2").cast("double")) /
        (col("n2").cast("double") * (col("n2").cast("double") - 1))
      val sp2 = ((col("n1").cast("double") - 1) * v1 +
        (col("n2").cast("double") - 1) * v2) /
        (col("n1").cast("double") + col("n2").cast("double") - 2)
      h.filter(sp2 > 0)
        .select(col("event_type"), col("n1"), col("n2"),
          round(col("t1").cast("double") / col("n1").cast("double") / 100, 4).as("mean_first"),
          round(col("t2").cast("double") / col("n2").cast("double") / 100, 4).as("mean_second"),
          round((col("t2").cast("double") / col("n2").cast("double") -
            col("t1").cast("double") / col("n1").cast("double")) / sqrt(sp2),
            6).as("cohens_d"))
    }),

    // Two-proportion z-test: did the error RATE (share of 'error' events)
    // change between the first and second half of the range? The
    // categorical sibling of q_stats_ttest — exact counts, pooled
    // p-hat, identical-double z, one row out.
    "q_stats_two_prop" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"), unix_micros(col("ts")).as("us"),
          cents(col("value")).as("c"))
      val agg = withHalf(ev).agg(
        sum(when(col("first_half"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("first_half") && col("event_type") === "error", 1L)
          .otherwise(0L)).as("x1"),
        sum(when(col("first_half"), 0L).otherwise(1L)).as("n2"),
        sum(when(!col("first_half") && col("event_type") === "error", 1L)
          .otherwise(0L)).as("x2"))
        .filter(col("n1") > 0 && col("n2") > 0 &&
          col("x1") + col("x2") > 0 && col("x1") + col("x2") < col("n1") + col("n2"))
      val p1 = col("x1").cast("double") / col("n1").cast("double")
      val p2 = col("x2").cast("double") / col("n2").cast("double")
      val ph = (col("x1") + col("x2")).cast("double") /
        (col("n1") + col("n2")).cast("double")
      agg.select(col("n1"), col("x1"), col("n2"), col("x2"),
        round(p1, 6).as("p_first"), round(p2, 6).as("p_second"),
        round((p1 - p2) /
          sqrt(ph * (lit(1) - ph) *
            (lit(1.0) / col("n1").cast("double") + lit(1.0) / col("n2").cast("double"))),
          6).as("z"))
    }),

    // One-way ANCOVA: do the return-flag groups differ in extended price
    // AFTER adjusting for quantity (the covariate)? The textbook
    // closed form — pooled within-group slope b_w = E_xy/E_xx, adjusted
    // means ybar_g - b_w(xbar_g - xbar), and the F test comparing
    // covariate-only vs covariate+group residual SS. Scale shape: ONE
    // lineitem-sized aggregation to k=3 rows of exact DECIMAL moments
    // (cents products routed through DECIMAL(19,0) so 100 TB can't wrap
    // int64 — the DuckDB int128 parity trap); every within-group SS is a
    // per-row double pinned at 6dp and summed in DECIMAL, so partition
    // order can't move a thing. The slope and grand mean are pinned
    // BEFORE the adjusted means consume them — determinism by
    // construction, not by hoping both engines associate identically.
    "q_stats_ancova" -> ((s, d) => {
      val dec = (c: Column) => c.cast(DecimalType(19, 0))
      def d6(c: Column) = round(c, 6).cast(DecimalType(38, 6))
      val li = t(s, d, "lineitem").select(col("l_returnflag").as("rf"),
        cents(col("l_quantity")).as("x"),
        cents(col("l_extendedprice")).as("y"))
      val nd = col("n").cast("double")
      val g = li.groupBy("rf").agg(
          count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(dec(col("x")) * dec(col("x"))).as("sxx"),
          sum(dec(col("x")) * dec(col("y"))).as("sxy"),
          sum(dec(col("y")) * dec(col("y"))).as("syy"))
        .filter(col("n") >= 2)
        .select(col("rf"), col("n"), col("sx"), col("sy"),
          col("sxx"), col("sxy"), col("syy"),
          d6(col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double") / nd).as("wxx"),
          d6(col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double") / nd).as("wxy"),
          d6(col("syy").cast("double") -
            col("sy").cast("double") * col("sy").cast("double") / nd).as("wyy"))
        .transform(graft.CacheScope.persisted(_))
      val ntd = col("nt").cast("double")
      val kd = col("k").cast("double")
      val txx = col("sxxt").cast("double") -
        col("sxt").cast("double") * col("sxt").cast("double") / ntd
      val txy = col("sxyt").cast("double") -
        col("sxt").cast("double") * col("syt").cast("double") / ntd
      val tyy = col("syyt").cast("double") -
        col("syt").cast("double") * col("syt").cast("double") / ntd
      val exx = col("exx").cast("double")
      val exy = col("exy").cast("double")
      val eyy = col("eyy").cast("double")
      val ssew = eyy - exy * exy / exx
      val sset = tyy - txy * txy / txx
      val stats = g.agg(count(lit(1)).as("k"), sum(col("n")).as("nt"),
          sum(col("sx")).as("sxt"), sum(col("sy")).as("syt"),
          sum(col("sxx")).as("sxxt"), sum(col("sxy")).as("sxyt"),
          sum(col("syy")).as("syyt"),
          sum(col("wxx")).as("exx"), sum(col("wxy")).as("exy"),
          sum(col("wyy")).as("eyy"))
        .filter(col("k") >= 2 && col("exx") > 0)
        .select(col("k"), col("nt"),
          round(exy / exx, 6).as("slope"),
          round(col("sxt").cast("double") / ntd, 6).as("grand_mean_x"),
          round(((sset - ssew) / (kd - 1)) / (ssew / (ntd - kd - 1)), 6)
            .as("f_stat"))
      g.crossJoin(broadcast(stats))
        .select(col("rf").as("l_returnflag"), col("n").cast("long").as("n"),
          round(col("sx").cast("double") / nd, 6).as("mean_x"),
          round(col("sy").cast("double") / nd, 6).as("mean_y"),
          round(col("sy").cast("double") / nd -
            col("slope") * (col("sx").cast("double") / nd -
              col("grand_mean_x")), 6).as("adj_mean_y"),
          col("slope"), col("f_stat"))
    }))

  override val oracles: Map[String, String] = Map(

    "q_stats_oddsratio" ->
      s"""WITH o AS (
         |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x,
         |         CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS y
         |  FROM events WHERE event_id < $FisherSample
         |), m AS (
         |  SELECT count(*) AS n,
         |         CAST(sum(x * y) AS BIGINT) AS a,
         |         CAST(sum(x * (1 - y)) AS BIGINT) AS b,
         |         CAST(sum((1 - x) * y) AS BIGINT) AS c,
         |         CAST(sum((1 - x) * (1 - y)) AS BIGINT) AS dd
         |  FROM o
         |), k AS (
         |  SELECT n, a, b, c, dd,
         |         CAST(a * dd AS DOUBLE) / CAST(b * c AS DOUBLE) AS or0,
         |         sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / dd) AS se0
         |  FROM m WHERE a > 0 AND b > 0 AND c > 0 AND dd > 0
         |)
         |SELECT n, a, b, c, dd AS d,
         |       round(or0, 6) AS odds_ratio,
         |       round(ln(or0), 6) AS log_or,
         |       round(se0, 6) AS se_log_or,
         |       round(exp(ln(or0) - 1.96 * se0), 4) AS ci_lo,
         |       round(exp(ln(or0) + 1.96 * se0), 4) AS ci_hi
         |FROM k""".stripMargin,

    "q_stats_power" ->
      s"""WITH ev AS (
         |  SELECT event_type = 'purchase' AS g1,
         |         CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS y
         |  FROM events WHERE event_type IN ('purchase', 'click')
         |), agg AS (
         |  SELECT CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |         CAST(sum(CASE WHEN g1 THEN y ELSE 0 END) AS BIGINT) AS x1,
         |         CAST(sum(CASE WHEN NOT g1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |         CAST(sum(CASE WHEN NOT g1 THEN y ELSE 0 END) AS BIGINT) AS x2
         |  FROM ev
         |), k AS (
         |  SELECT n1, x1, n2, x2,
         |         CAST(x1 AS DOUBLE) / n1 AS p1r,
         |         CAST(x2 AS DOUBLE) / n2 AS p2r
         |  FROM agg WHERE n1 > 0 AND n2 > 0
         |)
         |SELECT n1, x1, n2, x2,
         |       round(p1r, 6) AS p1, round(p2r, 6) AS p2,
         |       round(p1r - p2r, 6) AS delta,
         |       CAST(ceil(($PowerZAlpha + $PowerZBeta) * ($PowerZAlpha + $PowerZBeta) *
         |            (p1r * (1.0 - p1r) + p2r * (1.0 - p2r)) /
         |            ((p1r - p2r) * (p1r - p2r))) AS BIGINT) AS n_per_arm
         |FROM k WHERE (p1r - p2r) * (p1r - p2r) > 0""".stripMargin,

    "q_stats_cohens_d" ->
      s"""$HalfSql, m AS (
         |  SELECT event_type,
         |         sum(CASE WHEN first_half THEN 1 ELSE 0 END) AS n1,
         |         sum(CASE WHEN first_half THEN c ELSE 0 END) AS t1,
         |         sum(CASE WHEN first_half THEN c * c ELSE 0 END) AS q1,
         |         sum(CASE WHEN first_half THEN 0 ELSE 1 END) AS n2,
         |         sum(CASE WHEN first_half THEN 0 ELSE c END) AS t2,
         |         sum(CASE WHEN first_half THEN 0 ELSE c * c END) AS q2
         |  FROM h GROUP BY 1
         |  HAVING n1 >= 2 AND n2 >= 2
         |), v AS (
         |  SELECT event_type, n1, n2, t1, t2,
         |         (CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE) -
         |          CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE)) /
         |         (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1)) AS v1,
         |         (CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE) -
         |          CAST(t2 AS DOUBLE) * CAST(t2 AS DOUBLE)) /
         |         (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1)) AS v2
         |  FROM m
         |), p AS (
         |  SELECT event_type, n1, n2, t1, t2,
         |         ((CAST(n1 AS DOUBLE) - 1) * v1 + (CAST(n2 AS DOUBLE) - 1) * v2) /
         |         (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2) AS sp2
         |  FROM v
         |)
         |SELECT event_type, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         |       round(CAST(t1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100, 4) AS mean_first,
         |       round(CAST(t2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100, 4) AS mean_second,
         |       round((CAST(t2 AS DOUBLE) / CAST(n2 AS DOUBLE) -
         |              CAST(t1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / sqrt(sp2),
         |             6) AS cohens_d
         |FROM p WHERE sp2 > 0""".stripMargin,

    "q_stats_two_prop" ->
      s"""$HalfSql, agg AS (
         |  SELECT sum(CASE WHEN first_half THEN 1 ELSE 0 END) AS n1,
         |         sum(CASE WHEN first_half AND event_type = 'error' THEN 1 ELSE 0 END) AS x1,
         |         sum(CASE WHEN first_half THEN 0 ELSE 1 END) AS n2,
         |         sum(CASE WHEN NOT first_half AND event_type = 'error' THEN 1 ELSE 0 END) AS x2
         |  FROM h
         |)
         |SELECT CAST(n1 AS BIGINT) AS n1, CAST(x1 AS BIGINT) AS x1,
         |       CAST(n2 AS BIGINT) AS n2, CAST(x2 AS BIGINT) AS x2,
         |       round(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS p_first,
         |       round(CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS p_second,
         |       round((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
         |              CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE)) /
         |             sqrt(CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) *
         |                  (1 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) *
         |                  (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))),
         |             6) AS z
         |FROM agg
         |WHERE n1 > 0 AND n2 > 0 AND x1 + x2 > 0 AND x1 + x2 < n1 + n2""".stripMargin,

    "q_stats_ancova" ->
      """WITH li AS (
        |  SELECT l_returnflag AS rf,
        |         CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
        |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem
        |), g0 AS (
        |  SELECT rf, count(*) AS n,
        |         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |         sum(CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0))) AS sxx,
        |         sum(CAST(x AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS sxy,
        |         sum(CAST(y AS DECIMAL(19,0)) * CAST(y AS DECIMAL(19,0))) AS syy
        |  FROM li GROUP BY rf HAVING count(*) >= 2
        |), g AS (
        |  SELECT *,
        |         CAST(round(CAST(sxx AS DOUBLE) -
        |                    CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) /
        |                    CAST(n AS DOUBLE), 6) AS DECIMAL(38,6)) AS wxx,
        |         CAST(round(CAST(sxy AS DOUBLE) -
        |                    CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) /
        |                    CAST(n AS DOUBLE), 6) AS DECIMAL(38,6)) AS wxy,
        |         CAST(round(CAST(syy AS DOUBLE) -
        |                    CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) /
        |                    CAST(n AS DOUBLE), 6) AS DECIMAL(38,6)) AS wyy
        |  FROM g0
        |), tot AS (
        |  SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS nt,
        |         CAST(sum(sx) AS BIGINT) AS sxt, CAST(sum(sy) AS BIGINT) AS syt,
        |         sum(sxx) AS sxxt, sum(sxy) AS sxyt, sum(syy) AS syyt,
        |         sum(wxx) AS exx, sum(wxy) AS exy, sum(wyy) AS eyy
        |  FROM g HAVING count(*) >= 2 AND sum(wxx) > 0
        |), stats AS (
        |  SELECT k, nt,
        |         round(CAST(exy AS DOUBLE) / CAST(exx AS DOUBLE), 6) AS slope,
        |         round(CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE), 6)
        |           AS grand_mean_x,
        |         round((((CAST(syyt AS DOUBLE) -
        |                  CAST(syt AS DOUBLE) * CAST(syt AS DOUBLE) /
        |                  CAST(nt AS DOUBLE)) -
        |                 (CAST(sxyt AS DOUBLE) -
        |                  CAST(sxt AS DOUBLE) * CAST(syt AS DOUBLE) /
        |                  CAST(nt AS DOUBLE)) *
        |                 (CAST(sxyt AS DOUBLE) -
        |                  CAST(sxt AS DOUBLE) * CAST(syt AS DOUBLE) /
        |                  CAST(nt AS DOUBLE)) /
        |                 (CAST(sxxt AS DOUBLE) -
        |                  CAST(sxt AS DOUBLE) * CAST(sxt AS DOUBLE) /
        |                  CAST(nt AS DOUBLE)) -
        |                 (CAST(eyy AS DOUBLE) -
        |                  CAST(exy AS DOUBLE) * CAST(exy AS DOUBLE) /
        |                  CAST(exx AS DOUBLE))) / (CAST(k AS DOUBLE) - 1)) /
        |               ((CAST(eyy AS DOUBLE) -
        |                 CAST(exy AS DOUBLE) * CAST(exy AS DOUBLE) /
        |                 CAST(exx AS DOUBLE)) /
        |                (CAST(nt AS DOUBLE) - CAST(k AS DOUBLE) - 1)), 6)
        |           AS f_stat
        |  FROM tot
        |)
        |SELECT g.rf AS l_returnflag, CAST(g.n AS BIGINT) AS n,
        |       round(CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE), 6) AS mean_x,
        |       round(CAST(g.sy AS DOUBLE) / CAST(g.n AS DOUBLE), 6) AS mean_y,
        |       round(CAST(g.sy AS DOUBLE) / CAST(g.n AS DOUBLE) -
        |             s.slope * (CAST(g.sx AS DOUBLE) / CAST(g.n AS DOUBLE) -
        |                        s.grand_mean_x), 6) AS adj_mean_y,
        |       s.slope, s.f_stat
        |FROM g CROSS JOIN stats s""".stripMargin)
}
