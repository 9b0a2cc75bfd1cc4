package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}

/** Sequential-decision and calibration operators: Wald's SPRT (the
  * always-valid sequential A/B test that stops the experiment the moment
  * the evidence crosses a boundary, instead of waiting for a fixed n)
  * and isotonic regression (the monotone probability calibration a score
  * consumer runs before thresholding, Zadrozny & Elkan 2002).
  *
  * Scale discipline: SPRT's per-day log-likelihood terms are round(,9)-
  * pinned into exact DECIMAL prefix sums over the calendar-bounded daily
  * relation (the prefix join is days², corpus-size-free). Isotonic uses
  * the MINIMAX closed form fit(k) = max_{i<=k} min_{j>=k} avg(i..j)
  * instead of the sequential PAVA stack — every relation is bounded by
  * the feature DOMAIN (11 discount bands -> 66 intervals), so the whole
  * fit is two tiny aggregations over exact prefix sums, embarrassingly
  * parallel at any corpus size.
  */
object DecisionQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** SPRT hypotheses on the purchase rate: H0 p=0.15 vs H1 p=0.20, with
    * alpha = beta = 0.05 -> boundaries +-ln(19).
    */
  val SprtP0 = 0.15
  val SprtP1 = 0.20

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Wald's sequential probability ratio test, run per md5-parity
    // variant over the event stream day by day: LLR_t = x_t ln(p1/p0) +
    // (n_t - x_t) ln((1-p1)/(1-p0)) accumulates until it exits
    // [-ln 19, +ln 19]. Output: each variant's decision, decision day,
    // and final LLR. The cumulative sum is a prefix equi-join over the
    // per-(variant, day) relation — calendar-bounded, never a window.
    "q_ml_sprt" -> ((s, d) => {
      val lr1 = log(lit(SprtP1) / lit(SprtP0))
      val lr0 = log((lit(1.0) - lit(SprtP1)) / (lit(1.0) - lit(SprtP0)))
      val daily = t(s, d, "events")
        .select(
          (conv(substring(md5(col("user_id").cast("string")), 1, 6), 16, 10)
            .cast("long") % 2).as("variant"),
          date_trunc("day", col("ts")).cast("date").as("day"),
          (col("event_type") === "purchase").cast("long").as("x"))
        .groupBy("variant", "day")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("x"))
        .select(col("variant"), col("day"),
          round(col("x").cast("double") * lr1 +
            (col("n") - col("x")).cast("double") * lr0, 9)
            .cast(DecimalType(24, 9)).as("llr"))
      val b = daily.select(col("variant").as("v2"), col("day").as("d2"),
        col("llr").as("llr2"))
      val cum = daily.join(b, col("variant") === col("v2") && col("d2") <= col("day"))
        .groupBy("variant", "day")
        .agg(sum(col("llr2")).cast(DecimalType(30, 9)).as("cum"))
      val bound = math.log(19.0)
      cum.groupBy("variant")
        .agg(count(lit(1)).as("n_days"),
          min(when(col("cum").cast("double") >= bound, col("day"))).as("up_day"),
          min(when(col("cum").cast("double") <= -bound, col("day"))).as("dn_day"),
          max(struct(col("day"), col("cum"))).as("last"))
        .select(col("variant"), col("n_days"),
          round(col("last.cum").cast("double"), 6).as("llr_final"),
          when(col("up_day").isNotNull &&
              (col("dn_day").isNull || col("up_day") <= col("dn_day")), "accept_h1")
            .when(col("dn_day").isNotNull, "accept_h0")
            .otherwise("continue").as("decision"),
          least(col("up_day"), col("dn_day")).as("decision_day"))
    }),

    // Isotonic (monotone non-decreasing) calibration of the return-flag
    // rate over discount bands, by the exact minimax identity
    // fit(k) = max_{i<=k} min_{j>=k} mean(i..j) — equivalent to PAVA but
    // with NO sequential merge loop: interval means come from exact
    // integer prefix sums (66 intervals over 11 bands), and the two
    // min/max aggregations run over a few hundred rows whatever the
    // corpus size. Means compare as doubles built from exact longs with
    // identical expression shape, so the argmin/argmax are engine-exact.
    "q_ml_isotonic" -> ((s, d) => {
      val bins = t(s, d, "lineitem")
        .groupBy(expr("CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("b"))
        .agg(count(lit(1)).as("w"),
          sum((col("l_returnflag") === "R").cast("long")).as("sr"))
        .transform(graft.CacheScope.persisted(_))
      val pre = bins.as("a").join(broadcast(bins.as("c")), col("c.b") <= col("a.b"))
        .groupBy(col("a.b").as("b"))
        .agg(sum(col("c.sr")).as("pp"), sum(col("c.w")).as("qq"))
      val pre0 = pre.unionByName(
        bins.sparkSession.range(1).select(lit(-1L).as("b"),
          lit(0L).as("pp"), lit(0L).as("qq")))
      val iv = pre0.as("lo").join(broadcast(pre.as("hi")), col("lo.b") < col("hi.b"))
        .select((col("lo.b") + 1).as("i"), col("hi.b").as("j"),
          ((col("hi.pp") - col("lo.pp")).cast("double") /
            (col("hi.qq") - col("lo.qq")).cast("double")).as("avg"))
      val keys = bins.select(col("b").as("k"))
      val mn = iv.join(broadcast(keys), col("i") <= col("k") && col("j") >= col("k"))
        .groupBy("k", "i").agg(min(col("avg")).as("mn"))
      val fit = mn.groupBy("k").agg(max(col("mn")).as("fit"))
      bins.join(fit, col("b") === col("k"))
        .select(col("b").as("disc_band"), col("w").as("n"),
          round(col("sr").cast("double") / col("w").cast("double"), 6).as("p_raw"),
          round(col("fit"), 6).as("p_iso"))
    }))

  override val oracles: Map[String, String] = Map(

    "q_ml_sprt" ->
      s"""WITH daily AS (
         |  SELECT ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 6))::BIGINT % 2
         |           AS variant,
         |         CAST(date_trunc('day', ts) AS DATE) AS day,
         |         CAST(round(CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         |                         AS DOUBLE) * ln($SprtP1 / $SprtP0) +
         |                    CAST(count(*) - sum(CASE WHEN event_type = 'purchase'
         |                                             THEN 1 ELSE 0 END)
         |                         AS DOUBLE) * ln((1.0 - $SprtP1) / (1.0 - $SprtP0)), 9)
         |              AS DECIMAL(24,9)) AS llr
         |  FROM events GROUP BY 1, 2
         |), cum AS (
         |  SELECT a.variant, a.day,
         |         CAST(sum(b.llr) AS DECIMAL(30,9)) AS cum
         |  FROM daily a JOIN daily b
         |    ON b.variant = a.variant AND b.day <= a.day
         |  GROUP BY 1, 2
         |), agg AS (
         |  SELECT variant, count(*) AS n_days,
         |         min(CASE WHEN CAST(cum AS DOUBLE) >= ln(19.0) THEN day END) AS up_day,
         |         min(CASE WHEN CAST(cum AS DOUBLE) <= -ln(19.0) THEN day END) AS dn_day,
         |         max_by(cum, day) AS last_cum
         |  FROM cum GROUP BY 1
         |)
         |SELECT variant, n_days,
         |       round(CAST(last_cum AS DOUBLE), 6) AS llr_final,
         |       CASE WHEN up_day IS NOT NULL AND (dn_day IS NULL OR up_day <= dn_day)
         |              THEN 'accept_h1'
         |            WHEN dn_day IS NOT NULL THEN 'accept_h0'
         |            ELSE 'continue' END AS decision,
         |       least(up_day, dn_day) AS decision_day
         |FROM agg""".stripMargin,

    "q_ml_isotonic" ->
      """WITH bins AS (
        |  SELECT CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS b,
        |         count(*) AS w,
        |         sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS sr
        |  FROM lineitem GROUP BY 1
        |), pre AS (
        |  SELECT a.b, sum(c.sr) AS pp, sum(c.w) AS qq
        |  FROM bins a JOIN bins c ON c.b <= a.b GROUP BY 1
        |), pre0 AS (
        |  SELECT * FROM pre
        |  UNION ALL SELECT -1, 0, 0
        |), iv AS (
        |  SELECT lo.b + 1 AS i, hi.b AS j,
        |         CAST(hi.pp - lo.pp AS DOUBLE) / CAST(hi.qq - lo.qq AS DOUBLE) AS avg
        |  FROM pre0 lo JOIN pre hi ON lo.b < hi.b
        |), mn AS (
        |  SELECT k.b AS k, iv.i, min(iv.avg) AS mn
        |  FROM iv JOIN (SELECT b FROM bins) k
        |    ON iv.i <= k.b AND iv.j >= k.b
        |  GROUP BY 1, 2
        |), fit AS (
        |  SELECT k, max(mn) AS fit FROM mn GROUP BY 1
        |)
        |SELECT bins.b AS disc_band, bins.w AS n,
        |       round(CAST(bins.sr AS DOUBLE) / CAST(bins.w AS DOUBLE), 6) AS p_raw,
        |       round(fit.fit, 6) AS p_iso
        |FROM bins JOIN fit ON fit.k = bins.b""".stripMargin)
}
