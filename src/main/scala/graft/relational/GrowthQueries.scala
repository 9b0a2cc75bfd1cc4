package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}

/** Adoption / growth-curve estimators over the user-acquisition series —
  * the models a growth team fits to decide whether acquisition is
  * innovation- or imitation-driven and when it peaks.
  *
  * q_events_bass: the Bass (1969) diffusion model via its exact
  * linearization n_t = a + b·C_{t-1} + c·C²_{t-1} (n_t = new adopters on
  * day t, C = cumulative before t), solved closed-form by Cramer's rule
  * over exact DECIMAL moments; (M, p, q) recover from the PINNED
  * coefficients so both engines gate and transform identical doubles.
  *
  * Scale shape: one events-sized agg to per-user first days, one to the
  * bounded per-day cohort relation; the cumulative-before series uses the
  * constant-size triangular broadcast join (q_events_survival's risk-set
  * pattern — no unpartitioned window); the fit is a single moment row.
  * Moment widths hold to ~1e6 users per the in-code casts — the same
  * documented bench-scale bound as the other quartic kernels; beyond
  * that, pre-scale C by a power of ten.
  */
object GrowthQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "q_events_bass" -> ((s, d) => {
      val ev = t(s, d, "events")
      val d0 = ev.agg(min(date_trunc("day", col("ts")).cast("date")).as("d0"),
        max(date_trunc("day", col("ts")).cast("date")).as("d1"))
      val coh = ev.groupBy(col("user_id"))
        .agg(min(date_trunc("day", col("ts")).cast("date")).as("fd"))
        .crossJoin(broadcast(d0))
        .select(datediff(col("fd"), col("d0")).as("ti"))
        .groupBy(col("ti")).agg(count(lit(1)).as("nt"))
      // full day scaffold: zero-adopter days carry information (the
      // linearization regresses n_t on C, so dropping them biases a).
      val days = d0.select(explode(sequence(lit(0),
        datediff(col("d1"), col("d0")))).as("ti"))
      val full = days.join(coh, Seq("ti"), "left")
        .select(col("ti"), coalesce(col("nt"), lit(0L)).as("n"))
        .transform(graft.CacheScope.persisted(_))
      val cum = full
        .join(broadcast(full.select(col("ti").as("t2"), col("n").as("n2"))),
          col("t2") < col("ti"), "left")
        .groupBy(col("ti"), col("n"))
        .agg(coalesce(sum(col("n2")), lit(0L)).as("c"))
      // exact DECIMAL moments of y = n on (1, C, C²); the chained casts
      // keep every cross-engine product int128-backed and <= 38 digits.
      val x1 = col("c").cast(DecimalType(10, 0))
      val x2c = (x1 * x1).cast(DecimalType(14, 0))
      val yv = col("n").cast(DecimalType(10, 0))
      val m = cum.agg(
        count(lit(1)).cast(DecimalType(6, 0)).as("s0"),
        sum(x1).cast(DecimalType(16, 0)).as("s1"),
        sum(x2c.cast(DecimalType(19, 0))).cast(DecimalType(20, 0)).as("s2"),
        sum((x2c.cast(DecimalType(19, 0)) * x1).cast(DecimalType(30, 0)))
          .cast(DecimalType(26, 0)).as("s3"),
        sum((x2c.cast(DecimalType(19, 0)) * x2c).cast(DecimalType(34, 0)))
          .cast(DecimalType(30, 0)).as("s4"),
        sum(yv).cast(DecimalType(16, 0)).as("sy"),
        sum((x1.cast(DecimalType(19, 0)) * yv).cast(DecimalType(22, 0)))
          .cast(DecimalType(22, 0)).as("sxy"),
        sum((x2c.cast(DecimalType(19, 0)) * yv).cast(DecimalType(26, 0)))
          .cast(DecimalType(26, 0)).as("sx2y"))
      def dd(c: String): Column = col(c).cast("double")
      // Cramer's rule on the 3x3 normal matrix, all in fixed-shape
      // doubles over the exact sums.
      def det3(a1: Column, a2: Column, a3: Column,
          b1: Column, b2: Column, b3: Column,
          c1: Column, c2: Column, c3: Column): Column =
        a1 * (b2 * c3 - b3 * c2) - a2 * (b1 * c3 - b3 * c1) +
          a3 * (b1 * c2 - b2 * c1)
      val dM = det3(dd("s0"), dd("s1"), dd("s2"),
        dd("s1"), dd("s2"), dd("s3"), dd("s2"), dd("s3"), dd("s4"))
      val dA = det3(dd("sy"), dd("s1"), dd("s2"),
        dd("sxy"), dd("s2"), dd("s3"), dd("sx2y"), dd("s3"), dd("s4"))
      val dB = det3(dd("s0"), dd("sy"), dd("s2"),
        dd("s1"), dd("sxy"), dd("s3"), dd("s2"), dd("sx2y"), dd("s4"))
      val dC = det3(dd("s0"), dd("s1"), dd("sy"),
        dd("s1"), dd("s2"), dd("sxy"), dd("s2"), dd("s3"), dd("sx2y"))
      val fit = m.filter(col("s0") >= 4 && abs(dM) > 0.0)
        .select(col("s0").cast("long").as("n_days"),
          round(dA / dM, 9).as("a"), round(dB / dM, 9).as("b"),
          round(dC / dM, 9).as("c"))
      // (M, p, q) from the PINNED coefficients: M is the positive root of
      // c·M² + b·M + a = 0; p = a/M; q = -c·M. Gates on the pinned
      // doubles keep sqrt/division off degenerate inputs in both engines.
      val disc = col("b") * col("b") - lit(4.0) * col("a") * col("c")
      val mHat = (lit(0.0) - col("b") - sqrt(disc)) / (lit(2.0) * col("c"))
      fit.filter(col("a") > 0.0 && col("c") < 0.0 && disc > 0.0)
        .select(col("n_days"), col("a"), col("b"), col("c"),
          round(mHat, 4).as("m_hat"),
          round(col("a") / mHat, 6).as("p_hat"),
          round(lit(0.0) - col("c") * mHat, 6).as("q_hat"))
    }))

  override val oracles: Map[String, String] = Map(

    "q_events_bass" ->
      """WITH d0 AS (
        |  SELECT min(CAST(date_trunc('day', ts) AS DATE)) AS d0,
        |         max(CAST(date_trunc('day', ts) AS DATE)) AS d1
        |  FROM events
        |), coh AS (
        |  SELECT CAST(min(CAST(date_trunc('day', ts) AS DATE)) -
        |              (SELECT d0 FROM d0) AS INTEGER) AS ti,
        |         user_id
        |  FROM events GROUP BY user_id
        |), nt AS (
        |  SELECT ti, CAST(count(*) AS BIGINT) AS n FROM coh GROUP BY 1
        |), days AS (
        |  SELECT unnest(generate_series(0,
        |    CAST((SELECT d1 FROM d0) - (SELECT d0 FROM d0) AS INTEGER))) AS ti
        |), fl AS (
        |  SELECT d.ti, COALESCE(nt.n, 0) AS n
        |  FROM days d LEFT JOIN nt ON nt.ti = d.ti
        |), cum AS (
        |  SELECT f.ti, f.n,
        |         COALESCE((SELECT sum(g.n) FROM fl g WHERE g.ti < f.ti), 0) AS c
        |  FROM fl f
        |), m AS (
        |  SELECT CAST(count(*) AS DECIMAL(6,0)) AS s0,
        |         CAST(sum(CAST(c AS DECIMAL(10,0))) AS DECIMAL(16,0)) AS s1,
        |         CAST(sum(CAST(CAST(CAST(c AS DECIMAL(10,0)) * CAST(c AS DECIMAL(10,0)) AS DECIMAL(14,0)) AS DECIMAL(19,0))) AS DECIMAL(20,0)) AS s2,
        |         CAST(sum(CAST(CAST(CAST(CAST(c AS DECIMAL(10,0)) * CAST(c AS DECIMAL(10,0)) AS DECIMAL(14,0)) AS DECIMAL(19,0)) * CAST(c AS DECIMAL(10,0)) AS DECIMAL(30,0))) AS DECIMAL(26,0)) AS s3,
        |         CAST(sum(CAST(CAST(CAST(CAST(c AS DECIMAL(10,0)) * CAST(c AS DECIMAL(10,0)) AS DECIMAL(14,0)) AS DECIMAL(19,0)) * CAST(CAST(c AS DECIMAL(10,0)) * CAST(c AS DECIMAL(10,0)) AS DECIMAL(14,0)) AS DECIMAL(34,0))) AS DECIMAL(30,0)) AS s4,
        |         CAST(sum(CAST(n AS DECIMAL(10,0))) AS DECIMAL(16,0)) AS sy,
        |         CAST(sum(CAST(CAST(CAST(c AS DECIMAL(10,0)) AS DECIMAL(19,0)) * CAST(n AS DECIMAL(10,0)) AS DECIMAL(22,0))) AS DECIMAL(22,0)) AS sxy,
        |         CAST(sum(CAST(CAST(CAST(CAST(c AS DECIMAL(10,0)) * CAST(c AS DECIMAL(10,0)) AS DECIMAL(14,0)) AS DECIMAL(19,0)) * CAST(n AS DECIMAL(10,0)) AS DECIMAL(26,0))) AS DECIMAL(26,0)) AS sx2y
        |  FROM cum
        |), fit AS (
        |  SELECT CAST(s0 AS BIGINT) AS n_days,
        |         round((CAST(sy AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(s4 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE)) -
        |                CAST(s1 AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(s4 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(sx2y AS DOUBLE)) +
        |                CAST(s2 AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(s3 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sx2y AS DOUBLE))) /
        |               (CAST(s0 AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(s4 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE)) -
        |                CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s4 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s2 AS DOUBLE)) +
        |                CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))), 9) AS a,
        |         round((CAST(s0 AS DOUBLE) * (CAST(sxy AS DOUBLE) * CAST(s4 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(sx2y AS DOUBLE)) -
        |                CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s4 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s2 AS DOUBLE)) +
        |                CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(sx2y AS DOUBLE) - CAST(sxy AS DOUBLE) * CAST(s2 AS DOUBLE))) /
        |               (CAST(s0 AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(s4 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE)) -
        |                CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s4 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s2 AS DOUBLE)) +
        |                CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))), 9) AS b,
        |         round((CAST(s0 AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(sx2y AS DOUBLE) - CAST(sxy AS DOUBLE) * CAST(s3 AS DOUBLE)) -
        |                CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(sx2y AS DOUBLE) - CAST(sxy AS DOUBLE) * CAST(s2 AS DOUBLE)) +
        |                CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))) /
        |               (CAST(s0 AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(s4 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE)) -
        |                CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s4 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s2 AS DOUBLE)) +
        |                CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))), 9) AS c
        |  FROM m
        |  WHERE s0 >= 4 AND
        |        abs(CAST(s0 AS DOUBLE) * (CAST(s2 AS DOUBLE) * CAST(s4 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s3 AS DOUBLE)) -
        |            CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s4 AS DOUBLE) - CAST(s3 AS DOUBLE) * CAST(s2 AS DOUBLE)) +
        |            CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * CAST(s3 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE))) > 0.0
        |)
        |SELECT n_days, a, b, c,
        |       round((0.0 - b - sqrt(b * b - 4.0 * a * c)) / (2.0 * c), 4) AS m_hat,
        |       round(a / ((0.0 - b - sqrt(b * b - 4.0 * a * c)) / (2.0 * c)), 6) AS p_hat,
        |       round(0.0 - c * ((0.0 - b - sqrt(b * b - 4.0 * a * c)) / (2.0 * c)), 6) AS q_hat
        |FROM fit
        |WHERE a > 0.0 AND c < 0.0 AND b * b - 4.0 * a * c > 0.0""".stripMargin)
}
