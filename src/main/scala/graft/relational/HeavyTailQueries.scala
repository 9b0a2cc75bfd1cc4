package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}

/** Heavy-tail / burstiness diagnostics over `events` — the distributional
  * shape checks behind capacity planning and skew-hardening decisions:
  * the discrete power-law exponent (Clauset-style MLE on per-user
  * activity; α near 2 means the hottest keys dominate and every
  * shuffle-by-user needs the salting playbook), and per-type burstiness
  * (the Goh–Barabási coefficient on inter-arrival gaps plus the Fano
  * factor of hourly counts — Poisson traffic scores ≈0 and 1).
  *
  * Determinism: both statistics reduce to the scale-0 DECIMAL kernel
  * n·Σx² − (Σx)² (single correctly-rounded int→double conversion in both
  * engines) or to decimal sums of round(,9)-pinned ln terms. Scale: one
  * events-sized aggregation each, then |types|-bounded math.
  */
object HeavyTailQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Power-law tail threshold: users with ≥ Xmin events are "in the tail".
    * The continuous-MLE α = 1 + n/Σ ln(x/(Xmin−1/2)) uses the standard
    * half-step discreteness correction.
    */
  val PowerXmin = 2

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Discrete power-law MLE per event type on per-user event counts:
    // α = 1 + n_tail / Σ ln(x / (xmin − 0.5)), σ_α = (α−1)/√n_tail.
    // An α this size of 2 says the per-user key distribution has no
    // variance bound — the quantitative trigger for the salted-join /
    // AQE-skew playbook (q_join_salted_skew). ln terms are round(,9)-
    // pinned and decimal-summed; everything else is exact integers.
    "q_events_powerlaw" -> ((s, d) => {
      val cnt = t(s, d, "events")
        .groupBy(col("event_type"), col("user_id"))
        .agg(count(lit(1)).as("x"))
      cnt.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_users"),
          sum(when(col("x") >= PowerXmin, 1L).otherwise(0L)).as("n_tail"),
          sum(when(col("x") >= PowerXmin,
            round(log(col("x").cast("double") / lit(PowerXmin - 0.5)), 9))
            .otherwise(0.0).cast(DecimalType(20, 9))).cast("double").as("sl"))
        .filter(col("n_tail") > 0 && col("sl") > 0)
        .select(col("event_type"), col("n_users"), col("n_tail"),
          round(lit(1.0) + col("n_tail").cast("double") / col("sl"), 6)
            .as("alpha"),
          round((col("n_tail").cast("double") / col("sl")) /
            sqrt(col("n_tail").cast("double")), 6).as("alpha_se"))
    }),

    // Burstiness per event type: B = (σ−μ)/(σ+μ) over within-user
    // inter-arrival gaps — with D = n·Σg² − (Σg)², this is exactly
    // (√D − Σg)/(√D + Σg), one sqrt on an exact integer — plus the Fano
    // factor (variance/mean) of per-hour event counts. B≈0 and F≈1 is
    // Poisson; B→1 / F≫1 is bursty traffic that needs queue headroom.
    "q_events_burstiness" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type", "user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
      val gap = t(s, d, "events")
        .select(col("event_type"), col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"), col("ts"))
        .withColumn("g", (col("us") - lag(col("us"), 1).over(w))
          .cast(DecimalType(14, 0)))
        .filter(col("g").isNotNull)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast(DecimalType(7, 0)).as("n"),
          sum(col("g")).cast(DecimalType(18, 0)).as("s1"),
          sum(col("g") * col("g")).cast(DecimalType(30, 0)).as("s2"))
        .filter(col("n") > 1 && col("s1") > 0)
        .select(col("event_type"), col("n").cast("long").as("n_gaps"),
          ((col("n") * col("s2") - col("s1") * col("s1")).cast("double"))
            .as("dd"), col("s1").cast("double").as("s1d"))
        .select(col("event_type"), col("n_gaps"),
          round((sqrt(col("dd")) - col("s1d")) /
            (sqrt(col("dd")) + col("s1d")), 6).as("burstiness"))
      val fano = t(s, d, "events")
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
        .agg(count(lit(1)).as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).cast(DecimalType(7, 0)).as("m"),
          sum(col("c").cast(DecimalType(10, 0))).cast(DecimalType(14, 0)).as("q1"),
          sum(col("c").cast(DecimalType(10, 0)) * col("c"))
            .cast(DecimalType(20, 0)).as("q2"))
        .filter(col("m") > 1 && col("q1") > 0)
        .select(col("event_type"), col("m").cast("long").as("n_hours"),
          round((col("m") * col("q2") - col("q1") * col("q1")).cast("double") /
            (col("m").cast("double") * col("q1").cast("double")), 6).as("fano"))
      gap.join(fano, "event_type")
    }))

  override val oracles: Map[String, String] = Map(

    "q_events_powerlaw" ->
      s"""WITH cnt AS (
         |  SELECT event_type, user_id, count(*) AS x
         |  FROM events GROUP BY 1, 2
         |), m AS (
         |  SELECT event_type, count(*) AS n_users,
         |         CAST(sum(CASE WHEN x >= $PowerXmin THEN 1 ELSE 0 END) AS BIGINT) AS n_tail,
         |         CAST(sum(CAST(CASE WHEN x >= $PowerXmin
         |                       THEN round(ln(CAST(x AS DOUBLE) / ${PowerXmin - 0.5}), 9)
         |                       ELSE 0.0 END AS DECIMAL(20,9))) AS DOUBLE) AS sl
         |  FROM cnt GROUP BY 1
         |)
         |SELECT event_type, n_users, n_tail,
         |       round(1.0 + CAST(n_tail AS DOUBLE) / sl, 6) AS alpha,
         |       round((CAST(n_tail AS DOUBLE) / sl) / sqrt(CAST(n_tail AS DOUBLE)), 6) AS alpha_se
         |FROM m WHERE n_tail > 0 AND sl > 0""".stripMargin,

    "q_events_burstiness" ->
      """WITH g AS (
        |  SELECT event_type,
        |         CAST(epoch_us(ts) - lag(epoch_us(ts), 1) OVER
        |           (PARTITION BY event_type, user_id ORDER BY ts, event_id)
        |           AS DECIMAL(14,0)) AS g
        |  FROM events
        |), bm AS (
        |  SELECT event_type, CAST(count(*) AS DECIMAL(7,0)) AS n,
        |         -- DECIMAL(19) forces int128 physical storage; DuckDB
        |         -- multiplies DECIMAL(18) pairs in int64 and overflows.
        |         CAST(sum(g) AS DECIMAL(19,0)) AS s1,
        |         CAST(sum(CAST(g AS DECIMAL(19,0)) * g) AS DECIMAL(30,0)) AS s2
        |  FROM g WHERE g IS NOT NULL GROUP BY 1
        |  HAVING count(*) > 1 AND sum(g) > 0
        |), b AS (
        |  SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
        |         round((sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) - CAST(s1 AS DOUBLE)) /
        |               (sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)) + CAST(s1 AS DOUBLE)), 6) AS burstiness
        |  FROM bm
        |), hc AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hr, count(*) AS c
        |  FROM events GROUP BY 1, 2
        |), fm AS (
        |  SELECT event_type, CAST(count(*) AS DECIMAL(7,0)) AS m,
        |         CAST(sum(CAST(c AS DECIMAL(10,0))) AS DECIMAL(14,0)) AS q1,
        |         CAST(sum(CAST(c AS DECIMAL(10,0)) * CAST(c AS DECIMAL(10,0))) AS DECIMAL(20,0)) AS q2
        |  FROM hc GROUP BY 1 HAVING count(*) > 1 AND sum(c) > 0
        |), f AS (
        |  SELECT event_type, CAST(m AS BIGINT) AS n_hours,
        |         round(CAST(m * q2 - q1 * q1 AS DOUBLE) /
        |               (CAST(m AS DOUBLE) * CAST(q1 AS DOUBLE)), 6) AS fano
        |  FROM fm
        |)
        |SELECT b.event_type, b.n_gaps, b.burstiness, f.n_hours, f.fano
        |FROM b JOIN f ON f.event_type = b.event_type""".stripMargin)
}
