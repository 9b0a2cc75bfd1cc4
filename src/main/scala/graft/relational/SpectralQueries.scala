package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{CacheScope, QueryPack, Tables}
import TimeSeriesQueries.{dailyOf, DailySql}

/** Frequency-domain diagnostics over the daily event series — the
  * periodogram probe, normalized spectral entropy, and the Welch
  * segment-averaged PSD (split from [[TimeSeriesQueries]] per the
  * per-file 1,000-line budget; keys unchanged, the daily relation and
  * its SQL twin stay in the parent object so the two packs cannot
  * drift).
  *
  * Determinism discipline (shared by all three): cos/sin are libm calls
  * that may differ by 1 ulp across engines, so trig VALUES (only
  * |period| distinct angles each) are round(,9)-pinned before
  * multiplying, contributions are round(,4)-pinned, and every sum folds
  * in exact DECIMAL. Scale shape: everything runs on the bounded daily
  * relation (types x calendar days at any corpus size).
  */
object SpectralQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Longest candidate period scanned by the spectral-entropy probe. */
  val SpecMaxPeriod = 16

  /** Welch segment count (the classic variance-reduction dial). */
  val WelchSegments = 4

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Periodogram probe at candidate periods (7 / 14 / 30 days): the
    // spectral sibling of q_ts_acf — amplitude of the Fourier component
    // at each period, 2·|Σ dev_d · e^(iω d)| / n, the direct "how strong
    // is the weekly cycle" gauge a seasonality model reads before picking
    // its period. Runs entirely on the bounded daily relation: per-type
    // means ride a broadcast aggregate, each (day, period) row emits one
    // cos + one sin contribution, and one bounded aggregation finishes.
    "q_ts_periodogram" -> ((s, d) => {
      val daily = dailyOf(t(s, d, "events"))
        .select(col("event_type"),
          datediff(col("day"), to_date(lit("1970-01-01"))).as("ti"), col("c"))
        .transform(CacheScope.persisted(_))
      val st = daily.groupBy("event_type")
        .agg(count(lit(1)).as("nd"), sum(col("c")).as("sumc"))
        .select(col("event_type").as("set"), col("nd"),
          (col("sumc").cast("double") / col("nd").cast("double")).as("mean"))
      val tau = lit(6.283185307179586)
      val per = daily.join(broadcast(st), col("event_type") === col("set"))
        .select(col("event_type"), col("nd"), col("ti"),
          (col("c").cast("double") - col("mean")).as("dev"),
          explode(array(lit(7), lit(14), lit(30))).as("period"))
      val ang = tau * (col("ti") % col("period")).cast("double") /
        col("period").cast("double")
      per.select(col("event_type"), col("period"), col("nd"),
          round(col("dev") * round(cos(ang), 9), 4)
            .cast(DecimalType(24, 4)).as("cc"),
          round(col("dev") * round(sin(ang), 9), 4)
            .cast(DecimalType(24, 4)).as("ss"))
        .groupBy("event_type", "period")
        .agg(max(col("nd")).as("n_days"),
          sum(col("cc")).as("cs"), sum(col("ss")).as("sn"))
        .select(col("event_type"), col("period").cast("long").as("period"),
          col("n_days"),
          round(lit(2.0) * sqrt(col("cs").cast("double") * col("cs").cast("double") +
            col("sn").cast("double") * col("sn").cast("double")) /
            col("n_days").cast("double"), 4).as("amplitude"))
    }),

    // Normalized spectral entropy per event type — ONE number for "is
    // this series periodic or noise": H = −Σ p·ln p over the
    // periodogram's power shares across SpecPeriods candidate periods,
    // divided by ln K (1.0 = flat/white, →0 = one dominant cycle), plus
    // the argmax period. Same pinned-trig discipline as
    // q_ts_periodogram (round(cos,9) factors, round(,4) DECIMAL power
    // sums); the per-type entropy fold runs over a K-row relation with
    // round(,9)-pinned p·ln p terms, and the dominant period is one
    // max(struct) with ties to the SHORTEST period.
    "q_ts_spectral_entropy" -> ((s, d) => {
      val daily = dailyOf(t(s, d, "events"))
        .select(col("event_type"),
          datediff(col("day"), to_date(lit("1970-01-01"))).as("ti"), col("c"))
        .transform(CacheScope.persisted(_))
      val st = daily.groupBy("event_type")
        .agg(count(lit(1)).as("nd"), sum(col("c")).as("sumc"))
        .select(col("event_type").as("set"), col("nd"),
          (col("sumc").cast("double") / col("nd").cast("double")).as("mean"))
      val tau = lit(6.283185307179586)
      val per = daily.join(broadcast(st), col("event_type") === col("set"))
        .select(col("event_type"), col("ti"),
          (col("c").cast("double") - col("mean")).as("dev"),
          explode(expr(s"sequence(2, ${SpecMaxPeriod})")).as("period"))
      val ang = tau * (col("ti") % col("period")).cast("double") /
        col("period").cast("double")
      val pw = per.select(col("event_type"), col("period"),
          round(col("dev") * round(cos(ang), 9), 4)
            .cast(DecimalType(24, 4)).as("cc"),
          round(col("dev") * round(sin(ang), 9), 4)
            .cast(DecimalType(24, 4)).as("ss"))
        .groupBy("event_type", "period")
        .agg(sum(col("cc")).as("cs"), sum(col("ss")).as("sn"))
        .select(col("event_type"), col("period"),
          round(col("cs").cast("double") * col("cs").cast("double") +
            col("sn").cast("double") * col("sn").cast("double"), 4)
            .cast(DecimalType(30, 4)).as("p4"))
        .transform(CacheScope.persisted(_))
      val tot = pw.groupBy(col("event_type").as("tet"))
        .agg(sum(col("p4")).as("tp"), count(lit(1)).as("k"))
      pw.join(broadcast(tot), col("event_type") === col("tet"))
        .filter(col("tp") > 0)
        .select(col("event_type"), col("k"),
          struct(col("p4"), (-col("period")).as("np")).as("cand"),
          round(when(col("p4") > 0,
            -(col("p4").cast("double") / col("tp").cast("double")) *
              log(col("p4").cast("double") / col("tp").cast("double")))
            .otherwise(lit(0.0)), 9)
            .cast(DecimalType(18, 9)).as("h"))
        .groupBy("event_type")
        .agg(first(col("k")).as("k"), max(col("cand")).as("top"),
          sum(col("h")).as("sh"))
        .select(col("event_type"),
          (-col("top.np")).cast("long").as("dominant_period"),
          round(col("sh").cast("double") /
            log(col("k").cast("double")), 6).as("spectral_entropy"))
    }),

    // Welch PSD: the periodogram's variance-reduction upgrade — split
    // each type's daily series into 4 equal time segments, demean and
    // probe each segment separately, and AVERAGE the per-segment powers
    // (Welch 1967; a single periodogram's power estimate has variance
    // equal to its square no matter how long the series runs — averaging
    // independent segments is the fix). Segment assignment is exact
    // integer arithmetic off the per-type time span; per-segment powers
    // are 6dp-pinned and decimal-averaged.
    "q_ts_welch_psd" -> ((s, d) => {
      val daily = dailyOf(t(s, d, "events"))
        .select(col("event_type"),
          datediff(col("day"), to_date(lit("1970-01-01"))).as("ti"), col("c"))
        .transform(CacheScope.persisted(_))
      val span = daily.groupBy(col("event_type").as("set"))
        .agg(min(col("ti")).as("mn"), max(col("ti")).as("mx"))
        .select(col("set"), col("mn"),
          expr(s"CAST((mx - mn + $WelchSegments) div $WelchSegments AS BIGINT)")
            .as("segw"))
      val seg = daily.join(broadcast(span), col("event_type") === col("set"))
        .select(col("event_type"),
          expr("CAST((ti - mn) div segw AS BIGINT)").as("seg"),
          col("ti"), col("c"))
        .transform(CacheScope.persisted(_))
      val st = seg.groupBy(col("event_type").as("set"), col("seg").as("sg"))
        .agg(count(lit(1)).as("nd"), sum(col("c")).as("sumc"))
        .select(col("set"), col("sg"), col("nd"),
          (col("sumc").cast("double") / col("nd").cast("double")).as("mean"))
      val tau = lit(6.283185307179586)
      val per = seg.join(broadcast(st),
          col("event_type") === col("set") && col("seg") === col("sg"))
        .select(col("event_type"), col("seg"), col("nd"), col("ti"),
          (col("c").cast("double") - col("mean")).as("dev"),
          explode(array(lit(7), lit(14), lit(30))).as("period"))
      val ang = tau * (col("ti") % col("period")).cast("double") /
        col("period").cast("double")
      val pw = per.select(col("event_type"), col("seg"), col("period"),
          col("nd"),
          round(col("dev") * round(cos(ang), 9), 4)
            .cast(DecimalType(24, 4)).as("cc"),
          round(col("dev") * round(sin(ang), 9), 4)
            .cast(DecimalType(24, 4)).as("ss"))
        .groupBy("event_type", "seg", "period")
        .agg(max(col("nd")).as("nd"),
          sum(col("cc")).as("cs"), sum(col("ss")).as("sn"))
        .filter(col("nd") >= 2)
        .select(col("event_type"), col("period"),
          round((col("cs").cast("double") * col("cs").cast("double") +
            col("sn").cast("double") * col("sn").cast("double")) /
            (col("nd").cast("double") * col("nd").cast("double")), 6)
            .cast(DecimalType(24, 6)).as("pw"))
      pw.groupBy("event_type", "period")
        .agg(count(lit(1)).as("n_segments"), sum(col("pw")).as("sp"))
        .select(col("event_type"), col("period").cast("long").as("period"),
          col("n_segments"),
          round(col("sp").cast("double") /
            col("n_segments").cast("double"), 6).as("welch_power"))
    }))

  override val oracles: Map[String, String] = Map(

    "q_ts_periodogram" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(day - DATE '1970-01-01' AS INTEGER) AS ti, c
         |  FROM ($DailySql)
         |), st AS (
         |  SELECT event_type, count(*) AS nd,
         |         CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean
         |  FROM daily GROUP BY 1
         |), per AS (
         |  SELECT d.event_type, p.period, s.nd,
         |         CAST(round((CAST(d.c AS DOUBLE) - s.mean) *
         |           round(cos(6.283185307179586 * (d.ti % p.period) / CAST(p.period AS DOUBLE)), 9), 4)
         |           AS DECIMAL(24,4)) AS cc,
         |         CAST(round((CAST(d.c AS DOUBLE) - s.mean) *
         |           round(sin(6.283185307179586 * (d.ti % p.period) / CAST(p.period AS DOUBLE)), 9), 4)
         |           AS DECIMAL(24,4)) AS ss
         |  FROM daily d
         |  JOIN st s ON s.event_type = d.event_type
         |  CROSS JOIN (VALUES (7), (14), (30)) p(period)
         |)
         |SELECT event_type, CAST(period AS BIGINT) AS period,
         |       max(nd) AS n_days,
         |       round(2.0 * sqrt(CAST(sum(cc) AS DOUBLE) * CAST(sum(cc) AS DOUBLE) +
         |                        CAST(sum(ss) AS DOUBLE) * CAST(sum(ss) AS DOUBLE)) /
         |             CAST(max(nd) AS DOUBLE), 4) AS amplitude
         |FROM per GROUP BY 1, 2""".stripMargin,

    "q_ts_spectral_entropy" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(day - DATE '1970-01-01' AS INTEGER) AS ti, c
         |  FROM ($DailySql)
         |), st AS (
         |  SELECT event_type, count(*) AS nd,
         |         CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean
         |  FROM daily GROUP BY 1
         |), per AS (
         |  SELECT d.event_type, p.period,
         |         CAST(round((CAST(d.c AS DOUBLE) - s.mean) *
         |           round(cos(6.283185307179586 * (d.ti % p.period) / CAST(p.period AS DOUBLE)), 9), 4)
         |           AS DECIMAL(24,4)) AS cc,
         |         CAST(round((CAST(d.c AS DOUBLE) - s.mean) *
         |           round(sin(6.283185307179586 * (d.ti % p.period) / CAST(p.period AS DOUBLE)), 9), 4)
         |           AS DECIMAL(24,4)) AS ss
         |  FROM daily d
         |  JOIN st s ON s.event_type = d.event_type
         |  CROSS JOIN (SELECT unnest(generate_series(2, $SpecMaxPeriod)) AS period) p
         |), pw AS (
         |  SELECT event_type, period,
         |         CAST(round(CAST(sum(cc) AS DOUBLE) * CAST(sum(cc) AS DOUBLE) +
         |                    CAST(sum(ss) AS DOUBLE) * CAST(sum(ss) AS DOUBLE), 4)
         |              AS DECIMAL(30,4)) AS p4
         |  FROM per GROUP BY 1, 2
         |), tot AS (
         |  SELECT event_type, sum(p4) AS tp, count(*) AS k
         |  FROM pw GROUP BY 1
         |), h AS (
         |  SELECT pw.event_type, t.k, pw.period, pw.p4,
         |         CAST(round(CASE WHEN pw.p4 > 0 THEN
         |           -(CAST(pw.p4 AS DOUBLE) / CAST(t.tp AS DOUBLE)) *
         |            ln(CAST(pw.p4 AS DOUBLE) / CAST(t.tp AS DOUBLE))
         |           ELSE 0.0 END, 9) AS DECIMAL(18,9)) AS h
         |  FROM pw JOIN tot t ON t.event_type = pw.event_type
         |  WHERE t.tp > 0
         |), dom AS (
         |  SELECT event_type, period AS dominant_period
         |  FROM h
         |  QUALIFY row_number() OVER (PARTITION BY event_type
         |                             ORDER BY p4 DESC, period ASC) = 1
         |)
         |SELECT h.event_type, CAST(d.dominant_period AS BIGINT) AS dominant_period,
         |       round(CAST(sum(h.h) AS DOUBLE) / ln(CAST(max(h.k) AS DOUBLE)), 6)
         |         AS spectral_entropy
         |FROM h JOIN dom d ON d.event_type = h.event_type
         |GROUP BY 1, 2""".stripMargin,

    "q_ts_welch_psd" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(day - DATE '1970-01-01' AS INTEGER) AS ti, c
         |  FROM ($DailySql)
         |), span AS (
         |  SELECT event_type, min(ti) AS mn,
         |         CAST((max(ti) - min(ti) + $WelchSegments) // $WelchSegments
         |              AS BIGINT) AS segw
         |  FROM daily GROUP BY 1
         |), seg AS (
         |  SELECT d.event_type,
         |         CAST((d.ti - sp.mn) // sp.segw AS BIGINT) AS seg,
         |         d.ti, d.c
         |  FROM daily d JOIN span sp ON sp.event_type = d.event_type
         |), st AS (
         |  SELECT event_type, seg, count(*) AS nd,
         |         CAST(sum(c) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean
         |  FROM seg GROUP BY 1, 2
         |), per AS (
         |  SELECT g.event_type, g.seg, s.nd, p.period,
         |         CAST(round((CAST(g.c AS DOUBLE) - s.mean) *
         |           round(cos(6.283185307179586 * (g.ti % p.period) / CAST(p.period AS DOUBLE)), 9), 4)
         |           AS DECIMAL(24,4)) AS cc,
         |         CAST(round((CAST(g.c AS DOUBLE) - s.mean) *
         |           round(sin(6.283185307179586 * (g.ti % p.period) / CAST(p.period AS DOUBLE)), 9), 4)
         |           AS DECIMAL(24,4)) AS ss
         |  FROM seg g
         |  JOIN st s ON s.event_type = g.event_type AND s.seg = g.seg
         |  CROSS JOIN (VALUES (7), (14), (30)) p(period)
         |), pw AS (
         |  SELECT event_type, period,
         |         CAST(round((CAST(sum(cc) AS DOUBLE) * CAST(sum(cc) AS DOUBLE) +
         |                     CAST(sum(ss) AS DOUBLE) * CAST(sum(ss) AS DOUBLE)) /
         |                    (CAST(max(nd) AS DOUBLE) * CAST(max(nd) AS DOUBLE)),
         |                    6) AS DECIMAL(24,6)) AS pw
         |  FROM per GROUP BY event_type, seg, period
         |  HAVING max(nd) >= 2
         |)
         |SELECT event_type, CAST(period AS BIGINT) AS period,
         |       count(*) AS n_segments,
         |       round(CAST(sum(pw) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         |         AS welch_power
         |FROM pw GROUP BY 1, 2""".stripMargin)
}
