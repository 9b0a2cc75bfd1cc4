package graft

import org.apache.spark.sql.functions._

import graft.relational.EventOpsQueries

/** Scalar recomputation of the time-series operators on sf0.001 — the
  * DuckDB hash compare proves cross-engine parity; these prove the FIR
  * and moment math against an independent driver-side implementation.
  */
class TimeSeriesSpec extends SparkSpec {
  import spark.implicits._

  private def r6(x: Double) =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("q_ts_ewma equals a scalar FIR recomputation over the daily series") {
    val out = SparkEntry.queries("q_ts_ewma")(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    CacheScope.releaseAll()
    val daily = Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum(col("value").cast(
        org.apache.spark.sql.types.DecimalType(18, 4))).as("t"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString,
        r.getDecimal(2)))
    CacheScope.releaseAll()
    val weights = (0 until EventOpsQueries.EwmaTaps).map(j =>
      BigDecimal(math.pow(1.0 - EventOpsQueries.EwmaAlpha, j))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP))
    val byType = daily.groupBy(_._1)
    assert(byType.nonEmpty && out.nonEmpty)
    byType.foreach { case (tp, rows) =>
      val series = rows.sortBy(_._2).map(r => BigDecimal(r._3))
      series.indices.foreach { i =>
        val taps = (0 until EventOpsQueries.EwmaTaps).filter(_ <= i)
        val num = taps.map(j => series(i - j) * weights(j)).sum
        val den = taps.map(weights(_)).sum
        val exp = r6(num.toDouble / den.toDouble)
        val (tot, ewma) = out((tp, rows.sortBy(_._2).apply(i)._2))
        assert(tot == series(i).toDouble, s"$tp day $i total")
        assert(ewma == exp, s"$tp day $i: got $ewma expected $exp")
      }
    }
  }

  test("q_ts_zscore flags exactly the |z| >= 3 events of each type") {
    val flagged = SparkEntry.queries("q_ts_zscore")(spark, sfDir)
      .collect()
      .map(r => r.getLong(0) -> ((r.getDouble(2), r.getDouble(3)))).toMap
    CacheScope.releaseAll()
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("event_id"), col("event_type"),
        col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), BigDecimal(r.getDecimal(2))))
    CacheScope.releaseAll()
    val byType = ev.groupBy(_._2)
    val expected = ev.flatMap { case (id, tp, x) =>
      val xs = byType(tp).map(_._3)
      val n = xs.size
      val sx = xs.sum
      val sxx = xs.map(v => v * v).sum
      val varD = (sxx * n - sx * sx).toDouble / (n.toLong * n).toDouble
      val z = r6((x * n - sx).toDouble / (n * math.sqrt(varD)))
      if (math.abs(z) >= 3.0) Some(id -> ((x.toDouble, z))) else None
    }.toMap
    assert(flagged.nonEmpty, "sf0.001 must produce some 3-sigma outliers")
    assert(flagged == expected,
      s"flag sets differ: ${flagged.keySet.diff(expected.keySet)} extra, " +
        s"${expected.keySet.diff(flagged.keySet)} missing")
  }
}
