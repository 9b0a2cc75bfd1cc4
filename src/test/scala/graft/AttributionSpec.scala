package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType, TimestampType}

import graft.relational.EventOpsQueries

/** Planted-path checks for U-shaped multi-touch attribution: known credit
  * splits for 1/2/4-touch paths, window exclusion, and the per-purchase
  * credit-sums-to-one invariant.
  */
class AttributionSpec extends SparkSpec {

  private def ts(h: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-10 $h%02d:00:00")

  private def eventsDf(rows: Seq[(Long, Long, String, Timestamp)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (u, id, t, w) =>
        Row(u, id, t, w) }, 2),
      StructType(Seq(
        StructField("user_id", LongType),
        StructField("event_id", LongType),
        StructField("event_type", StringType),
        StructField("ts", TimestampType))))

  // User 1: 4 clicks then a purchase (U-shape 0.4/0.1/0.1/0.4).
  // User 2: 1 click ('only', 1.0). User 3: 2 clicks (0.5/0.5).
  // User 4: click 80h before the purchase — outside the 72h window.
  private val planted = Seq[(Long, Long, String, Timestamp)](
    (1L, 10L, "click", ts(1)), (1L, 11L, "click", ts(2)),
    (1L, 12L, "click", ts(3)), (1L, 13L, "click", ts(4)),
    (1L, 14L, "purchase", ts(5)),
    (2L, 20L, "click", ts(6)), (2L, 21L, "purchase", ts(7)),
    (3L, 30L, "click", ts(8)), (3L, 31L, "click", ts(9)),
    (3L, 32L, "purchase", ts(10)),
    (4L, 40L, "click", Timestamp.valueOf("2024-01-05 00:00:00")),
    (4L, 41L, "purchase", Timestamp.valueOf("2024-01-08 08:00:00")))

  test("planted paths get the exact U-shaped credits") {
    val got =
      try EventOpsQueries.attributionOf(eventsDf(planted))
        .collect().map(r => r.getLong(2) -> (r.getString(3), r.getDouble(4)))
        .toMap
      finally CacheScope.releaseAll()
    val expected = Map(
      10L -> ("first", 0.4), 11L -> ("mid", 0.1), 12L -> ("mid", 0.1),
      13L -> ("last", 0.4),
      20L -> ("only", 1.0),
      30L -> ("first", 0.5), 31L -> ("last", 0.5))
    assert(got == expected, s"got $got")
    assert(!got.contains(40L), "click outside the 72h window must not attribute")
  }

  test("credits sum to 1.0 per purchase") {
    val rows =
      try EventOpsQueries.attributionOf(eventsDf(planted)).collect()
      finally CacheScope.releaseAll()
    rows.groupBy(_.getLong(1)).foreach { case (buy, rs) =>
      val total = rs.map(_.getDouble(4)).sum
      assert(math.abs(total - 1.0) < 1e-9, s"buy $buy credits sum to $total")
    }
  }
}
