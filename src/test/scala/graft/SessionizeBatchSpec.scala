package graft

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType, TimestampType}

import graft.relational.EventOpsQueries

/** Planted gap patterns for batch sessionization: events exactly at /
  * beyond / under the 30-minute gap split where they should, and the
  * per-session stats are exact.
  */
class SessionizeBatchSpec extends SparkSpec {

  private def ev(rows: Seq[(Long, Long, String)]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (u, id, t) =>
        Row(u, id, Timestamp.valueOf(t)) }, 2),
      StructType(Seq(
        StructField("user_id", LongType),
        StructField("event_id", LongType),
        StructField("ts", TimestampType))))

  test("gap boundaries split sessions exactly") {
    // User 1: 10:00, 10:29, then EXACTLY 30:00 later (same session — the
    // predicate is strict >), then 30:00.000001 later (new session).
    val rows = Seq[(Long, Long, String)](
      (1L, 1L, "2024-01-01 10:00:00"),
      (1L, 2L, "2024-01-01 10:29:00"),
      (1L, 3L, "2024-01-01 10:59:00"),
      (1L, 4L, "2024-01-01 11:29:00.000001"),
      (2L, 5L, "2024-01-01 09:00:00"))
    val got =
      try EventOpsQueries.sessionizeBatchOf(ev(rows))
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(5)))
        .toMap
      finally CacheScope.releaseAll()
    // user 1 session 1: events 1-3 spanning 59 min; session 2: event 4.
    assert(got == Map(
      (1L, 1L) -> ((3L, 3540000000L)),
      (1L, 2L) -> ((1L, 0L)),
      (2L, 1L) -> ((1L, 0L))), s"got $got")
  }
}
