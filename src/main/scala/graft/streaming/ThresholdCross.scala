package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Stateful threshold-crossing detector (the alerting / budget-cap shape):
  * per user, emit ONE row at the first event where the cumulative value
  * reaches the threshold. The registered `stream_threshold_cross` query is
  * the windowed batch evaluation; this operator is the streaming twin
  * whose whole state is (cumulative total, crossed flag) per key —
  * constant-size however long the stream runs.
  *
  * Exactness: the running total is decimal(18,4) carried as its UNSCALED
  * int64 ([[fromRaw]] does the double->decimal cast in Spark SQL, so both
  * twins share the engine's own rounding); integer addition makes the
  * state order-exact and the crossing point well-defined.
  *
  * Ordering: the scan processes each batch's events in (ts, event_id)
  * order. State carries across micro-batches, so exactness requires
  * per-key event-time-ordered arrival across batches (true for the spec's
  * single availableNow replay, and for log-shipped streams partitioned by
  * key); fully out-of-order streams would need watermark-delayed
  * buffering, which is deliberately out of scope for a crossing ALERT —
  * you want it at first sight, not a watermark later.
  */
object ThresholdCross {

  final case class VEvent(user_id: Long, event_id: Long, ts: Timestamp, vu: Long)
  final case class CrossState(cum: Long, crossed: Boolean)
  final case class CrossOut(user_id: Long, cross_event_id: Long,
      cross_ts: Timestamp, cum_value: Double)

  /** Threshold (StreamingQueries.CrossThreshold) in unscaled 1e-4 units. */
  val ThresholdUnscaled: Long = StreamingQueries.CrossThreshold * 10000L

  private[streaming] def toUs(t: Timestamp): Long =
    t.getTime / 1000 * 1000000 + t.getNanos / 1000

  /** events(user_id, event_id, ts, value) -> typed events with the value
    * as decimal(18,4) unscaled units, cast by Spark itself so the batch
    * query and this operator can never disagree on rounding.
    */
  def fromRaw(df: DataFrame): Dataset[VEvent] = {
    implicit val enc = Encoders.product[VEvent]
    df.select(col("user_id"), col("event_id"), col("ts"),
        (col("value").cast(DecimalType(18, 4)) * 10000).cast("long").as("vu"))
      .as[VEvent]
  }

  /** ONE scan rule shared by the streaming update and any batch check:
    * fold this batch's events (event-time order) into the running state,
    * emitting the crossing if it happens here.
    */
  private[graft] def scan(userId: Long, prev: CrossState,
      events: Seq[VEvent]): (Option[CrossOut], CrossState) = {
    var cum = prev.cum
    var crossed = prev.crossed
    var out: Option[CrossOut] = None
    events.sortBy(e => (toUs(e.ts), e.event_id)).foreach { e =>
      cum += e.vu
      if (!crossed && cum >= ThresholdUnscaled) {
        crossed = true
        out = Some(CrossOut(userId, e.event_id, e.ts,
          new java.math.BigDecimal(java.math.BigInteger.valueOf(cum), 4)
            .doubleValue))
      }
    }
    (out, CrossState(cum, crossed))
  }

  def update(userId: Long, events: Iterator[VEvent],
      state: GroupState[CrossState]): Iterator[CrossOut] = {
    val (out, next) = scan(userId,
      state.getOption.getOrElse(CrossState(0L, crossed = false)), events.toSeq)
    state.update(next)
    out.iterator
  }

  /** Wire the operator over a streaming (or batch-test) Dataset[VEvent]. */
  def crossings(events: Dataset[VEvent]): Dataset[CrossOut] = {
    implicit val stateEnc = Encoders.product[CrossState]
    implicit val outEnc = Encoders.product[CrossOut]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
