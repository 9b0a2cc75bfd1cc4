package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Hourly rate limiter / notification throttle: emit each user's FIRST
  * event of any given hour, suppress the rest — the "at most one alert
  * per user per window" shape.
  *
  * Deliberately built on Spark 4's `transformWithState` (the
  * StatefulProcessor API that supersedes flatMapGroupsWithState) so the
  * library exercises BOTH state APIs: state here is ONE long per user
  * (the last emitted epoch-hour) in a typed [[ValueState]], and the
  * operator requires the RocksDB state store provider — exactly what a
  * 100 TB deployment runs anyway (state spills off-heap instead of
  * living in executor JVM memory).
  *
  * Exactness assumes per-key event-time-ordered arrival ACROSS
  * micro-batches (the ThresholdCross discipline; events inside one batch
  * are sorted locally). Emission is immediate — no watermark hold-back —
  * so a drained in-order replay equals the batch twin EXACTLY, not just
  * on closed windows.
  */
object Throttle {

  /** Tumbling throttle window (1 hour) in microseconds, epoch-aligned. */
  val WindowUs: Long = 3600L * 1000000

  final case class TEvent(user_id: Long, us: Long, event_id: Long,
      event_type: String)
  final case class TOut(user_id: Long, hour_start: Timestamp, event_id: Long,
      event_type: String)

  private def toTs(us: Long): Timestamp = new Timestamp(us / 1000)

  class Processor extends StatefulProcessor[Long, TEvent, TOut] {
    @transient private var lastHour: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      lastHour = getHandle.getValueState[Long]("lastHour",
        Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[TEvent],
        tv: TimerValues): Iterator[TOut] = {
      // In-batch arrival order is not guaranteed; one user's slice of a
      // micro-batch is bounded, so a local sort restores event-time order.
      val sorted = rows.toArray.sortBy(e => (e.us, e.event_id))
      var last = if (lastHour.exists()) lastHour.get() else Long.MinValue
      val out = Array.newBuilder[TOut]
      sorted.foreach { e =>
        val h = Math.floorDiv(e.us, WindowUs)
        if (h > last) {
          last = h
          out += TOut(e.user_id, toTs(h * WindowUs), e.event_id, e.event_type)
        }
      }
      lastHour.update(last)
      out.result().iterator
    }
  }

  def fromRaw(df: DataFrame): Dataset[TEvent] = {
    implicit val enc = Encoders.product[TEvent]
    df.select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
      .as[TEvent]
  }

  def throttled(events: Dataset[TEvent]): Dataset[TOut] = {
    implicit val outEnc = Encoders.product[TOut]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }
}
