package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Stateful streaming one-sided CUSUM drift detector: per (event_type,
  * day) key, accumulate S = max(0, S + (v − [[K]])) over arriving values
  * and raise an alarm (resetting S) whenever S reaches [[H]] — the
  * classic change-point monitor a pipeline runs on a quality or latency
  * signal to catch sustained upward drift that no single-value threshold
  * sees. State is two numbers + a count per key, constant-size for any
  * stream length; the day in the key bounds each key's lifetime exactly
  * as in [[Ewma]].
  *
  * Ordering contract (shared with [[Ewma]]/[[ThresholdCross]]): events
  * fold in (ts, event_id) order within and ACROSS micro-batches; the
  * registered `stream_cusum` batch query folds the same order with the
  * same IEEE expression shape (`greatest(0, s + (v − K))`), and the
  * DuckDB oracle recursion mirrors it literally, so all three
  * formulations share every bit. CusumStreamSpec proves readStream ≡
  * batch including an intra-day two-batch split.
  */
object Cusum {

  /** Drift allowance (subtracted per observation) and alarm threshold —
    * compile-time literals shared verbatim with the batch twin and the
    * oracle SQL.
    */
  val K = 60.0
  val H = 80.0

  final case class CusumState(s: Double, n: Long, alarms: Long)
  final case class CusumOut(event_type: String, day: java.sql.Date,
      n_events: Long, cusum: Double, n_alarms: Long)

  private def toUs(t: Timestamp): Long =
    t.getTime / 1000 * 1000000 + t.getNanos / 1000

  /** ONE scan rule shared by the streaming update and the batch twin. */
  private[graft] def scan(prev: Option[CusumState],
      events: Seq[Ewma.VEvent]): CusumState = {
    var st = prev.getOrElse(CusumState(0.0, 0L, 0L))
    events.sortBy(e => (toUs(e.ts), e.event_id)).foreach { e =>
      val s1 = math.max(0.0, st.s + (e.v - K))
      st =
        if (s1 >= H) CusumState(0.0, st.n + 1, st.alarms + 1)
        else CusumState(s1, st.n + 1, st.alarms)
    }
    st
  }

  def update(key: (String, java.sql.Date), events: Iterator[Ewma.VEvent],
      state: GroupState[CusumState]): Iterator[CusumOut] = {
    val next = scan(state.getOption, events.toSeq)
    state.update(next)
    Iterator.single(CusumOut(key._1, key._2, next.n, next.s, next.alarms))
  }

  /** Wire the operator over a streaming (or batch-test) Dataset. */
  def cusum(events: Dataset[Ewma.VEvent]): Dataset[CusumOut] = {
    implicit val stateEnc = Encoders.product[CusumState]
    implicit val outEnc = Encoders.product[CusumOut]
    implicit val keyEnc =
      Encoders.tuple(Encoders.STRING, Encoders.DATE)
    events
      .groupByKey(e => (e.event_type, e.day))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
