package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.DecimalType

/** Stateful streaming EWMA spike detector: per (event_type, day) key,
  * maintain an exponentially-weighted moving average of event values and
  * count spikes (value > [[SpikeMult]]× the trailing EWMA at arrival).
  * The registered `stream_ewma` query is the batch fold over the same
  * (ts, event_id) order; this operator is the streaming twin whose state
  * is three numbers per key — constant-size however long the stream runs.
  *
  * Ordering contract (the [[ThresholdCross]] one): each batch's events
  * fold in (ts, event_id) order and state carries across micro-batches,
  * so exactness requires per-key event-time-ordered arrival ACROSS
  * batches — true for the spec's availableNow replay and its
  * intra-day-split two-batch replay, and for log-shipped streams
  * partitioned by key. The day in the key also bounds any one key's
  * lifetime, so state is evictable after a watermark passes the day
  * (kept simple here: NoTimeout, the spec replays bounded data).
  *
  * Each emission carries n_events, so a multi-batch run's LAST emission
  * per key (max n_events) is the final state — no batch ids needed.
  */
object Ewma {

  /** Smoothing factor and spike multiple. */
  val Alpha = 0.2
  val SpikeMult = 2.0

  final case class VEvent(event_type: String, day: java.sql.Date,
      ts: Timestamp, event_id: Long, v: Double)
  final case class EwmaState(ewma: Double, n: Long, spikes: Long)
  final case class EwmaOut(event_type: String, day: java.sql.Date,
      n_events: Long, ewma: Double, n_spikes: Long)

  private def toUs(t: Timestamp): Long =
    t.getTime / 1000 * 1000000 + t.getNanos / 1000

  /** events(event_type, ts, event_id, value) -> typed per-day events with
    * the value cast to decimal(12,2)-exact dollars by Spark itself, so
    * the batch twin and this operator can never disagree on rounding.
    */
  def fromRaw(df: DataFrame): Dataset[VEvent] = {
    implicit val enc = Encoders.product[VEvent]
    df.select(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"),
        col("ts"), col("event_id"),
        col("value").cast(DecimalType(12, 2)).cast("double").as("v"))
      .as[VEvent]
  }

  /** ONE scan rule shared by the streaming update and the batch twin. */
  private[graft] def scan(prev: Option[EwmaState],
      events: Seq[VEvent]): EwmaState = {
    var st = prev.getOrElse(EwmaState(0.0, 0L, 0L))
    events.sortBy(e => (toUs(e.ts), e.event_id)).foreach { e =>
      st =
        if (st.n == 0L) EwmaState(e.v, 1L, 0L)
        else {
          val spike = e.v > SpikeMult * st.ewma
          EwmaState(Alpha * e.v + (1.0 - Alpha) * st.ewma, st.n + 1,
            st.spikes + (if (spike) 1L else 0L))
        }
    }
    st
  }

  def update(key: (String, java.sql.Date), events: Iterator[VEvent],
      state: GroupState[EwmaState]): Iterator[EwmaOut] = {
    val next = scan(state.getOption, events.toSeq)
    state.update(next)
    Iterator.single(EwmaOut(key._1, key._2, next.n, next.ewma, next.spikes))
  }

  /** Wire the operator over a streaming (or batch-test) Dataset. */
  def ewma(events: Dataset[VEvent]): Dataset[EwmaOut] = {
    implicit val stateEnc = Encoders.product[EwmaState]
    implicit val outEnc = Encoders.product[EwmaOut]
    implicit val keyEnc =
      Encoders.tuple(Encoders.STRING, Encoders.DATE)
    events
      .groupByKey(e => (e.event_type, e.day))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}
