package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-window top-k by count, emitted ON WINDOW CLOSE — the leaderboard /
  * trending shape ("top event types per hour"). Structured Streaming has
  * no rank in append mode (a windowed agg can count, but top-k needs the
  * whole window's counts at once), so this is a genuine
  * flatMapGroupsWithState operator: state is one count map per OPEN
  * window, keyed by window start; the event-time timeout fires when the
  * watermark passes the window end and emits that window's ranked top-k
  * exactly once.
  *
  * Scale: state is bounded by (#open windows) x (#distinct types in the
  * window) — open windows are bounded by the watermark delay, so state is
  * constant in stream length. Ranking happens per window at close over
  * an in-memory map that is distinct-type-sized, never event-sized.
  *
  * Determinism: rank order is (n desc, event_type asc) — a total order,
  * shared with the registered `stream_window_topk` batch twin (window +
  * row_number) that the DuckDB oracle checks.
  */
object WindowTopK {

  final case class WEvent(wstart_us: Long, event_type: String, ts: Timestamp)
  final case class TopKState(counts: Map[String, Long])
  final case class TopKOut(window_start: Timestamp, window_end: Timestamp,
      event_type: String, n: Long, rnk: Int)

  /** Tumbling window width (1 hour) in microseconds, and the k. */
  val WindowUs: Long = 3600L * 1000000
  val K = 3

  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000 * 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  /** events(ts, event_type, ...) -> typed (window_start_us, event_type, ts).
    * The window assignment is the same floor the batch twin's window()
    * performs; unix epoch is the shared origin. The raw `ts` is carried
    * through so the watermark attribute survives the projection —
    * EventTimeTimeout requires a watermarked column in the operator's
    * input.
    */
  def fromRaw(df: DataFrame): Dataset[WEvent] = {
    implicit val enc = Encoders.product[WEvent]
    df.select(
        (floor(unix_micros(col("ts")) / WindowUs) * WindowUs).cast("long")
          .as("wstart_us"),
        col("event_type"),
        col("ts"))
      .as[WEvent]
  }

  /** The ONE ranking rule (shared total order with the batch twin). */
  private[graft] def topOf(wstartUs: Long,
      counts: Map[String, Long]): List[TopKOut] =
    counts.toList.sortBy { case (t, n) => (-n, t) }.take(K).zipWithIndex
      .map { case ((t, n), i) =>
        TopKOut(toTs(wstartUs), toTs(wstartUs + WindowUs), t, n, i + 1)
      }

  def update(wstartUs: Long, events: Iterator[WEvent],
      state: GroupState[TopKState]): Iterator[TopKOut] = {
    if (state.hasTimedOut) {
      // Watermark passed the window end: close, emit once, evict.
      val out = topOf(wstartUs, state.get.counts)
      state.remove()
      out.iterator
    } else if (state.getOption.isEmpty &&
        (wstartUs + WindowUs) / 1000 <= state.getCurrentWatermarkMs()) {
      // Late data for a window that already closed and emitted (its state
      // was evicted by the timeout): drop it rather than resurrect the
      // window — a leaderboard must publish each window exactly once.
      Iterator.empty
    } else {
      val merged = events.foldLeft(
        state.getOption.map(_.counts).getOrElse(Map.empty[String, Long])) {
        (acc, e) => acc + (e.event_type -> (acc.getOrElse(e.event_type, 0L) + 1L))
      }
      state.update(TopKState(merged))
      // Clamp strictly after the current watermark (a timeout at or
      // before it throws) — same discipline as Sessionize.
      state.setTimeoutTimestamp(
        math.max((wstartUs + WindowUs) / 1000, state.getCurrentWatermarkMs() + 1))
      Iterator.empty
    }
  }

  /** Wire the operator over a streaming Dataset[WEvent]. */
  def topk(events: Dataset[WEvent]): Dataset[TopKOut] = {
    implicit val stateEnc = Encoders.product[TopKState]
    implicit val outEnc = Encoders.product[TopKOut]
    events
      .groupByKey(_.wstart_us)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
