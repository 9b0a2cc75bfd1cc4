package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operator (the `flatMapGroupsWithState`
  * extension surface): per-user session tracking with arbitrary state —
  * what session_window can't express, e.g. emitting a running event count
  * and a per-session distinct-event_type count as the session evolves.
  *
  * Scale: state lives in the state store keyed by user_id; the event-time
  * timeout bounds it (a session with no events for > gap is finalized and
  * evicted), which is what keeps 100 TB of history from accumulating.
  */
object Sessionize {

  final case class Event(user_id: Long, ts: Timestamp, event_type: String)
  final case class SessionState(startUs: Long, lastUs: Long, n: Long, types: Set[String])
  final case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, n_event_types: Int, closed: Boolean)

  val GapUs: Long = 5L * 60 * 1000 * 1000

  /** Timestamp <-> microseconds — java.sql.Timestamp.getTime is only
    * millisecond-precise; the nanos field carries the rest. Dropping micros
    * here would shift every session boundary off the event-time values.
    */
  private def toUs(t: Timestamp): Long =
    t.getTime / 1000 * 1000000 + t.getNanos / 1000
  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000 * 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }

  /** ONE merge rule shared by the streaming update and the batch flush:
    * the running state and every batch event become session INTERVALS
    * ([t, t] singletons for events), sorted by start, and any two
    * intervals within the gap merge (sum counts, union types). Both
    * execution modes go through this function, so they cannot diverge.
    *
    * Why intervals rather than a per-event fold: state carries across
    * batches and micro-batches arrive in file order, not event-time
    * order, so events may precede the running session. A per-event fold
    * either drags the session backwards (the naive `t - lastUs < gap`
    * check) or — the r2 ADVICE finding — emits two late events that are
    * within the gap OF EACH OTHER as two overlapping singleton sessions.
    * Interval merge handles every arrangement: late events within the
    * gap of each other coalesce into ONE closed session, late events
    * within the gap of the running session extend it backwards, and
    * anything still disjoint closes as its own session.
    *
    * The LATEST interval stays open (future batches may extend it);
    * everything earlier is closed. A closed late session's [start,
    * last+gap) interval can still overlap the open session's when the two
    * sit between gap and 2·gap apart — inherent to closing early, and the
    * same shape session_window emits for late data past the watermark.
    *
    * @return (closed sessions in ascending start order, open last session)
    */
  private[graft] def mergeBatch(userId: Long, prev: Option[SessionState],
      events: Seq[Event]): (List[SessionOut], Option[SessionState]) = {
    val ivs = prev.toList ++ events.map(e =>
      SessionState(toUs(e.ts), toUs(e.ts), 1, Set(e.event_type)))
    if (ivs.isEmpty) return (Nil, None)
    val sorted = ivs.sortBy(s => (s.startUs, s.lastUs))
    var merged = List(sorted.head) // descending by start; head = newest
    sorted.tail.foreach { iv =>
      val h = merged.head
      if (iv.startUs < h.lastUs + GapUs)
        merged = h.copy(lastUs = math.max(h.lastUs, iv.lastUs),
          n = h.n + iv.n, types = h.types ++ iv.types) :: merged.tail
      else merged = iv :: merged
    }
    (merged.tail.reverse.map(finalize(userId, _)), Some(merged.head))
  }

  private def finalize(userId: Long, s: SessionState): SessionOut =
    SessionOut(userId, toTs(s.startUs), toTs(s.lastUs + GapUs), s.n,
      s.types.size, closed = true)

  /** Flat-map update function: merges the batch's events into the running
    * session; emits the closed sessions when the gap is exceeded or the
    * state times out.
    */
  def update(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    val (closed, open) = mergeBatch(userId, state.getOption, events.toSeq)
    var out = closed
    open.foreach { s =>
      state.update(s)
      if (state.hasTimedOut) {
        state.remove()
        out = out :+ finalize(userId, s)
      } else {
        // clamp to strictly-after-watermark: flatMapGroupsWithState does
        // not drop late rows, and a timeout at or before the current
        // watermark throws and kills the whole streaming query
        val target = (s.lastUs + GapUs) / 1000
        val floor = state.getCurrentWatermarkMs() + 1
        state.setTimeoutTimestamp(math.max(target, floor))
      }
    }
    out.iterator
  }

  /** Wire the operator over a streaming (or batch-test) Dataset[Event]. */
  def sessions(events: Dataset[Event]): Dataset[SessionOut] = {
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val outEnc = Encoders.product[SessionOut]
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Batch evaluation of the SAME operator (registered as the
    * `stream_sessionize_custom` query). Bounded input means end-of-input
    * is the ultimate timeout: the trailing open session is finalized by
    * the same [[finalize]] the streaming timeout path uses. Events merge
    * through the same [[mergeBatch]] — the two modes share every rule.
    *
    * Scale: one shuffle on user_id; per-group work is a sort of that
    * user's events (bounded by per-user activity, not corpus size).
    */
  def sessionsBatch(events: Dataset[Event]): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    events.groupByKey(_.user_id)(Encoders.scalaLong).flatMapGroups {
      (userId: Long, it: Iterator[Event]) =>
        val (closed, open) = mergeBatch(userId, None, it.toSeq)
        (closed ++ open.map(finalize(userId, _))).iterator
    }
  }
}
