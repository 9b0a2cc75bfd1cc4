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
    * fold an event into the running session, emitting a closed session
    * when one cannot grow anymore. Both execution modes go through this
    * function, so they cannot diverge.
    *
    * Events are sorted WITHIN a batch, but state carries across batches
    * and micro-batches arrive in file order, not event-time order, so `t`
    * may precede the running session (verified by the multi-batch specs —
    * the naive `t - lastUs < gap` check is satisfied by ANY earlier event,
    * its signed difference being negative, and silently drags `lastUs`
    * backwards, emitting corrupt inverted sessions). Three cases:
    *   - t within gap of the session interval -> merge, extending either
    *     boundary (in-order input always lands here or later);
    *   - t after the gap -> close the session, open a new one at t;
    *   - t disjoint BEFORE the session -> it can never join the running
    *     session; emit it as its own closed singleton immediately.
    */
  private def step(userId: Long, cur: Option[SessionState], e: Event)
      : (Option[SessionOut], SessionState) = {
    val t = toUs(e.ts)
    cur match {
      case Some(s) if t > s.startUs - GapUs && t < s.lastUs + GapUs =>
        (None, s.copy(startUs = math.min(s.startUs, t),
          lastUs = math.max(s.lastUs, t),
          n = s.n + 1, types = s.types + e.event_type))
      case Some(s) if t >= s.lastUs + GapUs =>
        (Some(finalize(userId, s)), SessionState(t, t, 1, Set(e.event_type)))
      case Some(s) => // t <= startUs - GapUs: disjoint, strictly earlier
        (Some(SessionOut(userId, toTs(t), toTs(t + GapUs), 1, 1, closed = true)), s)
      case None =>
        (None, SessionState(t, t, 1, Set(e.event_type)))
    }
  }

  private def finalize(userId: Long, s: SessionState): SessionOut =
    SessionOut(userId, toTs(s.startUs), toTs(s.lastUs + GapUs), s.n,
      s.types.size, closed = true)

  /** Flat-map update function: merges the batch's events into the running
    * session; emits the closed session when the gap is exceeded or the
    * state times out.
    */
  def update(userId: Long, events: Iterator[Event],
      state: GroupState[SessionState]): Iterator[SessionOut] = {
    val sorted = events.toSeq.sortBy(e => toUs(e.ts))
    var out = List.empty[SessionOut]
    var cur = state.getOption
    sorted.foreach { e =>
      val (emitted, next) = step(userId, cur, e)
      emitted.foreach(out ::= _)
      cur = Some(next)
    }
    cur match {
      case Some(s) =>
        state.update(s)
        if (state.hasTimedOut) {
          state.remove()
          out ::= finalize(userId, s)
        } else {
          // clamp to strictly-after-watermark: flatMapGroupsWithState does
          // not drop late rows, and a timeout at or before the current
          // watermark throws and kills the whole streaming query
          val target = (s.lastUs + GapUs) / 1000
          val floor = state.getCurrentWatermarkMs() + 1
          state.setTimeoutTimestamp(math.max(target, floor))
        }
      case None =>
    }
    out.reverseIterator
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
    * is the ultimate timeout: every trailing session is finalized by the
    * same [[finalize]] the streaming timeout path uses. Events fold
    * through the same [[step]] — the two modes share every rule.
    *
    * Scale: one shuffle on user_id; per-group work is a sort of that
    * user's events (bounded by per-user activity, not corpus size).
    */
  def sessionsBatch(events: Dataset[Event]): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    events.groupByKey(_.user_id)(Encoders.scalaLong).flatMapGroups {
      (userId: Long, it: Iterator[Event]) =>
        val sorted = it.toSeq.sortBy(e => toUs(e.ts))
        var out = List.empty[SessionOut]
        var cur: Option[SessionState] = None
        sorted.foreach { e =>
          val (emitted, next) = step(userId, cur, e)
          emitted.foreach(out ::= _)
          cur = Some(next)
        }
        cur.foreach(s => out ::= finalize(userId, s))
        out.reverseIterator
    }
  }
}
