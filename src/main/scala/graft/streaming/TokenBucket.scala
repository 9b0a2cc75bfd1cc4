package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Token-bucket rate limiter — the real API-gateway / notification-cap
  * semantics [[Throttle]]'s tumbling window approximates: each user owns a
  * bucket of [[Capacity]] tokens refilling continuously at one token per
  * [[RefillUs]] microseconds; an event is ADMITTED iff a whole token is
  * available (and spends it), so bursts up to Capacity pass and sustained
  * traffic is clamped to the refill rate — no window-boundary burst
  * artifact.
  *
  * All state arithmetic is exact int64 in MICROSECOND-TOKEN units: the
  * available balance is `availUs` in [0, Capacity·RefillUs], accrual is
  * the raw event-time delta, and a token costs RefillUs — no floats, so
  * the batch twin (an ordered array fold), this streaming operator, and
  * the DuckDB recursive-CTE oracle must agree exactly.
  *
  * State is one (availUs, lastUs) pair per user in a typed ValueState on
  * the RocksDB store (the Throttle deployment contract); per-key
  * event-time-ordered arrival across micro-batches is assumed, with the
  * in-batch slice sorted locally.
  */
object TokenBucket {

  /** Microseconds per token (refill interval): 24 hours — sized to the
    * testdata's event sparsity (~1 event/user/day) so the limiter
    * genuinely rejects; a production per-minute config is the same two
    * constants.
    */
  val RefillUs: Long = 24L * 3600 * 1000000

  /** Bucket capacity in whole tokens (burst budget). */
  val Capacity: Long = 2

  /** Full-bucket balance in µs-token units. */
  val CapUs: Long = Capacity * RefillUs

  final case class BEvent(user_id: Long, us: Long, event_id: Long)

  /** Full-microsecond Timestamp (a plain `new Timestamp(us / 1000)` would
    * truncate to millis and diverge from the batch twin's
    * timestamp_micros).
    */
  private def toTs(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000 * 1000)
    t.setNanos(((us % 1000000) * 1000).toInt)
    t
  }
  final case class BOut(user_id: Long, event_id: Long, ts: Timestamp,
      tokens_after: Long)

  class Processor extends StatefulProcessor[Long, BEvent, BOut] {
    @transient private var st: ValueState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[(Long, Long)]("bucket",
        Encoders.product[(Long, Long)], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[BEvent],
        tv: TimerValues): Iterator[BOut] = {
      val sorted = rows.toArray.sortBy(e => (e.us, e.event_id))
      var (avail, last) =
        if (st.exists()) st.get() else (CapUs, Long.MinValue)
      val out = Array.newBuilder[BOut]
      sorted.foreach { e =>
        val accrued =
          if (last == Long.MinValue) avail
          else math.min(CapUs, avail + (e.us - last))
        last = e.us
        if (accrued >= RefillUs) {
          avail = accrued - RefillUs
          out += BOut(e.user_id, e.event_id, toTs(e.us), avail / RefillUs)
        } else avail = accrued
      }
      st.update((avail, last))
      out.result().iterator
    }
  }

  def fromRaw(df: DataFrame): Dataset[BEvent] = {
    implicit val enc = Encoders.product[BEvent]
    df.select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .as[BEvent]
  }

  def limited(events: Dataset[BEvent]): Dataset[BOut] = {
    implicit val outEnc = Encoders.product[BOut]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new Processor, TimeMode.None(), OutputMode.Append())
  }

  /** Batch twin: the identical int64 bucket walk as ONE ordered array
    * fold per user (per-user state bounded by that user's activity — the
    * sessionize contract), admitted events exploded back out.
    */
  def batch(events: DataFrame): DataFrame =
    events
      .select(col("user_id"), unix_micros(col("ts")).as("us"), col("event_id"))
      .groupBy("user_id")
      .agg(array_sort(collect_list(struct(col("us"), col("event_id"))))
        .as("es"))
      .withColumn("out", expr(
        s"""aggregate(es,
           |  named_struct('avail', CAST($CapUs AS BIGINT),
           |               'last', CAST(-1 AS BIGINT),
           |               'out', CAST(array() AS ARRAY<STRUCT<event_id: BIGINT, us: BIGINT, tokens_after: BIGINT>>)),
           |  (acc, e) -> named_struct(
           |    'avail', CASE WHEN (CASE WHEN acc.last < 0 THEN acc.avail
           |                         ELSE least(CAST($CapUs AS BIGINT), acc.avail + (e.us - acc.last)) END) >= $RefillUs
           |              THEN (CASE WHEN acc.last < 0 THEN acc.avail
           |                    ELSE least(CAST($CapUs AS BIGINT), acc.avail + (e.us - acc.last)) END) - $RefillUs
           |              ELSE (CASE WHEN acc.last < 0 THEN acc.avail
           |                    ELSE least(CAST($CapUs AS BIGINT), acc.avail + (e.us - acc.last)) END) END,
           |    'last', e.us,
           |    'out', CASE WHEN (CASE WHEN acc.last < 0 THEN acc.avail
           |                      ELSE least(CAST($CapUs AS BIGINT), acc.avail + (e.us - acc.last)) END) >= $RefillUs
           |           THEN array_append(acc.out, named_struct(
           |                  'event_id', e.event_id, 'us', e.us,
           |                  'tokens_after',
           |                  ((CASE WHEN acc.last < 0 THEN acc.avail
           |                     ELSE least(CAST($CapUs AS BIGINT), acc.avail + (e.us - acc.last)) END) - $RefillUs) div $RefillUs))
           |           ELSE acc.out END),
           |  acc -> acc.out)""".stripMargin))
      .select(col("user_id"), explode(col("out")).as("o"))
      .select(col("user_id"), col("o.event_id").as("event_id"),
        timestamp_micros(col("o.us")).as("ts"),
        col("o.tokens_after").as("tokens_after"))
}
