package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed k-th order statistic over a NON-NEGATIVE int64 column with
  * no global sort, no window, and no per-row rank: iterative radix
  * narrowing. Level by level (bit shifts 48/36/24/12/0), count the rows
  * per `value div 2^shift` bucket inside the currently-selected prefix,
  * prefix-sum the bounded bucket relation (≤4096 rows BY VALUE RANGE at
  * every level below the first, whatever the row count), and descend into
  * the bucket containing the remaining rank. After the shift-0 level the
  * "bucket" IS the answer.
  *
  * Each level is ONE flat filtered aggregation over `values`; the only
  * driver traffic is the bounded bucket-count relation (≤ |cursors|·4096
  * rows by value range) — the BPE-trainer bounded-scalar exception.
  * Threading that state as a chained 1-row broadcast relation instead
  * doubles the un-materialized plan per level (2^levels re-evaluations —
  * measured 41.7 s vs 1.4 s at sf0.1 in q_ml_conformal for the identical
  * algorithm). Callers should persist `values` (all levels re-scan it).
  *
  * Two pass-count optimizations (r15, guide §1.2 "the distributed
  * algorithm first"):
  *  - MANY ranks narrow through the SAME per-level bucket counts
  *    ([[ranks]] / [[ranksByGroup]]): the three order statistics of
  *    q_stats_median_ci cost the same passes as one.
  *  - Levels whose whole span exceeds max(value) put every row in bucket
  *    0 — a full counting pass that decides nothing. One cheap max()
  *    aggregation up front skips them: cents-scaled prices (~2^24) need
  *    2 counting passes, not 5.
  *
  * At 100 TB: log_4096(maxValue) ≈ 1 + ceil(log2(max)/12) passes over the
  * (filtered) value relation, every aggregation map-side combining into
  * ≤4096 groups per live cursor — this is the canonical distributed
  * quantile-without-sort and the building block for exact medians,
  * trimmed means, and conformal calibration quantiles.
  */
object RadixSelect {

  /** The k-th smallest (1-based) value of `valueCol`; k must be in
    * [1, count]. Values must be non-negative (shift arithmetic).
    * Single-rank view of [[ranks]].
    */
  def kth(values: DataFrame, valueCol: String, k: Long): Long =
    ranks(values, valueCol, Seq(k))(k)

  /** The counting levels actually worth running for values in [0, mx]:
    * a level whose whole span exceeds mx maps every row to bucket 0 and
    * decides nothing. Returns (levels, startPrev) where `value div
    * 2^startPrev == 0` for every row by construction.
    */
  private def liveLevels(mx: Long): (Seq[Int], Int) = {
    val levels = Seq(48, 36, 24, 12).filter(sh => (mx >> sh) > 0) :+ 0
    (levels, math.min(levels.head + 12, 60))
  }

  /** MANY global ranks (1-based, each in [1, count]) resolved in ONE
    * narrowing: every rank's cursor descends through the same per-level
    * bucket-count relation, so p ranks cost the passes of one — max()
    * plus one counting aggregation per live level. Values must be
    * non-negative int64 (< 2^60).
    */
  def ranks(values: DataFrame, valueCol: String, ks: Seq[Long]): Map[Long, Long] = {
    require(ks.nonEmpty && ks.forall(_ >= 1), s"ranks must be positive, got $ks")
    val mxRow = values.agg(max(col(valueCol)).as("m")).collect()(0)
    require(!mxRow.isNullAt(0), "rank selection over an empty relation")
    val (levels, prev0) = liveLevels(mxRow.getLong(0))
    var prev = prev0
    // original rank -> (remaining rank, selected prefix)
    var state: Map[Long, (Long, Long)] = ks.distinct.map(k => k -> (k, 0L)).toMap
    for (sh <- levels) {
      val ratio = 1L << (prev - sh)
      val livePrefixes = state.values.map(_._2).toSeq.distinct
      val inPfx = livePrefixes
        .map(p => expr(s"$valueCol div ${1L << prev}") === lit(p))
        .reduce(_ || _)
      val cnt = values.filter(inPfx)
        .groupBy(expr(s"$valueCol div ${1L << sh}").as("b"))
        .agg(count(lit(1)).as("t"))
        .collect()
        .map(r => (r.getAs[Long]("b"), r.getAs[Long]("t")))
        .sortBy(_._1)
      state = state.map { case (k0, (kk, pfx)) =>
        val buckets = cnt.filter(_._1 / ratio == pfx)
        var acc = 0L
        val (b, base) = buckets.collectFirst {
          case (b, t) if { val hit = acc + t >= kk; if (!hit) acc += t; hit } =>
            (b, acc)
        }.getOrElse(throw new IllegalStateException(
          s"rank $kk exhausted (n < k?)"))
        k0 -> (kk - base, b)
      }
      prev = sh
    }
    state.map { case (k, (_, pfx)) => k -> pfx }
  }

  /** Per-group k-th smallest values, all groups narrowed SIMULTANEOUSLY:
    * one (group, bucket) aggregation per radix level — shared across all
    * groups — instead of [[kth]]'s passes per group. The per-level
    * driver traffic grows from two scalars to ≤ |groups|·4096 bounded
    * count rows (bounded BY VALUE RANGE, not by data size — the same
    * bounded-driver-literal exception, one size up); the per-group
    * prefix-sum over those counts runs on the driver. Callers should
    * persist `values`.
    */
  def kthByGroup(values: DataFrame, groupCol: String, valueCol: String,
      ks: Map[String, Long]): Map[String, Long] =
    ranksByGroup(values, groupCol, valueCol,
      ks.map { case (g, k) => g -> Seq(k) })
      .map { case ((g, _), v) => g -> v }

  /** MANY ranks per group, still one counting aggregation per live level:
    * all (group, rank) cursors narrow through the same per-level
    * (group, bucket) count relation — a bucket's prefix is
    * `bucket div 2^(prevShift-shift)`, so the driver routes each count
    * row to exactly the cursors whose selected prefix matches. This is
    * the exact grouped-percentile primitive: P10/P50/P90 across every
    * group costs the same passes as one median.
    */
  def ranksByGroup(values: DataFrame, groupCol: String, valueCol: String,
      ks: Map[String, Seq[Long]]): Map[(String, Long), Long] = {
    require(ks.nonEmpty && ks.values.forall(s => s.nonEmpty && s.forall(_ >= 1)),
      s"bad ranks: $ks")
    val mxRow = values.agg(max(col(valueCol)).as("m")).collect()(0)
    require(!mxRow.isNullAt(0), "rank selection over an empty relation")
    val (levels, prev0) = liveLevels(mxRow.getLong(0))
    var prev = prev0
    // (group, original rank) -> (remaining rank, selected prefix)
    var state: Map[(String, Long), (Long, Long)] =
      ks.flatMap { case (g, rs) => rs.map(k => (g, k) -> (k, 0L)) }
    for (sh <- levels) {
      val ratio = 1L << (prev - sh)
      val livePrefixes = state.toSeq.map { case ((g, _), (_, pfx)) => (g, pfx) }
        .distinct
      val inPrefix = livePrefixes.map { case (g, pfx) =>
        (col(groupCol) === g) &&
          (expr(s"$valueCol div ${1L << prev}") === lit(pfx))
      }.reduce(_ || _)
      val cnt = values.filter(inPrefix)
        .groupBy(col(groupCol).as("g"),
          expr(s"$valueCol div ${1L << sh}").as("b"))
        .agg(count(lit(1)).as("t"))
        .collect()
        .groupBy(_.getAs[String]("g"))
      state = state.map { case ((g, k0), (kk, pfx)) =>
        val buckets = cnt.getOrElse(g, Array.empty)
          .map(r => (r.getAs[Long]("b"), r.getAs[Long]("t")))
          .filter(_._1 / ratio == pfx)
          .sortBy(_._1)
        var acc = 0L
        val (b, base) = buckets.collectFirst {
          case (b, t) if { val hit = acc + t >= kk; if (!hit) acc += t; hit } =>
            (b, acc)
        }.getOrElse(throw new IllegalStateException(
          s"rank $kk exhausted for group $g (n < k?)"))
        (g, k0) -> (kk - base, b)
      }
      prev = sh
    }
    state.map { case (gk, (_, pfx)) => gk -> pfx }
  }
}
