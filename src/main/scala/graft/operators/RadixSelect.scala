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
  * Each level is ONE flat filtered aggregation over `values` plus a tiny
  * self-join; the only driver traffic is two scalars per level (selected
  * prefix, remaining rank) — the BPE-trainer bounded-scalar exception.
  * Threading that state as a chained 1-row broadcast relation instead
  * doubles the un-materialized plan per level (2^levels re-evaluations —
  * measured 41.7 s vs 1.4 s at sf0.1 in q_ml_conformal for the identical
  * algorithm). Callers should persist `values` (all levels re-scan it).
  *
  * At 100 TB: log_4096(maxValue) ≈ 5 passes over the (filtered) value
  * relation, every aggregation map-side combining into ≤4096 groups —
  * this is the canonical distributed quantile-without-sort and the
  * building block for exact medians, trimmed means, and conformal
  * calibration quantiles.
  */
object RadixSelect {

  /** The k-th smallest (1-based) value of `valueCol`; k must be in
    * [1, count]. Values must be non-negative (shift arithmetic).
    */
  def kth(values: DataFrame, valueCol: String, k: Long): Long = {
    require(k >= 1, s"rank must be positive, got $k")
    var kk = k
    var pfx = 0L
    var prev = 60
    for (sh <- Seq(48, 36, 24, 12, 0)) {
      val cnt = values
        .filter(expr(s"$valueCol div ${1L << prev}") === lit(pfx))
        .groupBy(expr(s"$valueCol div ${1L << sh}").as("b"))
        .agg(count(lit(1)).as("t"))
      val sel = cnt.as("x").join(cnt.as("o"), col("o.b") < col("x.b"), "left")
        .groupBy(col("x.b").as("b"))
        .agg(max(col("x.t")).as("t"),
          coalesce(sum(col("o.t")), lit(0L)).as("base"))
        .filter(col("base") + col("t") >= lit(kk))
        .orderBy(col("b"))
        .limit(1)
        .collect()(0)
      kk -= sel.getAs[Long]("base")
      pfx = sel.getAs[Long]("b")
      prev = sh
    }
    pfx
  }

  /** Per-group k-th smallest values, all groups narrowed SIMULTANEOUSLY:
    * one (group, bucket) aggregation per radix level — 5 total whatever
    * the group count — instead of [[kth]]'s 5 per group. The per-level
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

  /** MANY ranks per group, still 5 aggregations total: all (group, rank)
    * cursors narrow through the same per-level (group, bucket) count
    * relation — a bucket's prefix is `bucket div 2^(prevShift-shift)`, so
    * the driver routes each count row to exactly the cursors whose
    * selected prefix matches. This is the exact grouped-percentile
    * primitive: P10/P50/P90 across every group costs the same 5 passes
    * as one median.
    */
  def ranksByGroup(values: DataFrame, groupCol: String, valueCol: String,
      ks: Map[String, Seq[Long]]): Map[(String, Long), Long] = {
    require(ks.nonEmpty && ks.values.forall(s => s.nonEmpty && s.forall(_ >= 1)),
      s"bad ranks: $ks")
    // (group, original rank) -> (remaining rank, selected prefix)
    var state: Map[(String, Long), (Long, Long)] =
      ks.flatMap { case (g, rs) => rs.map(k => (g, k) -> (k, 0L)) }
    var prev = 60
    for (sh <- Seq(48, 36, 24, 12, 0)) {
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
