package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** 2D skyline (Pareto frontier): the points not dominated under
  * (minimize x, maximize y) — "cheapest and latest" style multi-objective
  * filtering. A dominates B iff A.x <= B.x, A.y >= B.y, and at least one
  * is strict.
  *
  * Distributed design (the naive formulation is an all-pairs NOT EXISTS —
  * quadratic and unshardable): after de-duplicating exact (x, y) points,
  *
  *  1. bucket points by x-range and take each bucket's LOCAL skyline
  *     with one bucket-partitioned window: sorted by (x asc, y desc), a
  *     point is dominated exactly when the running max of y over earlier
  *     rows reaches its own y (earlier row = smaller x, or equal x with
  *     larger y — either way a dominator when its y >= mine; ties are
  *     exact-duplicate-free after the dedup);
  *  2. kill survivors dominated ACROSS buckets with the prefix max of
  *     strictly-lower buckets' y (lower bucket => strictly smaller x, so
  *     y >= mine dominates). The per-bucket summary is constant-size, so
  *     the prefix max is a broadcast inequality self-join — the same
  *     no-global-window discipline as text_zipf's rank.
  *
  * Cost: one shuffle for the dedup-with-count, one bucket-partitioned
  * sort, one broadcast join — no all-pairs anything; survives any scale
  * where a single bucket's points fit a task (bucketWidth is the dial).
  * The registered q_skyline oracle is the INDEPENDENT all-pairs
  * NOT EXISTS formulation, so a dominance bug in either shape breaks the
  * hash match.
  */
object Skyline {

  /** Skyline of `points` under (min `x`, max `y`). Exact (x, y)
    * duplicates are collapsed internally to one representative row
    * (deterministic max-struct argmax over the extra columns), so raw
    * point relations are safe; callers that need a multiplicity count
    * must still pre-aggregate, since extras of collapsed duplicates are
    * represented, not summed. When the input is already one row per
    * (x, y) — e.g. the q_skyline groupBy — the internal groupBy reuses
    * that shuffle's hash partitioning, so it adds no exchange.
    */
  def skyline2D(points: DataFrame, x: String, y: String,
      bucketWidth: Double): DataFrame = {
    val extras = points.columns.filterNot(c => c == x || c == y).toSeq
    val dedup =
      if (extras.isEmpty) points.distinct()
      else points.groupBy(col(x), col(y))
        .agg(max(struct(extras.map(col): _*)).as("_rep"))
        .select(col(x) +: col(y) +:
          extras.map(c => col(s"_rep.`$c`").as(c)): _*)
    val bkt: Column = floor(col(x) / bucketWidth).cast("long")
    val p = dedup.withColumn("_bkt", bkt)
    val w = Window.partitionBy(col("_bkt"))
      .orderBy(col(x).asc, col(y).desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val local = p
      .withColumn("_runmax", max(col(y)).over(w))
      .filter(col("_runmax").isNull || col("_runmax") < col(y))
    val bmax = p.groupBy(col("_bkt").as("_b")).agg(max(col(y)).as("_bm"))
    val prev = bmax.select(col("_b").as("_b2"), col("_bm").as("_bm2"))
    val prefix = bmax
      .join(broadcast(prev), col("_b2") < col("_b"), "left")
      .groupBy(col("_b"))
      .agg(max(col("_bm2")).as("_prevmax"))
    local
      .join(broadcast(prefix), col("_bkt") === col("_b"))
      .filter(col("_prevmax").isNull || col("_prevmax") < col(y))
      .drop("_bkt", "_runmax", "_b", "_prevmax")
  }
}
