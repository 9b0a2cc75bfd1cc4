package graft

import org.apache.spark.sql.functions._

import graft.operators.Skyline

/** Tie semantics of the 2D skyline that a single-SF hash match may not
  * exercise: equal-x domination, equal-y domination, and the
  * cross-bucket pruning path vs the purely-local path.
  */
class SkylineSpec extends SparkSpec {

  //   x    y    expected
  //  0.5   5    keep (cheapest)
  //  1.0  10    keep
  //  1.0   9    dominated by (1.0, 10): equal x, larger y
  //  2.0  10    dominated by (1.0, 10): smaller x, equal y
  //  2.0  11    keep
  //  3.0  12    keep (largest y)
  private val pts = Seq(
    (0.5, 5L), (1.0, 10L), (1.0, 9L), (2.0, 10L), (2.0, 11L), (3.0, 12L))
  private val expected = Set((0.5, 5L), (1.0, 10L), (2.0, 11L), (3.0, 12L))

  private def run(bucketWidth: Double): Set[(Double, Long)] = {
    val df = spark.createDataFrame(pts).toDF("x", "y")
      .groupBy("x", "y").agg(count(lit(1)).as("n"))
    Skyline.skyline2D(df, "x", "y", bucketWidth)
      .collect().map(r => (r.getDouble(0), r.getLong(1))).toSet
  }

  test("planted frontier with equal-x and equal-y dominators") {
    // width 1.0: points spread over buckets 0..3 — (2.0, 10) can only be
    // killed by the CROSS-bucket prefix max (its dominator (1.0, 10) is
    // in bucket 1); width 100: everything in one bucket — the same kill
    // must come from the local running max. Both paths, same answer.
    assert(run(1.0) == expected, "multi-bucket path")
    assert(run(100.0) == expected, "single-bucket path")
  }
}
