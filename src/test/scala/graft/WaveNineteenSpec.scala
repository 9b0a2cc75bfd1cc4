package graft

/** Invariant checks for the final round-11 wave: community conductance
  * and the order-statistic trimmed mean.
  */
class WaveNineteenSpec extends SparkSpec {

  test("q_graph_conductance: phi bounded, cut + internal edges = volume") {
    val cond = SparkEntry.queries("q_graph_conductance")(spark, sfDir).collect()
    val mod = SparkEntry.queries("q_graph_modularity")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(cond.nonEmpty)
    val einBy = mod.map(r => r.getAs[Long]("community") -> r.getAs[Long]("e_in")).toMap
    cond.foreach { r =>
      val phi = r.getAs[Double]("phi")
      assert(phi >= 0.0 && phi <= 1.0 + 1e-9, s"phi=$phi")
      // every out-edge of a community's nodes either stays in (e_in) or
      // crosses the boundary (cut): the two queries must account exactly
      val c = r.getAs[Long]("community")
      assert(r.getAs[Long]("cut_edges") + einBy.getOrElse(c, 0L) ==
        r.getAs[Long]("d_c"), s"community $c edge accounting")
    }
  }

  test("q_stats_trimmed_mean: bounds bracket the estimate, ~90% mass kept") {
    val r = SparkEntry.queries("q_stats_trimmed_mean")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val row = r(0)
    val (lo, hi, tm) = (row.getAs[Double]("lo_usd"), row.getAs[Double]("hi_usd"),
      row.getAs[Double]("trimmed_mean_usd"))
    assert(lo <= tm && tm <= hi, s"$lo / $tm / $hi")
    val n = row.getAs[Long]("n")
    val kept = row.getAs[Long]("n_kept")
    assert(kept <= n)
    // value-bound trimming keeps at least the 90% interior (ties add more)
    assert(kept >= n * 9 / 10 - 1, s"kept=$kept of $n")
  }
}
