package graft

/** Invariant checks for wave 18: order-statistic CI bracketing and
  * depth-2 tree coherence.
  */
class WaveEighteenSpec extends SparkSpec {

  test("q_stats_median_ci: interval brackets the median, n is the table count") {
    val r = SparkEntry.queries("q_stats_median_ci")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val (lo, med, hi) = (r(0).getAs[Double]("lo95_usd"),
      r(0).getAs[Double]("median_usd"), r(0).getAs[Double]("hi95_usd"))
    assert(lo <= med && med <= hi, s"$lo / $med / $hi")
    assert(r(0).getAs[Long]("n") == Tables.load(spark, sfDir, "lineitem").count())
  }

  test("q_ml_tree_depth2: four nodes, deeper tree never less accurate on train") {
    val rows = SparkEntry.queries("q_ml_tree_depth2")(spark, sfDir).collect()
    CacheScope.releaseAll()
    val byNode = rows.map(r => r.getAs[String]("node") -> r).toMap
    assert(byNode.keySet == Set("root", "left", "right", "tree"))
    rows.foreach { r =>
      val acc = r.getAs[Double]("acc")
      assert(acc >= 0.5 - 1e-9 && acc <= 1.0 + 1e-9, s"acc=$acc")
      assert(r.getAs[Double]("gini") >= 0.0 && r.getAs[Double]("gini") <= 0.5 + 1e-9)
    }
    // splitting each branch again can only grow the training majority count
    assert(byNode("tree").getAs[Double]("acc") >=
      byNode("root").getAs[Double]("acc") - 1e-6)
  }

  test("mm_audio_energy: frame features bounded, frames contiguous from 0") {
    val rows = SparkEntry.queries("mm_audio_energy")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    val w = graft.mm.MultimodalQueries.AudioFrame
    rows.foreach { r =>
      assert(r.getAs[Long]("energy") >= 0L)
      val z = r.getAs[Long]("zcr")
      assert(z >= 0L && z <= w - 1, s"zcr=$z")
    }
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val fs = rs.map(_.getAs[Long]("frame")).sorted
      assert(fs.head == 0L && fs.sameElements(fs.head to fs.last))
    }
  }
}
