package graft

/** Invariant checks for the model-prep operators (CV folds, conformal
  * intervals, Kruskal–Wallis, mutual information, Fellegi–Sunter linkage).
  * The DuckDB hash compare proves cross-engine parity; these prove the
  * SEMANTICS a twin-implementation bug could preserve: fold partition
  * completeness, the conformal coverage guarantee, rank bounds, MI
  * non-negativity, and the bounded weight lattice of the linkage scores.
  */
class WaveThirteenSpec extends SparkSpec {

  test("q_ml_cvfolds: folds partition the table, errors finite and positive") {
    val rows = SparkEntry.queries("q_ml_cvfolds")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.length == graft.relational.ModelPrepQueries.CvFolds)
    val total = Tables.load(spark, sfDir, "lineitem").count()
    assert(rows.map(_.getAs[Long]("n_test")).sum == total)
    rows.foreach { r =>
      val rmse = r.getAs[Double]("rmse_usd")
      assert(rmse > 0 && !rmse.isNaN && !rmse.isInfinite)
      assert(!r.getAs[Double]("beta").isNaN)
    }
  }

  test("q_ml_conformal: split-conformal coverage lands near the 90% target") {
    val r = SparkEntry.queries("q_ml_conformal")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val cov = r(0).getAs[Double]("coverage")
    // finite-sample guarantee: coverage >= 1 - alpha in expectation; at
    // n_cal ~ 2e4 the binomial noise band is well inside +-5pp
    assert(cov >= 0.85 && cov <= 0.95, s"coverage=$cov")
    assert(r(0).getAs[Double]("qhat_usd") > 0)
    assert(r(0).getAs[Long]("n_cal") > 0 && r(0).getAs[Long]("n_test") > 0)
  }

  test("q_stats_kruskal: mean ranks bounded by n_obs, tie-corrected H >= H") {
    val rows = SparkEntry.queries("q_stats_kruskal")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    val nObs = rows.head.getAs[Long]("n_obs")
    rows.foreach { r =>
      val mr = r.getAs[Double]("mean_rank")
      assert(mr >= 1.0 && mr <= nObs.toDouble, s"mean_rank=$mr")
      assert(r.getAs[Double]("h_tie") >= r.getAs[Double]("h_stat") - 1e-9)
    }
    // pooled average-rank identity: sum of n_g * mean_rank = N(N+1)/2
    val tot = rows.map(r => r.getAs[Long]("n_days") * r.getAs[Double]("mean_rank")).sum
    assert(math.abs(tot - nObs.toDouble * (nObs + 1) / 2.0) < 1e-3, s"tot=$tot")
  }

  test("q_ml_mutual_info: MI non-negative for every feature") {
    val rows = SparkEntry.queries("q_ml_mutual_info")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Double]("mi_nats") >= -1e-9)
      assert(r.getAs[Long]("n_cells") > 0)
    }
  }

  test("q_er_fellegi: scores sit on the bounded 8-point weight lattice") {
    // sf0.001 has 10 suppliers -> the blocked pair pool is too sparse for
    // any pair to clear the score floor; use the oracle-gate corpus
    val rows = SparkEntry.queries("q_er_fellegi")(spark, "/root/testdata/sf0.01").collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    // 3 binary agreement fields -> at most 2^3 distinct scores can exist,
    // and every emitted one clears the floor
    assert(rows.map(_.getAs[Double]("score")).distinct.length <= 8)
    rows.foreach { r =>
      assert(r.getAs[Double]("score") >= graft.relational.EntityResolutionQueries.FsScoreFloor)
      Seq("agree_id", "agree_band", "agree_sign").foreach { c =>
        val v = r.getAs[Int](c); assert(v == 0 || v == 1)
      }
    }
    // full agreement must score at least as high as any emitted pair
    val full = rows.filter(r => r.getAs[Int]("agree_id") == 1 &&
      r.getAs[Int]("agree_band") == 1 && r.getAs[Int]("agree_sign") == 1)
    if (full.nonEmpty) {
      val fs = full.head.getAs[Double]("score")
      assert(rows.forall(_.getAs[Double]("score") <= fs + 1e-9))
    }
  }
}
