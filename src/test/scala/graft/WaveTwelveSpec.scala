package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the round-11 second-wave operators (Spearman,
  * Mann–Kendall, AR(2), LASSO coordinate descent, feature hashing). The
  * DuckDB hash compare proves cross-engine parity; these prove the
  * SEMANTICS — correlation bounds, sign coherence, sparsity bookkeeping —
  * that a twin-implementation bug could preserve.
  */
class WaveTwelveSpec extends SparkSpec {

  test("q_stats_spearman: rho bounded in [-1,1], gated groups only") {
    val rows = SparkEntry.queries("q_stats_spearman")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_items") >= 10)
      val rho = r.getAs[Double]("rho")
      assert(rho >= -1.0 - 1e-9 && rho <= 1.0 + 1e-9, s"rho=$rho")
    }
  }

  test("q_ts_mannkendall: tau bounded, z sign matches S sign") {
    val rows = SparkEntry.queries("q_ts_mannkendall")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val s = r.getAs[Long]("s_stat")
      val z = r.getAs[Double]("z_mk")
      val tau = r.getAs[Double]("tau_b")
      assert(tau >= -1.0 - 1e-9 && tau <= 1.0 + 1e-9, s"tau=$tau")
      assert(math.signum(z) == math.signum(s.toDouble) || s.abs <= 1,
        s"z=$z vs s=$s")
      assert(math.signum(tau) == math.signum(s.toDouble) || s == 0)
    }
  }

  test("q_ts_ar2: coefficients and forecast finite, gates honored") {
    val rows = SparkEntry.queries("q_ts_ar2")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_days") >= 8)
      Seq("phi1", "phi2", "forecast_1d").foreach { c =>
        val v = r.getAs[Double](c)
        assert(!v.isNaN && !v.isInfinite, s"$c=$v")
      }
      // a stationary fit keeps the one-step forecast within a sane
      // multiple of the observed daily scale (cents -> dollars)
      assert(math.abs(r.getAs[Double]("forecast_1d")) < 1e9)
    }
  }

  test("q_ml_lasso_cd: nnz agrees with the betas, values finite") {
    val r = SparkEntry.queries("q_ml_lasso_cd")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val b1 = r(0).getAs[Double]("beta_qty")
    val b2 = r(0).getAs[Double]("beta_disc")
    val nnz = r(0).getAs[Long]("nnz")
    assert(nnz == Seq(b1, b2).count(_ != 0.0))
    Seq(b1, b2, r(0).getAs[Double]("intercept")).foreach { v =>
      assert(!v.isNaN && !v.isInfinite)
    }
  }

  test("text_feature_hash: buckets in range, sparse (no zero weights), deterministic") {
    val df = SparkEntry.queries("text_feature_hash")(spark, sfDir)
    val rows = df.collect()
    val again = SparkEntry.queries("text_feature_hash")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val b = r.getAs[Int]("bucket")
      assert(b >= 0 && b < graft.text.TextAnalysisQueries.FeatureHashBuckets)
      assert(r.getAs[Long]("w") != 0L)
    }
    assert(rows.map(_.toString).sorted.sameElements(again.map(_.toString).sorted))
  }
}
