package graft

import org.apache.spark.sql.functions._

/** Invariant + brute-force-replica checks for the wave-4 operators:
  * grid-blocked spatial joins (GeoQueries), BLEU/WER pair metrics, and
  * the AMS F2 sketch.
  */
class WaveTwentyOneSpec extends SparkSpec {

  import graft.relational.GeoQueries.{Cell, Radius, World}

  /** Brute-force (customer × supplier) distances at sf0.001 — 150×10
    * rows, the ground truth the blocked operators must agree with.
    */
  private lazy val bruteForce = {
    val c = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_mktsegment"),
        ((col("c_custkey") * 48271L + 11L) % World).as("cx"),
        ((col("c_custkey") * 69621L + 17L) % World).as("cy"))
    val s = Tables.load(spark, sfDir, "supplier")
      .select(col("s_suppkey"),
        ((col("s_suppkey") * 40503L + 23L) % World).as("sx"),
        ((col("s_suppkey") * 45989L + 29L) % World).as("sy"))
    c.crossJoin(s)
      .select(col("c_custkey"), col("c_mktsegment"), col("s_suppkey"),
        (col("cx") - col("sx")).as("dx"), (col("cy") - col("sy")).as("dy"),
        ((col("cx") - col("sx")) * (col("cx") - col("sx")) +
         (col("cy") - col("sy")) * (col("cy") - col("sy"))).as("d2"))
      .collect()
  }

  test("q_geo_knn: reported distances exact; rank-1 = true NN when in-block") {
    val got = SparkEntry.queries("q_geo_knn")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(got.nonEmpty)
    val bf = bruteForce.map(r => (r.getLong(0), r.getLong(2)) -> r.getAs[Long]("d2")).toMap
    // every reported (c, s, d2) matches the recomputed exact distance,
    // and ranks are ordered with the (d2, s_suppkey) tie-break
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val byRank = rows.sortBy(_.getInt(1))
      byRank.foreach { r =>
        assert(bf((r.getLong(0), r.getLong(2))) == r.getAs[Long]("d2"))
      }
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          val (da, db) = (a.getAs[Long]("d2"), b.getAs[Long]("d2"))
          assert(da < db || (da == db && a.getLong(2) < b.getLong(2)))
        case _ =>
      }
    }
    // blocking guarantee: if the TRUE nearest supplier is within Cell in
    // both axes (Chebyshev), the 3x3 neighborhood must contain it, so
    // rank-1 equals the brute-force argmin
    val rank1 = got.filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> (r.getLong(2), r.getAs[Long]("d2"))).toMap
    bruteForce.groupBy(_.getLong(0)).foreach { case (c, rows) =>
      val best = rows.minBy(r => (r.getAs[Long]("d2"), r.getLong(2)))
      if (math.abs(best.getAs[Long]("dx")) <= Cell &&
          math.abs(best.getAs[Long]("dy")) <= Cell) {
        assert(rank1.contains(c), s"customer $c missing from blocked kNN")
        assert(rank1(c) == ((best.getLong(2), best.getAs[Long]("d2"))),
          s"customer $c: blocked rank-1 ${rank1(c)} != true NN")
      }
    }
  }

  test("q_geo_radius_pairs: blocked count == brute-force count (complete cover)") {
    val got = SparkEntry.queries("q_geo_radius_pairs")(spark, sfDir).collect()
    CacheScope.releaseAll()
    val gotN = got.map(_.getAs[Long]("n_pairs")).sum
    val trueN = bruteForce.count(_.getAs[Long]("d2") <= Radius * Radius)
    assert(gotN == trueN, s"blocked=$gotN brute=$trueN — R <= Cell cover violated")
  }

  test("q_geo_morton: z blocks are consistent 256-cell ranges") {
    val got = SparkEntry.queries("q_geo_morton")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(got.nonEmpty && got.length <= 20)
    got.foreach { r =>
      val (blk, zmin, zmax) = (r.getAs[Long]("z_block"),
        r.getAs[Long]("z_min"), r.getAs[Long]("z_max"))
      assert(zmin >= blk * 256 && zmax < (blk + 1) * 256 && zmin <= zmax)
      assert(zmax < (1L << 20))
      assert(r.getAs[Long]("n_cells") <= 256)
      assert(r.getAs[Long]("n_points") >= r.getAs[Long]("n_cells"))
    }
  }

  test("q_geo_hotspot: score in (0, 9], neighborhood sum >= own count") {
    val got = SparkEntry.queries("q_geo_hotspot")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Long]("neigh_n") >= r.getAs[Long]("n"))
      val sc = r.getAs[Double]("score")
      assert(sc > 0.0 && sc <= 9.0, s"score=$sc")
    }
  }

  test("text_bleu_pairs: components in [0,1] and bleu2 = bp*sqrt(p1*p2)") {
    val got = SparkEntry.queries("text_bleu_pairs")(spark, sfDir).collect()
    CacheScope.releaseAll()
    got.foreach { r =>
      val (p1, p2, bp, b) = (r.getAs[Double]("p1"), r.getAs[Double]("p2"),
        r.getAs[Double]("bp"), r.getAs[Double]("bleu2"))
      Seq(p1, p2, bp, b).foreach(v => assert(v >= 0.0 && v <= 1.0, s"$v"))
      assert(math.abs(b - bp * math.sqrt(p1 * p2)) < 1e-4,
        s"bleu2=$b != bp*sqrt(p1*p2)=${bp * math.sqrt(p1 * p2)}")
    }
  }

  test("text_wer_pairs: levenshtein bounds hold") {
    val got = SparkEntry.queries("text_wer_pairs")(spark, sfDir).collect()
    CacheScope.releaseAll()
    got.foreach { r =>
      val (lr, lh, lev) = (r.getAs[Int]("len_ref"), r.getAs[Int]("len_hyp"),
        r.getAs[Int]("lev_tokens"))
      assert(lev >= math.abs(lr - lh) && lev <= math.max(lr, lh),
        s"lev=$lev len_ref=$lr len_hyp=$lh")
      assert(math.abs(r.getAs[Double]("wer") - lev.toDouble / lr) < 1e-5)
      assert(lr >= 1 && lr <= dedup.PairEvalQueries.WerMaxTokens)
    }
  }

  test("q_stats_mcnemar: cell counts partition, statistic reconstructs") {
    val r = SparkEntry.queries("q_stats_mcnemar")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val (n, both, b, c) = (r(0).getAs[Long]("n_docs"), r(0).getAs[Long]("n_both"),
      r(0).getAs[Long]("b_nb_only"), r(0).getAs[Long]("c_h_only"))
    assert(both + b + c <= n)
    val chi2 = r(0).getAs[Double]("mcnemar_chi2")
    if (b + c > 0) {
      val exp = math.pow(math.abs(b - c) - 1.0, 2) / (b + c)
      assert(math.abs(chi2 - exp) < 1e-6, s"chi2=$chi2 exp=$exp")
    } else assert(chi2 == 0.0)
  }

  test("q_stats_fisher_exact: p-values bracket the observed table") {
    val r = SparkEntry.queries("q_stats_fisher_exact")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val (n, r1, c1, a) = (r(0).getAs[Long]("n"), r(0).getAs[Long]("r1"),
      r(0).getAs[Long]("c1"), r(0).getAs[Long]("a"))
    assert(a <= r1 && a <= c1 && r1 <= n && c1 <= n)
    val lpObs = r(0).getAs[Double]("lp_obs")
    val (pg, pt) = (r(0).getAs[Double]("p_greater"), r(0).getAs[Double]("p_two_sided"))
    assert(lpObs <= 0.0)
    // the observed table's own probability is in BOTH tails
    Seq(pg, pt).foreach { p =>
      assert(p >= math.exp(lpObs) - 1e-9 && p <= 1.0 + 1e-9, s"p=$p lp=$lpObs")
    }
  }

  test("text_eval_auc_delong: CI brackets the AUC, z reconstructs") {
    val r = SparkEntry.queries("text_eval_auc_delong")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val (auc, se) = (r(0).getAs[Double]("auc"), r(0).getAs[Double]("auc_se"))
    val (lo, hi) = (r(0).getAs[Double]("ci_lo"), r(0).getAs[Double]("ci_hi"))
    assert(auc >= 0.0 && auc <= 1.0)
    assert(se > 0.0 && se < 0.5, s"se=$se")
    assert(lo < auc && auc < hi)
    assert(math.abs((hi - lo) - 2 * 1.96 * se) < 1e-4)
    val z = r(0).getAs[Double]("z_vs_half")
    assert(math.abs(z - (auc - 0.5) / se) < 0.01, s"z=$z")
  }

  test("q_ts_ljungbox: Q nonnegative, lag count bounded") {
    val got = SparkEntry.queries("q_ts_ljungbox")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getAs[Double]("q_lb") >= 0.0)
      val nl = r.getAs[Long]("n_lags")
      assert(nl >= 1 && nl <= relational.TimeSeriesQueries.AcfMaxLag)
      assert(r.getAs[Long]("n_obs") > nl)
    }
  }

  test("q_ts_dickey_fuller: differenced series pulls beta negative-or-small") {
    val got = SparkEntry.queries("q_ts_dickey_fuller")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(got.nonEmpty)
    got.foreach { r =>
      // beta is an OLS slope of a diff on the level: |beta| < 2 for any
      // real series (beta = -1 is white noise, 0 is a random walk)
      val b = r.getAs[Double]("beta")
      assert(b > -2.0 && b < 2.0, s"beta=$b")
      assert(r.getAs[Long]("n_obs") > 2)
      // t and beta share a sign (se > 0)
      val t = r.getAs[Double]("t_df")
      if (math.abs(b) > 1e-9) assert(t.sign == b.sign, s"t=$t beta=$b")
    }
  }

  test("q_ts_kpss: statistic positive and bounded by (n+1)(2n+1)/6n") {
    val got = SparkEntry.queries("q_ts_kpss")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (n, k) = (r.getAs[Long]("n_obs"), r.getAs[Double]("kpss"))
      // eta = sum(P_t^2)/(n*sum(E^2)); Cauchy-Schwarz on the prefix sums
      // bounds it by sum over t of t^2/n... the loose structural rail:
      assert(k > 0.0 && k < n.toDouble, s"kpss=$k n=$n")
    }
  }

  test("q_stats_trend: z is finite and groups cover the priority domain") {
    val r = SparkEntry.queries("q_stats_trend")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_groups") == 5)
    assert(r(0).getAs[Long]("n_pos") <= r(0).getAs[Long]("n_total"))
    val z = r(0).getAs[Double]("z_trend")
    assert(!z.isNaN && math.abs(z) < math.sqrt(r(0).getAs[Long]("n_total").toDouble))
  }

  test("text_eval_ece/brier: bounds hold and Murphy's identity ties them") {
    val ece = SparkEntry.queries("text_eval_ece")(spark, sfDir).collect()
    val br = SparkEntry.queries("text_eval_brier")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(ece.length == 1 && br.length == 1)
    val (e, mce) = (ece(0).getAs[Double]("ece"), ece(0).getAs[Double]("mce"))
    assert(e >= 0.0 && e <= 1.0 && mce >= e - 1e-9 && mce <= 1.0)
    val (bs, rel, res, unc) = (br(0).getAs[Double]("brier"),
      br(0).getAs[Double]("reliability"), br(0).getAs[Double]("resolution"),
      br(0).getAs[Double]("uncertainty"))
    assert(bs >= 0.0 && bs <= 1.0 && rel >= 0.0 && res >= 0.0)
    assert(unc >= 0.0 && unc <= 0.25 + 1e-9)
    // Murphy: BS = REL - RES + UNC exactly only for bin-CONSTANT
    // forecasts; with continuous scores in 0.1-wide bins the residual
    // is the within-bin forecast variance/covariance, bounded by
    // (width/2)^2 = 0.0025 per bin — rail at 0.01
    assert(math.abs(bs - (rel - res + unc)) < 0.01,
      s"bs=$bs rel=$rel res=$res unc=$unc")
  }

  test("q_rec_coverage: coverage in (0,1], novelty positive, counts consistent") {
    val r = SparkEntry.queries("q_rec_coverage")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val (items, cat, recs) = (r(0).getAs[Long]("n_rec_items"),
      r(0).getAs[Long]("n_catalog"), r(0).getAs[Long]("n_recs"))
    assert(items > 0 && items <= cat && recs >= items)
    val cov = r(0).getAs[Double]("coverage")
    assert(math.abs(cov - items.toDouble / cat) < 1e-6)
    // every item appears in >= 1 basket, so -log2(pop) >= 0
    assert(r(0).getAs[Double]("novelty_bits") >= 0.0)
  }

  test("q_stats_power: n_per_arm reconstructs from the closed form") {
    val r = SparkEntry.queries("q_stats_power")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val (n1, x1, n2, x2) = (r(0).getAs[Long]("n1"), r(0).getAs[Long]("x1"),
      r(0).getAs[Long]("n2"), r(0).getAs[Long]("x2"))
    val (p1, p2) = (x1.toDouble / n1, x2.toDouble / n2)
    val zs = relational.InferenceEffectQueries.PowerZAlpha +
      relational.InferenceEffectQueries.PowerZBeta
    val exp = math.ceil(zs * zs * (p1 * (1 - p1) + p2 * (1 - p2)) /
      ((p1 - p2) * (p1 - p2))).toLong
    assert(r(0).getAs[Long]("n_per_arm") == exp)
  }

  test("text_eval_lift: gain and lift are monotone where they must be") {
    val got = SparkEntry.queries("text_eval_lift")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(got.nonEmpty)
    val byBin = got.sortBy(-_.getInt(0))
    // cumulative-from-the-top: n_cum and pos_cum grow as bin decreases,
    // gain ends at 1.0 at the lowest bin
    byBin.sliding(2).foreach {
      case Array(hi, lo) =>
        assert(lo.getAs[Long]("n_cum") >= hi.getAs[Long]("n_cum"))
        assert(lo.getAs[Long]("pos_cum") >= hi.getAs[Long]("pos_cum"))
      case _ =>
    }
    val bottom = byBin.last
    assert(math.abs(bottom.getAs[Double]("gain") - 1.0) < 1e-9)
    assert(math.abs(bottom.getAs[Double]("lift") - 1.0) < 1e-9)
    got.foreach(r => assert(r.getAs[Double]("lift") >= 0.0))
  }

  test("q_stats_oddsratio: cells partition n, CI brackets the OR") {
    val r = SparkEntry.queries("q_stats_oddsratio")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val (n, a, b, c, d) = (r(0).getAs[Long]("n"), r(0).getAs[Long]("a"),
      r(0).getAs[Long]("b"), r(0).getAs[Long]("c"), r(0).getAs[Long]("d"))
    assert(a + b + c + d == n)
    val or = r(0).getAs[Double]("odds_ratio")
    assert(math.abs(or - (a.toDouble * d) / (b.toDouble * c)) < 1e-5)
    val (lo, hi) = (r(0).getAs[Double]("ci_lo"), r(0).getAs[Double]("ci_hi"))
    assert(lo > 0.0 && lo < or && or < hi)
  }

  test("q_dp_tcloseness: EMD in [0,1], global group would score 0") {
    val got = SparkEntry.queries("q_dp_tcloseness")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(got.nonEmpty)
    got.foreach { r =>
      val tc = r.getAs[Double]("t_close")
      assert(tc >= 0.0 && tc <= 1.0 + 1e-9, s"t=$tc")
      assert(r.getAs[Int]("t_ok") == (if (tc <= relational.PrivacyQueries.TClose) 1 else 0))
      assert(r.getAs[Long]("n_rows") > 0)
    }
  }

  test("q_decision_ucb: bonus positive, at least one arm chosen at the max") {
    val got = SparkEntry.queries("q_decision_ucb")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(got.nonEmpty)
    val n = got.map(_.getAs[Long]("n_pulls")).sum
    got.foreach { r =>
      assert(r.getAs[Long]("n_total") == n)
      assert(r.getAs[Double]("ucb") > r.getAs[Double]("mean_reward"))
    }
    val chosen = got.filter(_.getAs[Boolean]("chosen"))
    assert(chosen.nonEmpty)
    val maxUcb = got.map(_.getAs[Double]("ucb")).max
    chosen.foreach(r => assert(r.getAs[Double]("ucb") == maxUcb))
  }

  test("q_stats_partial_corr: correlations in [-1,1], composition holds") {
    val got = SparkEntry.queries("q_stats_partial_corr")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (rxy, rxz, ryz, p) = (r.getAs[Double]("r_xy"), r.getAs[Double]("r_xz"),
        r.getAs[Double]("r_yz"), r.getAs[Double]("r_xy_given_z"))
      Seq(rxy, rxz, ryz, p).foreach(v =>
        assert(v >= -1.0 - 1e-9 && v <= 1.0 + 1e-9, s"r=$v"))
      val expected = (rxy - rxz * ryz) /
        math.sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz))
      // rounded components reconstruct the partial r to rounding error
      assert(math.abs(p - expected) < 1e-4, s"p=$p expected=$expected")
    }
  }

  test("q_layout_zonemap: range-sort is disjoint and never scans more") {
    val got = SparkEntry.queries("q_layout_zonemap")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(got.length == 2)
    val byLayout = got.map(r => r.getString(0) -> r).toMap
    val ins = byLayout("insertion")
    val rng = byLayout("range_sorted")
    // a range-partitioned layout has disjoint zone maps by construction
    assert(rng.getAs[Long]("overlap_pairs") == 0L)
    got.foreach { r =>
      assert(r.getAs[Long]("files_scanned") <= r.getAs[Long]("n_files"))
      // scanned files must contain every matching row
      assert(r.getAs[Long]("rows_scanned") >= r.getAs[Long]("rows_match"))
      assert(r.getAs[Double]("read_amp") >= 1.0 - 1e-9)
    }
    assert(rng.getAs[Long]("files_scanned") <= ins.getAs[Long]("files_scanned"))
    assert(rng.getAs[Double]("avg_span_days") <= ins.getAs[Double]("avg_span_days"))
  }

  test("q_rank_rrf: fused score reconstructs from the component ranks") {
    val got = SparkEntry.queries("q_rank_rrf")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(got.nonEmpty)
    val k = sim.RankEvalQueries.RrfKConst
    got.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      assert(rows.length <= 5)
      rows.foreach { r =>
        val (rc, rd) = (r.getAs[Int]("rank_cos"), r.getAs[Int]("rank_dot"))
        assert(rc >= 0 && rc <= sim.RankEvalQueries.RankK)
        assert(rd >= 0 && rd <= sim.RankEvalQueries.RankK)
        assert(rc > 0 || rd > 0)
        val expected =
          (if (rc > 0) BigDecimal(1.0 / (k + rc)).setScale(9, BigDecimal.RoundingMode.HALF_UP) else BigDecimal(0)) +
          (if (rd > 0) BigDecimal(1.0 / (k + rd)).setScale(9, BigDecimal.RoundingMode.HALF_UP) else BigDecimal(0))
      assert(math.abs(r.getAs[Double]("rrf") - expected.toDouble) < 1e-9)
      }
      // fused ranks are 1..m with descending rrf
      val byRank = rows.sortBy(_.getAs[Int]("fused_rank"))
      assert(byRank.map(_.getAs[Int]("fused_rank")).toSeq == (1 to rows.length))
      byRank.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Double]("rrf") >= b.getAs[Double]("rrf") - 1e-12)
        case _ =>
      }
    }
  }

  test("q_sketch_ams: exact F2 bracketed, estimator structure sane") {
    val r = SparkEntry.queries("q_sketch_ams")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val nEvents = Tables.load(spark, sfDir, "events").count()
    val f2 = r(0).getAs[Long]("f2_exact")
    // sum of f^2 over per-user counts f>=1 is at least the event count
    // and at most its square (all events one user)
    assert(f2 >= nEvents && f2 <= nEvents * nEvents)
    assert(r(0).getAs[Int]("n_estimators") == sketch.SketchQueries.AmsK)
    assert(r(0).getAs[Double]("f2_est") >= 0.0)
    // median-of-8 tug-of-war on this distribution: loose 3x sanity rail
    assert(r(0).getAs[Double]("rel_err") <= 3.0)
  }
}
