package graft

/** Invariant checks for the hypothesis-testing wave (InferenceQueries):
  * Wilcoxon signed-rank, Jarque–Bera, Cramér's V, Cohen's d, Grubbs,
  * two-proportion z — closed-form bounds each statistic must respect
  * regardless of the data.
  */
class WaveTwentySpec extends SparkSpec {

  test("q_stats_wilcoxon: W+ within [0, n(n+1)/2]") {
    val r = SparkEntry.queries("q_stats_wilcoxon")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val n = r(0).getAs[Long]("n_pairs")
    val w = r(0).getAs[Double]("w_plus")
    assert(n > 0)
    assert(w >= 0.0 && w <= n.toDouble * (n + 1) / 2, s"w_plus=$w n=$n")
    // w_plus is a sum of integer ranks plus half-ranks: 2w integral
    assert((w * 2) == math.rint(w * 2))
  }

  test("q_stats_jarque_bera: jb >= 0, kurtosis > 0") {
    val r = SparkEntry.queries("q_stats_jarque_bera")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Double]("jb") >= 0.0)
      // kurtosis m4/m2^2 of a non-degenerate series is strictly positive
      assert(row.getAs[Double]("kurtosis") > 0.0)
      assert(row.getAs[Long]("n_days") >= 8)
    }
  }

  test("q_stats_cramers_v: V in [0,1], chi2 >= 0") {
    val r = SparkEntry.queries("q_stats_cramers_v")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val v = r(0).getAs[Double]("cramers_v")
    assert(v >= 0.0 && v <= 1.0 + 1e-9, s"V=$v")
    assert(r(0).getAs[Double]("chi2") >= 0.0)
  }

  test("q_stats_cohens_d: sign tracks the mean shift") {
    val r = SparkEntry.queries("q_stats_cohens_d")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.nonEmpty)
    r.foreach { row =>
      val d = row.getAs[Double]("cohens_d")
      val shift = row.getAs[Double]("mean_second") - row.getAs[Double]("mean_first")
      // rounded means can mask a tiny shift; only assert when visible
      if (math.abs(shift) > 1e-3) assert(d.sign == shift.sign, s"d=$d shift=$shift")
    }
  }

  test("q_stats_grubbs: G within (0, (n-1)/sqrt(n)]") {
    val r = SparkEntry.queries("q_stats_grubbs")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.nonEmpty)
    r.foreach { row =>
      val g = row.getAs[Double]("grubbs_g")
      val n = row.getAs[Long]("n_days").toDouble
      // one-sample deviation can't exceed (n-1)/sqrt(n) sd units
      assert(g > 0.0 && g <= (n - 1) / math.sqrt(n) + 1e-9, s"g=$g n=$n")
    }
  }

  test("sim_silhouette: scores in [-1, 1], memberships match sim_kmeans") {
    val sil = SparkEntry.queries("sim_silhouette")(spark, sfDir).collect()
    val km = SparkEntry.queries("sim_kmeans")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(sil.nonEmpty)
    sil.foreach { r =>
      val s = r.getAs[Double]("mean_silhouette")
      assert(s >= -1.0 && s <= 1.0, s"sil=$s")
    }
    val kmBy = km.map(r => r.getAs[Long]("cluster_id") -> r.getAs[Long]("n_members")).toMap
    sil.foreach(r => assert(
      kmBy(r.getAs[Long]("cluster_id")) == r.getAs[Long]("n_members")))
  }

  test("mm_audio_pitch: period inside the lag search range, frames align with energy") {
    val p = SparkEntry.queries("mm_audio_pitch")(spark, sfDir).collect()
    val e = SparkEntry.queries("mm_audio_energy")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(p.nonEmpty)
    import mm.MultimodalQueries._
    p.foreach { r =>
      val period = r.getAs[Long]("period")
      assert(period >= PitchMinLag && period <= PitchMaxLag, s"period=$period")
      assert(r.getAs[Boolean]("voiced") == (r.getAs[Long]("peak_r") > 0))
    }
    // same framing as the energy extractor: identical (doc, frame) keys
    def keys(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Any]("doc_id").toString, r.getAs[Long]("frame"))).toSet
    assert(keys(p) == keys(e))
  }

  test("text_lsa: nonnegative loadings with the max pinned at 1") {
    val r = SparkEntry.queries("text_lsa")(spark, sfDir).collect()
    CacheScope.releaseAll()
    // count matrix is nonnegative, so v2 = (AtA)^2 * 1 >= 0 coordinatewise
    assert(r.length == text.TextModelQueries.LsaTopK)
    val ls = r.map(_.getAs[Double]("loading"))
    assert(ls.forall(l => l >= 0.0 && l <= 1.0))
    assert(ls.max == 1.0)
  }

  test("q_ts_garch: sigma bounded below by the base-variance floor") {
    val r = SparkEntry.queries("q_ts_garch")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.nonEmpty)
    import relational.RollingQueries._
    val floor = math.sqrt(GarchOmega *
      (0 until GarchTaps).map(j => BigDecimal(math.pow(GarchBeta, j))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)).sum.toDouble)
    r.foreach { row =>
      val s = row.getAs[Double]("sigma_h")
      assert(s >= floor - 1e-9, s"sigma=$s floor=$floor")
    }
  }

  test("q_stats_esd: round 1 is the Grubbs pick, no day repeats, rounds complete") {
    val esd = SparkEntry.queries("q_stats_esd")(spark, sfDir).collect()
    val gr = SparkEntry.queries("q_stats_grubbs")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(esd.nonEmpty)
    import relational.InferenceSequentialQueries.EsdRounds
    val byType = esd.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (t, rows) =>
      assert(rows.length == EsdRounds, s"$t rounds=${rows.length}")
      val days = rows.map(_.getAs[String]("outlier_day"))
      assert(days.distinct.length == days.length, s"$t repeated a day")
      rows.foreach(r => assert(r.getAs[Double]("r_stat") > 0))
    }
    // the first ESD round IS the single-Grubbs answer
    val g1 = gr.map(r => r.getAs[String]("event_type") ->
      (r.getAs[String]("outlier_day"), r.getAs[Double]("grubbs_g"))).toMap
    esd.filter(_.getAs[Int]("round") == 1).foreach { r =>
      val (day, g) = g1(r.getAs[String]("event_type"))
      assert(r.getAs[String]("outlier_day") == day)
      assert(r.getAs[Double]("r_stat") == g)
    }
  }

  test("q_ts_chow: F nonnegative (split model nests the pooled one)") {
    val r = SparkEntry.queries("q_ts_chow")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Double]("f_stat") >= -1e-6)
      assert(row.getAs[Long]("n_first") >= 4 && row.getAs[Long]("n_second") >= 4)
    }
  }

  test("q_dp_exponential: exactly one winner, and it is the max noisy score") {
    val r = SparkEntry.queries("q_dp_exponential")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.nonEmpty)
    val winners = r.filter(_.getAs[Boolean]("is_winner"))
    assert(winners.length == 1)
    val best = r.map(_.getAs[Double]("noisy_score")).max
    assert(winners(0).getAs[Double]("noisy_score") == best)
  }

  test("q_ts_granger: F nonnegative (nesting), pair fan-out bounded") {
    val r = SparkEntry.queries("q_ts_granger")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.nonEmpty)
    r.foreach { row =>
      // the restricted model is nested in the unrestricted one, so
      // SSE_r >= SSE_u and F >= 0 up to the 6dp output rounding
      assert(row.getAs[Double]("f_stat") >= -1e-6,
        s"F=${row.getAs[Double]("f_stat")}")
      assert(row.getAs[String]("x_type") != row.getAs[String]("y_type"))
    }
    val types = r.map(_.getAs[String]("x_type")).distinct.length
    assert(r.length <= types * (types + 1))
  }

  test("q_stats_winsor_mean: bounds bracket the estimate, nothing dropped") {
    val w = SparkEntry.queries("q_stats_winsor_mean")(spark, sfDir).collect()
    val tm = SparkEntry.queries("q_stats_trimmed_mean")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(w.length == 1)
    val row = w(0)
    val (lo, hi, m) = (row.getAs[Double]("lo_usd"), row.getAs[Double]("hi_usd"),
      row.getAs[Double]("winsor_mean_usd"))
    assert(lo <= m && m <= hi, s"$lo / $m / $hi")
    // winsorizing keeps every row — n equals the trimmed query's total n
    assert(row.getAs[Long]("n") == tm(0).getAs[Long]("n"))
    // 10% winsor bounds sit inside the 5% trim bounds
    assert(lo >= tm(0).getAs[Double]("lo_usd") - 1e-9)
    assert(hi <= tm(0).getAs[Double]("hi_usd") + 1e-9)
  }

  test("q_stats_friedman: mean ranks average to (k+1)/2, chi2 >= 0") {
    val r = SparkEntry.queries("q_stats_friedman")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.nonEmpty)
    val k = r(0).getAs[Long]("k")
    assert(r.length == k)
    // ranks within a block are a permutation (up to ties), so the mean
    // of the per-type mean ranks is exactly (k+1)/2
    val avg = r.map(_.getAs[Double]("mean_rank")).sum / k
    assert(math.abs(avg - (k + 1) / 2.0) < 1e-6, s"avg=$avg k=$k")
    assert(r(0).getAs[Double]("chi2") >= 0.0)
  }

  test("q_ts_spectral_entropy: H in [0,1], dominant period inside the grid") {
    val r = SparkEntry.queries("q_ts_spectral_entropy")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.nonEmpty)
    import relational.SpectralQueries.SpecMaxPeriod
    r.foreach { row =>
      val h = row.getAs[Double]("spectral_entropy")
      assert(h >= 0.0 && h <= 1.0 + 1e-6, s"H=$h")
      val p = row.getAs[Long]("dominant_period")
      assert(p >= 2 && p <= SpecMaxPeriod)
    }
  }

  test("sim_centroid_drift: cosine in [-1,1], norm ratio positive, halves partition") {
    val r = SparkEntry.queries("sim_centroid_drift")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.nonEmpty)
    r.foreach { row =>
      val c = row.getAs[Double]("centroid_cos")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9, s"cos=$c")
      assert(row.getAs[Double]("norm_ratio") > 0)
      assert(row.getAs[Long]("n_old") > 0 && row.getAs[Long]("n_new") > 0)
    }
  }

  test("text_heaps: beta in [0,1], K positive, vocabulary bounded by tokens") {
    val r = SparkEntry.queries("text_heaps")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val row = r(0)
    val beta = row.getAs[Double]("beta")
    // sublinear vocabulary growth: 0 (saturated vocab — this synthetic
    // corpus) through 1 (every token new)
    assert(beta >= -1e-9 && beta <= 1.0 + 1e-9, s"beta=$beta")
    assert(row.getAs[Double]("k") > 0)
    assert(row.getAs[Long]("n_terms") <= row.getAs[Long]("n_tokens"))
  }

  test("q_user_entropy: H within [0, ln k], single-type flag consistent") {
    val r = SparkEntry.queries("q_user_entropy")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.nonEmpty)
    r.foreach { row =>
      val h = row.getAs[Double]("entropy")
      val k = row.getAs[Long]("n_types")
      assert(h >= -1e-9 && h <= math.log(k.toDouble) + 1e-6, s"H=$h k=$k")
      assert(row.getAs[Boolean]("single_type") == (k == 1))
      if (k == 1) assert(math.abs(h) < 1e-9)
    }
  }

  test("q_graph_triads: counts nonnegative, planted check via reciprocity") {
    val r = SparkEntry.queries("q_graph_triads")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n_transitive") >= 0)
    assert(r(0).getAs[Long]("n_cyclic") >= 0)
  }

  test("q_graph_reciprocity: ratio consistent and within [0,1]") {
    val r = SparkEntry.queries("q_graph_reciprocity")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val row = r(0)
    val (n, m) = (row.getAs[Long]("n_edges"), row.getAs[Long]("n_reciprocal"))
    assert(n > 0 && m >= 0 && m <= n)
    // reciprocal edges come in pairs
    assert(m % 2 == 0)
  }

  test("q_events_stickiness: dau <= wau <= mau, stickiness in (0, 1]") {
    val r = SparkEntry.queries("q_events_stickiness")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (d, w, m) = (row.getAs[Long]("dau"), row.getAs[Long]("wau"),
        row.getAs[Long]("mau"))
      assert(d <= w && w <= m, s"dau=$d wau=$w mau=$m")
      val s = row.getAs[Double]("stickiness")
      assert(s > 0 && s <= 1.0)
    }
    // one row per day in range, continuous
    val days = r.map(_.getAs[java.sql.Date]("day").toLocalDate).sorted
    assert(days.distinct.length == days.length)
    assert(java.time.temporal.ChronoUnit.DAYS.between(
      days.head, days.last) == days.length - 1)
  }

  test("q_markov_absorption: steps within [1, iters], error excluded") {
    val r = SparkEntry.queries("q_markov_absorption")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.nonEmpty)
    import relational.MarkovQueries.{AbsorbIters, MarkovAbsorb}
    r.foreach { row =>
      assert(row.getAs[String]("state") != MarkovAbsorb)
      val e = row.getAs[Double]("expected_steps")
      // every transient state needs >= 1 step; truncation caps at iters
      assert(e >= 1.0 && e <= AbsorbIters + 1e-9, s"e=$e")
      assert(row.getAs[Boolean]("is_saturated") == (e > AbsorbIters - 1e-6))
    }
  }

  test("text_readability: flesch recomputes from its own components") {
    val r = SparkEntry.queries("text_readability")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (w, s, y) = (row.getAs[Long]("n_words").toDouble,
        row.getAs[Long]("n_sentences").toDouble,
        row.getAs[Long]("n_syllables").toDouble)
      assert(w >= 1 && s >= 1 && y >= 1)
      val expect = BigDecimal(206.835 - 1.015 * (w / s) - 84.6 * (y / w))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(row.getAs[Double]("flesch") - expect) < 1e-9)
    }
  }

  test("q_ml_learning_curve: train sizes strictly grow, r2 <= 1") {
    val r = SparkEntry.queries("q_ml_learning_curve")(spark, sfDir).collect()
    CacheScope.releaseAll()
    import relational.ModelPrepQueries.LcSizes
    assert(r.length == LcSizes.length)
    val sorted = r.sortBy(_.getAs[Int]("n_folds_train"))
    val sizes = sorted.map(_.getAs[Long]("n_train"))
    assert(sizes.zip(sizes.tail).forall { case (a, b) => a < b }, sizes.toSeq)
    sorted.foreach { row =>
      assert(row.getAs[Double]("r2_holdout") <= 1.0)
      // the synthetic corpus draws quantity and price independently
      // (measured corr ~ 0), so only finiteness is assertable on beta
      assert(!row.getAs[Double]("beta").isNaN)
    }
  }

  test("q_ml_gmm_em: weights in (0,1), component means stay ordered") {
    val r = SparkEntry.queries("q_ml_gmm_em")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.nonEmpty)
    r.foreach { row =>
      val w2 = row.getAs[Double]("weight2")
      assert(w2 > 0 && w2 < 1, s"w2=$w2")
      assert(row.getAs[Double]("mu1_new") < row.getAs[Double]("mu2_new"))
    }
  }

  test("q_stats_runs: run count within [1, n], counts add up") {
    val r = SparkEntry.queries("q_stats_runs")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.nonEmpty)
    r.foreach { row =>
      val (n, n1, n2, runs) = (row.getAs[Long]("n_days"),
        row.getAs[Long]("n_above"), row.getAs[Long]("n_below"),
        row.getAs[Long]("runs"))
      assert(n1 + n2 == n)
      assert(runs >= 1 && runs <= n, s"runs=$runs n=$n")
      // runs can't exceed 2*min(n1,n2)+1 (alternation is capped by the
      // rarer sign)
      assert(runs <= 2 * math.min(n1, n2) + 1)
    }
  }

  test("q_ml_als_round/rmse: least-squares fit beats the zero predictor") {
    import org.apache.spark.sql.functions._
    val u = SparkEntry.queries("q_ml_als_round")(spark, sfDir).collect()
    val rm = SparkEntry.queries("q_ml_als_rmse")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(u.nonEmpty)
    u.foreach { r =>
      assert(!r.getAs[Double]("u1").isNaN && !r.getAs[Double]("u2").isNaN)
      assert(r.getAs[Long]("n_items") > 0)
    }
    assert(rm.length == 1)
    val rmse = rm(0).getAs[Double]("rmse")
    // the ridge solve minimizes ||r - Vu||^2 + lambda||u||^2, whose
    // optimum is <= the u=0 objective, so SSE <= sum(r^2) exactly
    val zero = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("l_partkey"))
      .agg(sum(col("l_quantity").cast("long")).as("r"))
      .agg(sqrt(avg(col("r") * col("r"))).as("z")).collect()(0).getDouble(0)
    assert(rmse > 0 && rmse <= zero, s"rmse=$rmse zero=$zero")
  }

  test("q_stats_two_prop: proportions valid, z sign tracks the rate shift") {
    val r = SparkEntry.queries("q_stats_two_prop")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val row = r(0)
    val (p1, p2) = (row.getAs[Double]("p_first"), row.getAs[Double]("p_second"))
    assert(p1 >= 0.0 && p1 <= 1.0 && p2 >= 0.0 && p2 <= 1.0)
    val z = row.getAs[Double]("z")
    if (math.abs(p1 - p2) > 1e-9) assert(z.sign == (p1 - p2).sign, s"z=$z p1=$p1 p2=$p2")
    assert(row.getAs[Long]("x1") <= row.getAs[Long]("n1"))
    assert(row.getAs[Long]("x2") <= row.getAs[Long]("n2"))
  }
}
