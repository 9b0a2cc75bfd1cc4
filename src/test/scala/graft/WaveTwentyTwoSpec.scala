package graft

import org.apache.spark.sql.functions._

/** Invariant + brute-force-replica checks for the round-12 operators:
  * pipeline filter gates (Gopher rules, DSIR, OOV, CCNet split), the
  * ordered/adjusted inference tests (Page's L, ANCOVA, Cochran's Q,
  * Mood's median, concordance), entropy l-diversity, the Markov entropy
  * rate, triplet mining, Matryoshka recall, and blur detection.
  */
class WaveTwentyTwoSpec extends SparkSpec {

  private def run(name: String) = {
    val rows = SparkEntry.queries(name)(spark, sfDir).collect()
    CacheScope.releaseAll()
    rows
  }

  test("text_gopher_rules: per-lang gate counts bounded and kept-consistent") {
    val got = run("text_gopher_rules")
    assert(got.nonEmpty)
    val total = got.map(_.getAs[Long]("n_docs")).sum
    val corpus = Tables.load(spark, sfDir, "documents").count()
    assert(total == corpus)
    got.foreach { r =>
      val n = r.getAs[Long]("n_docs")
      Seq("fail_short", "fail_long", "fail_word_len", "fail_dup_frac",
        "fail_stopword").foreach { c =>
        assert(r.getAs[Long](c) >= 0 && r.getAs[Long](c) <= n, c)
      }
      // kept passes EVERY gate, so it can't exceed n minus the largest
      // single fail count
      val maxFail = Seq("fail_short", "fail_long", "fail_word_len",
        "fail_dup_frac", "fail_stopword").map(r.getAs[Long](_)).max
      assert(r.getAs[Long]("n_kept") <= n - maxFail)
    }
  }

  test("text_dsir_weights: deterministic descending order, bounded size") {
    val got = run("text_dsir_weights")
    assert(got.nonEmpty && got.length <= graft.text.PipelineFilterQueries.DsirTopK)
    got.foreach(r => assert(r.getAs[Long]("n_tokens") > 0))
    got.sliding(2).foreach {
      case Array(a, b) =>
        val (wa, wb) = (a.getAs[Double]("log_weight"), b.getAs[Double]("log_weight"))
        assert(wa > wb || (wa == wb && a.getAs[Long]("doc_id") < b.getAs[Long]("doc_id")))
      case _ =>
    }
  }

  test("text_oov_rate: exact Scala-set replica at sf0.001") {
    val got = run("text_oov_rate")
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "lang", "text").collect()
    CacheScope.releaseAll()
    def toks(t: String) = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
    val vocab = docs.filter(_.getLong(0) % 2 == 0)
      .flatMap(r => toks(r.getString(2))).toSet
    val byLang = docs.filter(_.getLong(0) % 2 == 1)
      .groupBy(_.getString(1))
    assert(got.length == byLang.size)
    got.foreach { r =>
      val tks = byLang(r.getString(0)).flatMap(d => toks(d.getString(2)))
      assert(r.getAs[Long]("n_tokens") == tks.length)
      assert(r.getAs[Long]("n_oov") == tks.count(t => !vocab.contains(t)))
      assert(r.getAs[Long]("n_types") == tks.toSet.size)
      assert(r.getAs[Long]("n_oov_types") == tks.toSet.count(t => !vocab.contains(t)))
    }
  }

  test("text_ccnet_split: buckets partition each language, ce ranges nest") {
    val got = run("text_ccnet_split")
    val langCounts = Tables.load(spark, sfDir, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    CacheScope.releaseAll()
    got.groupBy(_.getString(0)).foreach { case (lang, rows) =>
      assert(rows.map(_.getAs[Long]("n_docs")).sum == langCounts(lang))
      val by = rows.map(r => r.getString(1) ->
        (r.getAs[Double]("min_ce"), r.getAs[Double]("max_ce"))).toMap
      by.values.foreach { case (lo, hi) => assert(lo <= hi) }
      // tercile ordering: head <= middle <= tail (ties at the 6dp pin
      // boundary allowed)
      for (h <- by.get("head"); m <- by.get("middle")) assert(h._2 <= m._1)
      for (m <- by.get("middle"); t <- by.get("tail")) assert(m._2 <= t._1)
    }
  }

  test("q_stats_page_trend: L within rearrangement bounds") {
    val got = run("q_stats_page_trend")
    assert(got.length == 1)
    val r = got.head
    val k = r.getAs[Long]("k_treatments")
    val b = r.getAs[Long]("n_blocks")
    val l = r.getAs[Double]("page_l")
    assert(k >= 2 && b >= 1)
    // R_j sums of per-block midranks; by the rearrangement inequality
    // L = sum j*R_j is bounded by pairing j with reversed / sorted ranks
    val lMin = b.toDouble * (1L to k).map(j => j * (k + 1 - j)).sum
    val lMax = b.toDouble * (1L to k).map(j => j * j).sum
    assert(l >= lMin - 1e-6 && l <= lMax + 1e-6)
    assert(!r.getAs[Double]("z").isNaN)
  }

  test("q_stats_ancova: Scala replica of the pooled slope; F >= 0") {
    val got = run("q_stats_ancova")
    assert(got.nonEmpty)
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag"),
        (col("l_quantity").cast("decimal(12,2)") * 100).cast("long"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long"))
      .collect()
    CacheScope.releaseAll()
    var exy = BigDecimal(0); var exx = BigDecimal(0)
    li.groupBy(_.getString(0)).foreach { case (_, rows) =>
      val n = rows.length.toDouble
      val sx = rows.map(_.getLong(1)).sum.toDouble
      val sy = rows.map(_.getLong(2)).sum.toDouble
      val sxx = rows.map(r => BigInt(r.getLong(1)) * BigInt(r.getLong(1))).sum
      val sxy = rows.map(r => BigInt(r.getLong(1)) * BigInt(r.getLong(2))).sum
      exx += BigDecimal(BigDecimal(sxx).toDouble - sx * sx / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
      exy += BigDecimal(BigDecimal(sxy).toDouble - sx * sy / n)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP)
    }
    val slope = BigDecimal(exy.toDouble / exx.toDouble)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { r =>
      assert(math.abs(r.getAs[Double]("slope") - slope) < 1e-9)
      assert(r.getAs[Double]("f_stat") >= 0)
    }
  }

  test("q_stats_cochran_q / mood_median / concordance: statistic invariants") {
    val cq = run("q_stats_cochran_q")
    cq.foreach(r => assert(r.getAs[Double]("q_stat") >= 0))
    val mm = run("q_stats_mood_median")
    mm.foreach { r =>
      assert(r.getAs[Double]("chi2") >= 0)
      assert(r.getAs[Long]("k_groups") >= 2)
    }
    val cc = run("q_stats_concordance")
    cc.foreach { r =>
      val g = r.getAs[Double]("gamma")
      val dyx = r.getAs[Double]("somers_dyx")
      assert(g >= -1.0 && g <= 1.0)
      // Somers' denominator (n0 - Tx) >= gamma's (C + D), so |D| <= |gamma|
      assert(math.abs(dyx) <= math.abs(g) + 1e-9)
    }
  }

  test("q_dp_entropy_ldiv: 1 <= entropy-l <= distinct-l <= n") {
    val got = run("q_dp_entropy_ldiv")
    assert(got.nonEmpty)
    got.foreach { r =>
      val el = r.getAs[Double]("entropy_l")
      val l = r.getAs[Long]("l_distinct")
      assert(el >= 1.0 - 1e-9)
      assert(el <= l + 1e-4) // exp(H) <= support size (Jensen), 4dp pin slack
      assert(l <= r.getAs[Long]("n_rows"))
      assert(r.getAs[Int]("el_ok") == (if (el >= relational.PrivacyQueries.LDiv) 1 else 0))
    }
  }

  test("q_markov_entropy_rate: 0 <= H <= ln(k), perplexity = exp(H)") {
    val got = run("q_markov_entropy_rate")
    assert(got.length == 1)
    val r = got.head
    val h = r.getAs[Double]("entropy_rate")
    val k = r.getAs[Long]("n_states")
    assert(h >= 0 && h <= math.log(k.toDouble) + 1e-6)
    assert(math.abs(r.getAs[Double]("perplexity") - math.exp(h)) < 1e-4)
  }

  test("sim_triplet_mining: brute-force replica at sf0.001") {
    val got = run("sim_triplet_mining")
    assert(got.nonEmpty)
    val e = Tables.load(spark, sfDir, "embeddings").collect().map { r =>
      val q = r.getAs[scala.collection.Seq[Float]]("embedding")
        .map(x => math.round(x.toDouble * 1000)).toArray
      (r.getAs[Long]("vec_id"), r.getAs[Int]("label"), q)
    }
    CacheScope.releaseAll()
    def rel(a: Array[Long], b: Array[Long]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum / 1e6
      val na = math.sqrt(a.map(x => x * x).sum / 1e6)
      val nb = math.sqrt(b.map(x => x * x).sum / 1e6)
      math.round(dot / (na * nb) * 10000)
    }
    val byId = e.map(v => v._1 -> v).toMap
    got.foreach { r =>
      val (aid, lab) = (r.getAs[Long]("anchor_id"), r.getAs[Int]("label"))
      val (_, albl, aq) = byId(aid)
      assert(albl == lab)
      val pos = e.filter(v => v._1 != aid && v._2 == albl)
        .map(v => (rel(aq, v._3), v._1)).minBy(identity)
      val neg = e.filter(v => v._1 != aid && v._2 != albl)
        .map(v => (-rel(aq, v._3), v._1)).minBy(identity)
      assert(r.getAs[Long]("pos_id") == pos._2)
      assert(r.getAs[Double]("pos_cos") == pos._1 / 10000.0)
      assert(r.getAs[Long]("neg_id") == neg._2)
      assert(r.getAs[Double]("neg_cos") == -neg._1 / 10000.0)
      val viol = if (r.getAs[Double]("neg_cos") >= r.getAs[Double]("pos_cos")) 1 else 0
      assert(r.getAs[Int]("violation") == viol)
    }
  }

  test("sim_mrl_recall: recall bounded, exact set sized n_queries*k") {
    val got = run("sim_mrl_recall")
    assert(got.length == sim.RankEvalQueries.MrlPrefixes.length)
    got.foreach { r =>
      val ne = r.getAs[Long]("n_exact")
      val nh = r.getAs[Long]("n_hits")
      assert(ne == 10L * sim.RankEvalQueries.MrlK)
      assert(nh >= 0 && nh <= ne)
      assert(math.abs(r.getAs[Double]("recall") - nh.toDouble / ne) < 1e-9)
    }
  }

  test("mm_blur_detect: Scala replica of the Laplacian variance") {
    val got = run("mm_blur_detect")
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    CacheScope.releaseAll()
    assert(got.length == docs.size)
    val bs = mm.MultimodalQueries.BlurSamples
    val m = bs - 2
    got.foreach { r =>
      val text = docs(r.getAs[Long]("doc_id"))
      val n = text.length
      val codes = (0 until bs)
        .map(i => text.charAt((i.toLong * (n - 1) / (bs - 1)).toInt).toInt)
      val lap = (1 until bs - 1)
        .map(i => codes(i - 1) - 2 * codes(i) + codes(i + 1)).map(_.toLong)
      val s = lap.sum; val sq = lap.map(x => x * x).sum
      val varNum = m * sq - s * s
      assert(r.getAs[Long]("n_samples") == m)
      assert(math.abs(r.getAs[Double]("lap_var") -
        BigDecimal(varNum.toDouble / (m.toDouble * m))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
      val blurry = if (varNum < mm.MultimodalQueries.BlurVarThreshold * m * m) 1 else 0
      assert(r.getAs[Int]("is_blurry") == blurry)
    }
  }
}
