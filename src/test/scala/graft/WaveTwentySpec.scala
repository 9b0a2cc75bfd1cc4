package graft

/** Invariant checks for the round-11 feature-engineering wave: target
  * encoding, WoE/IV, BH-FDR, and the Brown–Forsythe variance test.
  */
class WaveTwentySpec extends SparkSpec {

  test("q_ml_target_encode: LOO gap is exactly 1/(n-1+m), rates bounded") {
    val rows = SparkEntry.queries("q_ml_target_encode")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n")
      val (pos, neg) = (r.getAs[Double]("enc_pos"), r.getAs[Double]("enc_neg"))
      assert(pos >= 0.0 && neg <= 1.0 && pos < neg)
      // removing one positive vs one negative differs by exactly 1/(n-1+m)
      val gap = 1.0 / (n - 1 + relational.FeatureQueries.EncodeM)
      assert(math.abs((neg - pos) - gap) < 2e-6, s"gap ${neg - pos} vs $gap")
    }
  }

  test("q_ml_woe_iv: iv_total is the exact fold of the per-bin terms") {
    val rows = SparkEntry.queries("q_ml_woe_iv")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    val total = rows.head.getAs[Double]("iv_total")
    rows.foreach(r => assert(r.getAs[Double]("iv_total") == total))
    // per-bin terms were round(,9)-pinned before the fold; the output
    // re-rounds to 6, so the recomputed sum can sit half a ulp off
    val sum = rows.map(_.getAs[Double]("iv_bin")).sum
    assert(math.abs(sum - total) < 1e-5, s"$sum vs $total")
    rows.foreach(r => assert(r.getAs[Double]("iv_bin") >= -1e-12))
  }

  test("q_stats_fdr_bh: rejections form a prefix of the p-value ranking") {
    val rows = SparkEntry.queries("q_stats_fdr_bh")(spark, sfDir).collect()
      .sortBy(_.getAs[Long]("rank"))
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    assert(rows.map(_.getAs[Long]("rank")).toSeq == (1L to rows.length).toSeq)
    rows.foreach(r => {
      val p = r.getAs[Double]("pval")
      assert(p >= 0.0 && p <= 1.0 + 1e-9, s"p=$p")
    })
    // BH rejects exactly ranks 1..k*: once a row is kept, no later row
    // may be rejected
    val flags = rows.map(_.getAs[Boolean]("rejected"))
    assert(!flags.dropWhile(identity).contains(true), flags.mkString(","))
  }

  test("q_ml_adaboost_round: stumps beat chance, alpha matches err") {
    val rows = SparkEntry.queries("q_ml_adaboost_round")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.length == 2)
    rows.foreach { r =>
      val e = r.getAs[Double]("err_rate")
      val a = r.getAs[Double]("alpha")
      // the stump search takes the min over both polarities, so err <= 0.5
      assert(e > 0.0 && e <= 0.5 + 1e-9, s"err=$e")
      assert(math.abs(a - 0.5 * math.log((1 - e) / e)) < 1e-4, s"alpha=$a err=$e")
    }
  }

  test("q_er_phonetic: 4-char keys, pair counts, noun->key is a function") {
    val rows = SparkEntry.queries("q_er_phonetic")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    var parts = 0L
    rows.foreach { r =>
      assert(r.getAs[String]("key").length == 4)
      val n = r.getAs[Long]("n_parts")
      assert(r.getAs[Long]("n_pairs") == n * (n - 1) / 2)
      assert(r.getAs[Long]("n_nouns") >= 1)
      parts += n
    }
    // blocking is a partition: every part lands in exactly one block
    val total = Tables.load(spark, sfDir, "part").count()
    assert(parts == total, s"$parts vs $total")
  }

  test("q_ts_hampel: outlier flag matches the integer decision rule") {
    val rows = SparkEntry.queries("q_ts_hampel")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (c, med, mad) = (r.getAs[Long]("c"), r.getAs[Long]("med"),
        r.getAs[Long]("mad"))
      assert(r.getAs[Boolean]("is_outlier") ==
        (math.abs(c - med) * 10000 > relational.RollingQueries.HampelK4 * mad))
      assert(mad >= 0)
    }
  }

  test("q_ts_rolling_beta: full windows only, all-types beta is bounded") {
    val rows = SparkEntry.queries("q_ts_rolling_beta")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    // y <= x by construction (a type's count is part of the total), so a
    // regression of y on x over any window keeps |beta| modest; the real
    // invariant is finiteness and the n=14 gate (warmup rows dropped)
    rows.foreach(r => assert(!r.getAs[Double]("beta").isNaN))
    val types = rows.map(_.getAs[String]("event_type")).distinct
    assert(types.length >= 2)
  }

  test("q_events_regularity: cv2 >= 0 (Cauchy-Schwarz) and flags match") {
    val rows = SparkEntry.queries("q_events_regularity")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cv2 = r.getAs[Double]("cv2")
      assert(cv2 >= -1e-9, s"cv2=$cv2")
      assert(r.getAs[Boolean]("is_regular") == (cv2 < 0.1))
      assert(r.getAs[Boolean]("is_bursty") == (cv2 > 5.0))
      assert(r.getAs[Long]("span_s") >= 0)
      val ts = r.getAs[Double]("top_share")
      assert(ts > 0.0 && ts <= 1.0)
    }
  }

  test("q_graph_katz: floor at Scale, hubs strictly above isolated floor") {
    val rows = SparkEntry.queries("q_graph_katz")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    val scores = rows.map(_.getAs[Long]("katz_fixed"))
    // every node has the +1 restart mass; any node with an in-edge from a
    // live node exceeds it (symmetric graph: every node has an in-edge)
    assert(scores.forall(_ > graph.GraphPathQueries.KatzScale))
  }

  test("mm_shot_detect: every clip opens with a boundary, jumps flagged") {
    val rows = SparkEntry.queries("mm_shot_detect")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    val byDoc = rows.groupBy(_.getAs[Long]("doc_id"))
    byDoc.foreach { case (_, frames) =>
      val sorted = frames.sortBy(_.getAs[Int]("frame_idx"))
      assert(sorted.head.getAs[Boolean]("is_boundary"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          val jump = math.abs(b.getAs[Int]("feat") - a.getAs[Int]("feat"))
          assert(b.getAs[Boolean]("is_boundary") ==
            (jump > mm.MultimodalQueries.ShotThreshold))
        case _ =>
      }
    }
  }

  test("mm_silence_runs: segments are well-formed, disjoint per doc") {
    val rows = SparkEntry.queries("mm_silence_runs")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, runs) =>
      val sorted = runs.sortBy(_.getAs[Long]("start_frame"))
      sorted.foreach { r =>
        assert(r.getAs[Long]("n_frames") ==
          r.getAs[Long]("end_frame") - r.getAs[Long]("start_frame") + 1)
      }
      // maximal islands: consecutive runs are separated by a loud frame
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getAs[Long]("start_frame") > a.getAs[Long]("end_frame") + 1)
        case _ =>
      }
    }
  }

  test("q_ts_alphabeta: driver-side replay reproduces the fold exactly") {
    val rows = SparkEntry.queries("q_ts_alphabeta")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[java.sql.Date]("day").getTime)
      var x = 0L; var v = 0L; var first = true
      sorted.foreach { r =>
        val z = r.getAs[Long]("z")
        if (first) { x = z; v = 0L; first = false }
        else {
          val res = z - (x + v)
          x = (x + v) + res / 2 // Scala / on Long truncates, same as div
          v = v + res / 4
        }
        assert(r.getAs[Long]("level") == x && r.getAs[Long]("trend") == v,
          s"at ${r.getAs[java.sql.Date]("day")}")
      }
    }
  }

  test("q_stats_quartile_bands: bands are monotone, p50 is the lower median") {
    val rows = SparkEntry.queries("q_stats_quartile_bands")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.length == 3)
    rows.foreach { r =>
      val bands = Seq("p10_usd", "p25_usd", "p50_usd", "p75_usd", "p90_usd")
        .map(r.getAs[Double])
      bands.zip(bands.tail).foreach { case (a, b) => assert(a <= b) }
    }
    // cross-check p50 against the independent single-rank path
    import org.apache.spark.sql.functions._
    val v = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)").as("v"))
      .transform(CacheScope.persisted(_))
    rows.foreach { r =>
      val g = r.getAs[String]("flag")
      val n = r.getAs[Long]("n")
      val med = graft.operators.RadixSelect.kth(
        v.filter(col("flag") === g), "v", (n * 50 + 99) / 100)
      assert(r.getAs[Double]("p50_usd") == med / 100.0, s"group $g")
    }
    CacheScope.releaseAll()
  }

  test("q_ml_chi2_rank: ranks are a permutation, chi2 nonnegative") {
    val rows = SparkEntry.queries("q_ml_chi2_rank")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.length == 5)
    assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ==
      (1L to rows.length).toSeq)
    rows.foreach { r =>
      assert(r.getAs[Double]("chi2") >= 0.0)
      assert(r.getAs[Long]("dof") == r.getAs[Long]("n_cells") - 1)
    }
    // higher rank number == lower chi2 (descending ranking)
    val byRank = rows.sortBy(_.getAs[Long]("rank")).map(_.getAs[Double]("chi2"))
    assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
  }

  test("q_stats_permutation: p-value is a valid exceedance ratio") {
    val rows = SparkEntry.queries("q_stats_permutation")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.length == 1)
    val r = rows.head
    val b = r.getAs[Long]("n_perms")
    val ex = r.getAs[Long]("n_exceed")
    assert(ex >= 0 && ex <= b)
    val p = r.getAs[Double]("p_value")
    assert(math.abs(p - (1.0 + ex) / (b + 1.0)) < 1e-6)
    assert(p > 0.0 && p <= 1.0)
  }

  test("stream_latest_state: snapshot keys are unique, counts sum to corpus") {
    val rows = SparkEntry.queries("stream_latest_state")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    val users = rows.map(_.getAs[Long]("user_id"))
    assert(users.distinct.length == users.length)
    val total = Tables.load(spark, sfDir, "events").count()
    assert(rows.map(_.getAs[Long]("n_events")).sum == total)
  }

  test("mm_audio_cepstrum: c0 dominates (all-positive DC row), 4 coefs") {
    val rows = SparkEntry.queries("mm_audio_cepstrum")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cs = Seq("c0", "c1", "c2", "c3").map(r.getAs[Double])
      // DC row of the cos table is the all-1e9 row: c0 = sum of log
      // energies, strictly positive and larger than any AC coefficient
      assert(cs.head > 0.0)
      cs.tail.foreach(c => assert(math.abs(c) < cs.head))
    }
  }

  test("q_events_high_watermark: per user, watermark values strictly rise") {
    val rows = SparkEntry.queries("q_events_high_watermark")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("user_id")).foreach { case (_, rs) =>
      val byTime = rs.sortBy(_.getAs[java.sql.Timestamp]("ts").getTime)
      val vals = byTime.map(_.getAs[Long]("value_cents"))
      vals.zip(vals.tail).foreach { case (a, b) => assert(b > a) }
      // the first watermark has no prior maximum
      assert(byTime.head.isNullAt(byTime.head.fieldIndex("prev_max_cents")))
    }
  }

  test("q_stats_levene: F >= 0 and group medians match RadixSelect rank") {
    val rows = SparkEntry.queries("q_stats_levene")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.length == 3)
    val f = rows.head.getAs[Double]("f_stat")
    assert(f >= 0.0)
    assert(rows.head.getAs[Long]("df2") ==
      rows.map(_.getAs[Long]("n")).sum - 3)
    // lower-median invariant: at least half the group's mass is >= med
    // and at least (n+1)/2 is <= med — spot-check via a direct recount
    import org.apache.spark.sql.functions._
    val v = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)").as("v"))
    rows.foreach { r =>
      val medCents = math.round(r.getAs[Double]("med_usd") * 100)
      val below = v.filter(col("flag") === r.getAs[String]("flag") &&
        col("v") <= medCents).count()
      val n = r.getAs[Long]("n")
      assert(below >= (n + 1) / 2 && below <= n, s"${r.getAs[String]("flag")}")
    }
  }
}
