package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.graph.GraphPathQueries
import graft.text.{DriftQueries, EvalQueries}

/** Semantics checks for the round-11 operators. The DuckDB hash compare
  * proves cross-engine parity; these prove the MEANING on planted inputs
  * a twin-implementation bug could preserve: multi-probe must dominate
  * single-bucket LSH, SQ8 must rank an obvious near neighbor first,
  * harmonic centrality must match a hand-computed star+chain, the
  * incremental SCD2 fold must equal the rebuild on boundary-shaped
  * users, novelty must zero out a verbatim re-crawl, and JSD must match
  * a driver-side replay of the exact md5 halving.
  */
class WaveElevenSpec extends SparkSpec {

  private def md5half(id: Long): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(id.toString.getBytes("UTF-8"))
    val hex = d.take(4).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex, 16) % 2
  }

  test("multi-probe LSH dominates single-bucket LSH per query") {
    val lsh = SparkEntry.queries("sim_ann_lsh")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
    CacheScope.releaseAll()
    val mp = SparkEntry.queries("sim_ann_multiprobe")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2)))
    CacheScope.releaseAll()
    assert(mp.nonEmpty && lsh.nonEmpty)
    // 9x the probes can only widen the candidate pool: per query, at
    // least as many results, and a best-cosine at least as good.
    val lshBy = lsh.groupBy(_._1); val mpBy = mp.groupBy(_._1)
    lshBy.foreach { case (q, rows) =>
      assert(mpBy.contains(q), s"query $q vanished under multi-probe")
      assert(mpBy(q).length >= rows.length)
      assert(mpBy(q).map(_._2._2).max >= rows.map(_._2._2).max - 1e-9,
        s"query $q: multi-probe best cosine regressed")
    }
  }

  test("SQ8 ranks the planted near neighbor first") {
    val dir = Files.createTempDirectory("graft-w11-sq8").toString
    import spark.implicits._
    Seq(
      (0L, Array(1.0f, 0.0f, 0.2f), 0),
      (1L, Array(0.9f, 0.1f, 0.2f), 0),
      (2L, Array(0.0f, 1.0f, -0.4f), 0),
      (3L, Array(-1.0f, 0.5f, 0.8f), 0))
      .toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("sim_ann_sq8")(spark, dir).collect()
    CacheScope.releaseAll()
    val top1 = rows.filter(r => r.getLong(0) == 0L && r.getInt(3) == 1)
    assert(top1.length == 1 && top1(0).getLong(1) == 1L,
      s"query 0 top-1 should be vec 1, got ${top1.mkString(",")}")
    // Integer code distances are symmetric.
    val d01 = rows.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L).get.getLong(2)
    val d10 = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 0L).get.getLong(2)
    assert(d01 == d10 && d01 >= 0)
  }

  test("harmonic centrality matches the hand-computed star+chain") {
    import spark.implicits._
    // Star 0-{1..5} plus chain 5-6-7; symmetric edge list. Seeds are
    // node % 41 == 0 -> only node 0.
    val und = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L),
      (5L, 6L), (6L, 7L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val out = GraphPathQueries.harmonicOf(edges).collect()
    CacheScope.releaseAll()
    assert(out.length == 1 && out(0).getLong(0) == 0L)
    assert(out(0).getLong(1) == 7L, "node 0 reaches all 7 others in <= 4 hops")
    // H(0) = 5*1 + 1/2 + 1/3, with 1/d pinned at 9dp before the fold.
    val expected = BigDecimal(5.0) + BigDecimal("0.5") + BigDecimal("0.333333333")
    assert(math.abs(out(0).getDouble(2) - expected.toDouble) < 1e-6)
  }

  test("average precision: perfect ranking gives 1.0; mixed matches a replay") {
    import spark.implicits._
    val perfect = Seq((true, 0.9), (true, 0.8), (false, 0.3), (false, 0.1))
      .toDF("y", "sc")
    val p = EvalQueries.avgPrecOf(perfect).collect()(0)
    CacheScope.releaseAll()
    assert(p.getAs[Double]("avg_prec") == 1.0)

    val mixed = Seq((true, 0.9), (false, 0.8), (true, 0.7), (false, 0.6),
      (true, 0.5), (true, 0.5), (false, 0.4)).toDF("y", "sc")
    val m = EvalQueries.avgPrecOf(mixed).collect()(0)
    CacheScope.releaseAll()
    // Driver replay of the step-interpolated formula over distinct
    // scores descending (ties collapse into one bucket).
    val buckets = Seq((0.9, 1, 0), (0.8, 0, 1), (0.7, 1, 0), (0.6, 0, 1),
      (0.5, 2, 0), (0.4, 0, 1))
    var cp = 0; var cn = 0; var ap = 0.0
    buckets.foreach { case (_, pp, nn) =>
      cp += pp; cn += nn
      ap += pp.toDouble * cp / (cp + cn)
    }
    ap /= buckets.map(_._2).sum
    assert(math.abs(m.getAs[Double]("avg_prec") - ap) < 1e-6,
      s"got ${m.getAs[Double]("avg_prec")}, replay $ap")
  }

  test("novelty zeroes a verbatim re-crawl and keeps the original at 1") {
    val dir = Files.createTempDirectory("graft-w11-nov").toString
    import spark.implicits._
    Seq((1L, "a b c d e", "en", "t", 9L),
      (2L, "a b c d e", "en", "t", 9L),
      (3L, "x y z w", "en", "t", 7L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = SparkEntry.queries("text_novelty")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    CacheScope.releaseAll()
    assert(m(1L) == ((3L, 3L, 1.0)), s"original should be all-novel: ${m(1L)}")
    assert(m(2L) == ((3L, 0L, 0.0)), s"re-crawl should be zero-novel: ${m(2L)}")
    assert(m(3L) == ((2L, 2L, 1.0)))
  }

  test("JSD drift matches a driver-side replay of the exact md5 halving") {
    val dir = Files.createTempDirectory("graft-w11-jsd").toString
    import spark.implicits._
    val docs = (1L to 20L).map(i =>
      (i, if (i % 3 == 0) "apple banana apple" else "cat dog cat dog", "en", "t", 10L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val row = SparkEntry.queries("text_jsd_drift")(spark, dir).collect()(0)
    CacheScope.releaseAll()
    // Replay: same halving, same smoothing, same pinning.
    val counts = scala.collection.mutable.Map.empty[(Long, String), Long]
    docs.foreach { case (id, text, _, _, _) =>
      val h = md5half(id)
      text.split("\\s+").filter(_.nonEmpty)
        .foreach(t => counts((h, t)) = counts.getOrElse((h, t), 0L) + 1)
    }
    val vocab = counts.keys.map(_._2).toSet
    val n0 = counts.collect { case ((0L, _), c) => c }.sum
    val n1 = counts.collect { case ((1L, _), c) => c }.sum
    val jsd = vocab.toSeq.map { t =>
      val p = (counts.getOrElse((0L, t), 0L) + 1).toDouble / (n0 + vocab.size)
      val q = (counts.getOrElse((1L, t), 0L) + 1).toDouble / (n1 + vocab.size)
      val mm = (p + q) / 2.0
      BigDecimal(0.5 * p * math.log(p / mm) + 0.5 * q * math.log(q / mm))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP)
    }.sum
    assert(row.getLong(0) == n0 && row.getLong(1) == n1)
    assert(row.getLong(2) == vocab.size.toLong)
    assert(math.abs(row.getDouble(3) - jsd.toDouble) < 1e-6,
      s"got ${row.getDouble(3)}, replay $jsd")
    assert(row.getDouble(3) > 0.0 && row.getDouble(3) <= math.log(2) + 1e-9)
  }

  test("incremental SCD2 equals the rebuild on cutoff-boundary users") {
    val dir = Files.createTempDirectory("graft-w11-scd2").toString
    import spark.implicits._
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // User 10: history only (stays open). User 20: batch only (all new).
    // User 30: same type across the cutoff (NOT a change). User 40: type
    // change across the cutoff (close + insert).
    Seq(
      (1L, ts("2024-01-05 00:00:00"), 10L, "view", 1.0, "{}"),
      (2L, ts("2024-01-22 00:00:00"), 20L, "view", 1.0, "{}"),
      (3L, ts("2024-01-23 00:00:00"), 20L, "purchase", 1.0, "{}"),
      (4L, ts("2024-01-06 00:00:00"), 30L, "view", 1.0, "{}"),
      (5L, ts("2024-01-25 00:00:00"), 30L, "view", 1.0, "{}"),
      (6L, ts("2024-01-07 00:00:00"), 40L, "view", 1.0, "{}"),
      (7L, ts("2024-01-26 00:00:00"), 40L, "click", 1.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    def rows(k: String) = SparkEntry.queries(k)(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
        Option(r.getTimestamp(3)), r.getLong(4))).toSet
    val inc = rows("q_scd2_incremental")
    CacheScope.releaseAll()
    val full = rows("q_scd2_intervals")
    CacheScope.releaseAll()
    assert(inc == full,
      s"fold != rebuild: onlyInc=${(inc -- full).take(3)}, onlyFull=${(full -- inc).take(3)}")
    // And the boundary semantics themselves:
    assert(inc.count(_._1 == 30L) == 1, "same-type continuation must not split")
    assert(inc.count(_._1 == 40L) == 2, "cross-cutoff type change must close + insert")
    assert(inc.exists(r => r._1 == 10L && r._5 == 1L), "history-only user stays open")
  }

  test("DTW: identical series warp at zero cost; a shifted impulse warps cheap") {
    val dir = Files.createTempDirectory("graft-w11-dtw").toString
    import spark.implicits._
    val base = java.time.LocalDate.of(2024, 1, 1)
    def ts(d: Int) = java.sql.Timestamp.valueOf(base.plusDays(d).atStartOfDay())
    // Types a/b: identical impulse at day 10. Type c: the SAME impulse
    // shifted to day 11 — the warp absorbs a pure shift at ZERO cost
    // (exactly what fixed-lag cross-correlation cannot do). Type e: a
    // genuinely different shape (two impulses) that no warp can flatten.
    val ev = (0 until 30).flatMap { d =>
      def v(imps: Int*) = if (imps.contains(d)) 200.0 else 100.0
      Seq((d * 4L, ts(d), 1L, "a", v(10), "{}"),
        (d * 4L + 1, ts(d), 1L, "b", v(10), "{}"),
        (d * 4L + 2, ts(d), 1L, "c", v(11), "{}"),
        (d * 4L + 3, ts(d), 1L, "e", v(5, 20), "{}"))
    }
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = SparkEntry.queries("q_ts_dtw")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getDouble(4)).toMap
    CacheScope.releaseAll()
    assert(m.size == 6)
    assert(m(("a", "b")) == 0.0, s"identical series must cost 0: ${m(("a", "b"))}")
    assert(m(("a", "c")) == 0.0,
      s"a pure shift must warp at zero cost: ${m(("a", "c"))}")
    assert(m(("a", "e")) > 0.0, "a different shape must cost > 0")
  }

  test("ROUGE pairs: a verbatim near-copy scores F1 = 1 and bounds hold") {
    val dir = Files.createTempDirectory("graft-w11-rouge").toString
    import spark.implicits._
    // Two identical docs (same minhash signature -> all bands collide)
    // plus an unrelated doc that must not pair with them.
    val txt = "the quick brown fox jumps over the lazy dog again and again"
    Seq((1L, txt, "en", "t", 60L), (2L, txt, "en", "t", 60L),
      (3L, "completely different words entirely disjoint vocabulary here now", "en", "t", 60L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = SparkEntry.queries("text_rouge_pairs")(spark, dir).collect()
    CacheScope.releaseAll()
    val pair = rows.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(pair.isDefined, s"identical docs must band-collide: ${rows.mkString(";")}")
    assert(pair.get.getDouble(3) == 1.0 && pair.get.getDouble(4) == 1.0 &&
      pair.get.getDouble(5) == 1.0 && pair.get.getDouble(6) == 1.0,
      s"verbatim copy must score 1.0 everywhere: ${pair.get}")
    rows.foreach { r =>
      Seq(3, 4, 5, 6).foreach { i =>
        val v = r.getDouble(i)
        assert(v >= 0.0 && v <= 1.0, s"metric out of [0,1]: $r")
      }
    }
  }

  test("GBDT round: stage 2 fits residual structure stage 1 cannot see") {
    val dir = Files.createTempDirectory("graft-w11-gbdt").toString
    import spark.implicits._
    // Dominant signal: urgent iff price >= 800 (stage 1's split). A
    // secondary urgent block at [400, 500) survives as residual
    // structure only a second stump can capture.
    val rows = (0 until 1000).map { i =>
      val price = i.toDouble
      val urgent = price >= 800 || (price >= 400 && price < 500)
      (i.toLong, java.math.BigDecimal.valueOf(price).setScale(2),
        if (urgent) "1-URGENT" else "3-MEDIUM")
    }
    rows.toDF("o_orderkey", "o_totalprice", "o_orderpriority")
      .write.mode("overwrite").parquet(s"$dir/orders.parquet")
    val out = SparkEntry.queries("q_ml_gbdt_round")(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toMap
    CacheScope.releaseAll()
    assert(out.size == 2)
    val (b1, _, _, mse1) = out(1L)
    val (_, _, _, mse2) = out(2L)
    // Stage 1 must find the dominant >= 800 threshold (bucket ~51 of 64).
    assert(b1 >= 48 && b1 <= 53, s"stage-1 split bucket $b1")
    // The second stump must strictly reduce training MSE — the planted
    // secondary block guarantees exploitable residual structure.
    assert(mse2 < mse1, s"boosting must improve: $mse1 -> $mse2")
  }

  test("betweenness: a path graph's dependencies match Brandes by hand") {
    import spark.implicits._
    // Path 41-42-43-44-45; the only seed (id % 41 == 0) is 41, so from
    // that single source Brandes gives δ(42)=3, δ(43)=2, δ(44)=1,
    // δ(45)=0 — each interior node carries everything beyond it.
    val und = Seq((41L, 42L), (42L, 43L), (43L, 44L), (44L, 45L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val m = GraphPathQueries.betweennessOf(edges).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    CacheScope.releaseAll()
    assert(m == Map(42L -> 3.0, 43L -> 2.0, 44L -> 1.0, 45L -> 0.0),
      s"got $m")
  }

  test("Kneser-Ney: continuation probability demotes a one-context word") {
    val dir = Files.createTempDirectory("graft-w11-kn").toString
    import spark.implicits._
    // "san francisco" repeated makes 'francisco' frequent but it follows
    // ONLY 'san' (1 continuation context); 'trip' follows many distinct
    // words. A doc of "nice francisco" bigrams must score WORSE than
    // "nice trip" under KN even though raw counts tie.
    val docs = Seq(
      (1L, "san francisco san francisco san francisco san francisco", "en", "t", 1L),
      (2L, "good trip great trip short trip long trip", "en", "t", 1L),
      (3L, "nice francisco", "en", "t", 1L),
      (4L, "nice trip", "en", "t", 1L))
    docs.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = SparkEntry.queries("text_bigram_kn")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    CacheScope.releaseAll()
    assert(m(3L) < m(4L),
      s"'nice francisco' (${m(3L)}) must score below 'nice trip' (${m(4L)})")
  }

  test("weighted jaccard collapses a boilerplate-only overlap") {
    val dir = Files.createTempDirectory("graft-w11-wjac").toString
    import spark.implicits._
    // Commons appear in EVERY doc (idf 0). Docs 1/2 share only commons
    // plus one distinct rare token each; docs 3/4 are identical with a
    // genuinely rare payload.
    val commons = "alpha beta gamma delta epsilon zeta eta theta"
    Seq(
      (1L, s"$commons rareone", "en", "t", 1L),
      (2L, s"$commons raretwo", "en", "t", 1L),
      (3L, s"$commons payload secret unique", "en", "t", 1L),
      (4L, s"$commons payload secret unique", "en", "t", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = SparkEntry.queries("dedup_weighted_jaccard")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getDouble(3), r.getDouble(4))).toMap
    CacheScope.releaseAll()
    val id = m.get((3L, 4L))
    assert(id.isDefined, s"identical docs must band-collide: $m")
    assert(id.get == ((1.0, 1.0)), s"identical docs score 1/1: ${id.get}")
    m.get((1L, 2L)).foreach { case (plain, weighted) =>
      assert(plain > 0.7, s"boilerplate pair plain jaccard $plain")
      assert(weighted < 0.1,
        s"idf weighting must collapse the boilerplate pair: $weighted")
    }
  }

  test("kNN classification is perfect on bucket-separated label clusters") {
    val dir = Files.createTempDirectory("graft-w11-knnc").toString
    import spark.implicits._
    // Label 0 lives in the all-positive sign bucket, label 1 flips dim 0:
    // different LSH buckets, so every vector's bucket-mates share its
    // label and the confusion matrix must be purely diagonal.
    val vecs = (0 until 8).map { i =>
      val lbl = i % 2
      val base = Array.fill(8)(1.0f + (i / 2) * 0.01f)
      if (lbl == 1) base(0) = -1.0f
      (100L + i, base, lbl)
    }
    vecs.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val rows = SparkEntry.queries("sim_knn_classify")(spark, dir).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { case (gold, pred, n) =>
      assert(gold == pred, s"off-diagonal cell ($gold, $pred, $n) in $rows")
    }
    assert(rows.map(_._3).sum == 8L)
  }

  test("binary segmentation recovers both edges of a planted bump") {
    val dir = Files.createTempDirectory("graft-w11-binseg").toString
    import spark.implicits._
    val base = java.time.LocalDate.of(2024, 1, 1)
    // 100 for 20 days, 200 for 20 days, back to 100 — a deploy+rollback
    // bump whose two edges a single CUSUM reading cannot both report.
    val ev = (0 until 60).map { d =>
      val v = if (d >= 20 && d < 40) 200.0 else 100.0
      (d.toLong, java.sql.Timestamp.valueOf(base.plusDays(d).atStartOfDay()),
        1L, "purchase", v, "{}")
    }
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val rows = SparkEntry.queries("q_ts_cusum_binseg")(spark, dir).collect()
      .map(r => (r.getLong(1), r.getString(2),
        r.getDate(3).toLocalDate.toEpochDay - base.toEpochDay))
    CacheScope.releaseAll()
    val days = rows.map(_._3)
    assert(rows.exists(r => r._1 == 1L), "level-1 row missing")
    assert(days.exists(d => math.abs(d - 19) <= 2),
      s"step-up edge (~day 19) not found in $rows")
    assert(days.exists(d => math.abs(d - 39) <= 2),
      s"step-down edge (~day 39) not found in $rows")
  }

  test("DCT phash: verbatim copies collide; corruption stays near") {
    val dir = Files.createTempDirectory("graft-w11-dct").toString
    import spark.implicits._
    val t1 = "the quick brown fox jumps over the lazy dog " * 6
    Seq((1L, t1, "en", "t", 1L), (2L, t1, "en", "t", 1L),
      (3L, t1.updated(10, 'Z'), "en", "t", 1L),
      (4L, "completely different payload with other words entirely " * 5, "en", "t", 1L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val m = SparkEntry.queries("mm_phash_dct")(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    CacheScope.releaseAll()
    assert(m(1L) == m(2L), "identical payloads must hash equal")
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    // One corrupted byte perturbs at most a few low-frequency bits;
    // an unrelated payload should sit farther in hamming space.
    assert(ham(m(1L), m(3L)) <= ham(m(1L), m(4L)),
      s"corruption ${ham(m(1L), m(3L))} vs unrelated ${ham(m(1L), m(4L))}")
    m.values.foreach(h => assert(h >= 0 && h < (1L << 15)))
  }

  test("Holt-Winters beats plain Holt on a planted weekly cycle") {
    val dir = Files.createTempDirectory("graft-w11-hw").toString
    import spark.implicits._
    val base = java.time.LocalDate.of(2024, 1, 1)
    val ev = (0 until 84).map { d =>
      val v = if (d % 7 == 0) 150.0 else 100.0
      (d.toLong, java.sql.Timestamp.valueOf(base.plusDays(d).atStartOfDay()),
        1L, "purchase", v, "{}")
    }
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val hw = SparkEntry.queries("q_ts_holtwinters")(spark, dir).collect()(0)
      .getAs[Double]("mae_1step")
    CacheScope.releaseAll()
    val holt = SparkEntry.queries("q_ts_holt")(spark, dir).collect()(0)
      .getAs[Double]("mae_1step")
    CacheScope.releaseAll()
    assert(hw < holt,
      s"the seasonal state must pay on a weekly cycle: hw=$hw holt=$holt")
  }

  test("degenerate docs (empty / 1-char) survive both perceptual hashes") {
    val dir = Files.createTempDirectory("graft-w11-degen").toString
    import spark.implicits._
    Seq((1L, "", "en", "t", 0L), (2L, "x", "en", "t", 1L),
      (3L, "hello world text here", "en", "t", 20L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    // Both hashers sample positions scaled by (n - 1): empty and 1-char
    // docs must degrade to an all-equal sample vector (ascii('') = 0 in
    // both engines), not crash.
    val dct = SparkEntry.queries("mm_phash_dct")(spark, dir).collect()
    CacheScope.releaseAll()
    assert(dct.length == 3)
    val avg = SparkEntry.queries("mm_phash")(spark, dir).collect()
    CacheScope.releaseAll()
    assert(avg.length == 3)
  }

  test("periodogram: a planted weekly cycle peaks at period 7") {
    val dir = Files.createTempDirectory("graft-w11-per").toString
    import spark.implicits._
    val base = java.time.LocalDate.of(2024, 1, 1)
    val ev = (0 until 84).map { d =>
      val v = if (d % 7 == 0) 150.0 else 100.0
      (d.toLong, java.sql.Timestamp.valueOf(base.plusDays(d).atStartOfDay()),
        1L, "purchase", v, "{}")
    }
    ev.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val m = SparkEntry.queries("q_ts_periodogram")(spark, dir).collect()
      .map(r => r.getLong(1) -> r.getDouble(3)).toMap
    CacheScope.releaseAll()
    assert(m(7L) > 5 * m(30L),
      s"period-7 amplitude ${m(7L)} should dominate period-30 ${m(30L)}")
    assert(m(7L) > 5 * m(14L),
      s"period-7 amplitude ${m(7L)} should dominate period-14 ${m(14L)}")
  }
}
