package graft

import org.apache.spark.sql.functions._

import graft.relational.MiningQueries

/** Semantic invariants for the mining pack, independent of the DuckDB
  * oracles: Mann–Whitney against a direct driver-side rank computation,
  * the stump's argmin property against every other candidate split, the
  * bootstrap CI's coverage of the point estimate, item-CF symmetry, and
  * the pattern counter against a naive per-user scan.
  */
class MiningSpec extends SparkSpec {

  test("mann-whitney matches a direct driver-side rank computation") {
    val rows = MiningQueries.queries("q_stats_mannwhitney")(spark, sfDir).collect()
    assert(rows.length == 1)
    val r = rows(0)

    // independent recomputation: collect both samples, rank in memory
    val ev = Tables.load(spark, sfDir, "events")
      .filter(col("event_type").isin("purchase", "click"))
      .select((col("event_type") === "purchase").as("g1"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long").as("v"))
      .collect().map(x => (x.getBoolean(0), x.getLong(1)))
    val sorted = ev.sortBy(_._2)
    val n = sorted.length
    // average ranks with ties
    val rankOf = scala.collection.mutable.Map.empty[Long, Double]
    var i = 0
    while (i < n) {
      var j = i
      while (j < n && sorted(j)._2 == sorted(i)._2) j += 1
      val avg = (i + 1 + j).toDouble / 2.0 // mean of ranks i+1..j
      rankOf(sorted(i)._2) = avg
      i = j
    }
    val n1 = ev.count(_._1).toLong
    val n2 = n - n1
    val r1 = ev.filter(_._1).map(x => rankOf(x._2)).sum
    val u1 = r1 - n1 * (n1 + 1) / 2.0
    assert(r.getAs[Long]("n1") == n1)
    assert(r.getAs[Long]("n2") == n2)
    assert(math.abs(r.getAs[Double]("u1") - u1) < 0.6, s"u1 ${r.getAs[Double]("u1")} vs $u1")
    // z within rounding of the tie-corrected normal approximation
    val ties = ev.groupBy(_._2).map(_._2.size.toLong).filter(_ > 1)
      .map(t => t * t * t - t).sum.toDouble
    val sigma = math.sqrt(n1.toDouble * n2 / 12.0 *
      ((n + 1).toDouble - ties / (n.toDouble * (n - 1))))
    val z = (u1 - n1.toDouble * n2 / 2.0) / sigma
    assert(math.abs(r.getAs[Double]("z") - z) < 1e-4)
  }

  test("decision stump picks the minimum-gini candidate split") {
    val best = MiningQueries.queries("q_ml_stump")(spark, sfDir).collect()(0)
    // recompute every candidate's gini from the raw orders
    val ord = Tables.load(spark, sfDir, "orders")
      .select((col("o_totalprice").cast(
          org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
        .cast("long").as("v"),
        (col("o_orderpriority") === "1-URGENT").as("pos"))
      .collect().map(x => (x.getLong(0), x.getBoolean(1)))
    val vmin = ord.map(_._1).min
    val vmax = ord.map(_._1).max
    def bkt(v: Long) = (v - vmin) * MiningQueries.RankBuckets / (vmax - vmin + 1)
    val byB = ord.groupBy(x => bkt(x._1))
    val allB = byB.keys.toSeq.sorted
    val tp = ord.count(_._2).toLong
    val tq = ord.length - tp
    def gini(pl: Long, ql: Long): Double = {
      val pr = tp - pl; val qr = tq - ql
      val nl = (pl + ql).toDouble; val nr = (pr + qr).toDouble; val nn = nl + nr
      if (nl == 0 || nr == 0) Double.MaxValue
      else {
        val gl = 1.0 - (pl / nl) * (pl / nl) - (ql / nl) * (ql / nl)
        val gr = 1.0 - (pr / nr) * (pr / nr) - (qr / nr) * (qr / nr)
        math.rint((nl / nn * gl + nr / nn * gr) * 1e6) / 1e6
      }
    }
    val ginis = allB.map { b =>
      val left = allB.filter(_ <= b).flatMap(byB(_))
      (b, gini(left.count(_._2).toLong, left.count(!_._2).toLong))
    }.filter(_._2 != Double.MaxValue)
    val bestLocal = ginis.minBy(g => (g._2, g._1))
    assert(best.getAs[Long]("split_bucket") == bestLocal._1)
    assert(math.abs(best.getAs[Double]("gini") - bestLocal._2) < 1e-9)
    // splitting must beat at least the worst candidate (non-degenerate)
    assert(bestLocal._2 <= ginis.map(_._2).max)
  }

  test("poisson bootstrap CI covers the point estimate with positive width") {
    val rows = MiningQueries.queries("q_stats_bootstrap")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val est = r.getAs[Double]("est")
      val lo = r.getAs[Double]("lo95")
      val hi = r.getAs[Double]("hi95")
      val se = r.getAs[Double]("se_boot")
      assert(se > 0, s"zero bootstrap SE for ${r.getAs[String]("event_type")}")
      assert(lo < est && est < hi)
      // Poisson-bootstrap SE should approximate sd/sqrt(n) within 3x
      val n = r.getAs[Long]("n").toDouble
      assert(se < 1000 / math.sqrt(n) * 3, "SE implausibly large")
    }
  }

  test("item-CF neighbor lists are cosine-symmetric and rank-bounded") {
    val rows = MiningQueries.queries("q_itemcf_topk")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("part_a"), r.getAs[Long]("part_b"),
        r.getAs[Long]("cooc"), r.getAs[Double]("cosine"), r.getAs[Int]("rk")))
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._5 >= 1 && r._5 <= MiningQueries.ItemCfTopK))
    assert(rows.forall(r => r._4 > 0 && r._4 <= 1.0))
    // any listed pair carries the same cosine in either orientation when
    // both survive their top-k gates
    val byPair = rows.map(r => ((r._1, r._2), r._4)).toMap
    rows.foreach { r =>
      byPair.get((r._2, r._1)).foreach(c => assert(c == r._4))
    }
  }

  test("pattern counter equals a naive per-user scan") {
    val got = MiningQueries.queries("q_events_pattern")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("n_events"), r.getAs[Long]("n_matches"))).toMap
    val ev = Tables.load(spark, sfDir, "events")
      .select(col("user_id"), col("ts"), col("event_id"),
        upper(substring(col("event_type"), 1, 1)).as("ch"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2), r.getString(3)))
    val naive = ev.groupBy(_._1).map { case (u, es) =>
      val seq = es.sortBy(e => (e._2.getTime, e._3)).map(_._4).mkString
      u -> (seq.length.toLong, countOccurrences(seq, "VCP"))
    }
    assert(got == naive)
    assert(got.values.map(_._2).sum > 0, "no VCP runs found at all")
  }

  private def countOccurrences(s: String, pat: String): Long = {
    var n = 0L; var from = 0
    var i = s.indexOf(pat, from)
    while (i >= 0) { n += 1; from = i + pat.length; i = s.indexOf(pat, from) }
    n
  }
}
