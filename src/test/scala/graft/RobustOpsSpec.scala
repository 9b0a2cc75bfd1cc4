package graft

import org.apache.spark.sql.functions._

/** Semantic invariants for the round-11 operator additions — properties
  * the DuckDB hash gate cannot see because both engines could share a
  * formula bug: brute-force replicas of the closed-form statistics on the
  * collected sf0.001 relations, the Hilbert curve's defining adjacency /
  * bijectivity properties on the full grid, and the truss ⊆ core
  * containment the peeling theory guarantees.
  */
class RobustOpsSpec extends SparkSpec {

  private def q(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("kendall tau-b matches a brute-force O(n^2) computation") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_orderkey") % relational.RobustStatsQueries.PairMod === 0)
      .select(col("l_returnflag"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
        (col("l_quantity").cast("decimal(12,2)") * 100).cast("long").as("x"),
        (col("l_extendedprice").cast("decimal(12,2)") * 100).cast("long").as("y"))
      .collect()
      .groupBy(_.getString(0))
    val got = q("q_stats_kendall").collect()
      .map(r => r.getString(0) -> r.getDouble(4)).toMap
    for ((rf, rows) <- li if got.contains(rf)) {
      val xs = rows.map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
      var c = 0L; var disc = 0L
      for (i <- xs.indices; j <- (i + 1) until xs.length) {
        val sx = java.lang.Long.signum(xs(i)._2 - xs(j)._2)
        val sy = java.lang.Long.signum(xs(i)._3 - xs(j)._3)
        if (sx * sy > 0) c += 1 else if (sx * sy < 0) disc += 1
      }
      val n = xs.length.toLong
      val n0 = n * (n - 1) / 2
      def ties(f: ((Long, Long, Long)) => Long): Long =
        xs.groupBy(f).values.map(g => g.length.toLong * (g.length - 1) / 2).sum
      val tau = (c - disc).toDouble /
        math.sqrt((n0 - ties(_._2)).toDouble * (n0 - ties(_._3)).toDouble)
      assert(math.abs(got(rf) - tau) < 1e-6, s"rf=$rf got=${got(rf)} want=$tau")
    }
  }

  test("hodges-lehmann equals the brute-force Walsh-average median") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_orderkey") % relational.RobustStatsQueries.PairMod === 0)
      .select(col("l_returnflag"), (col("l_quantity").cast("decimal(12,2)") * 100).cast("long").as("x"))
      .collect().groupBy(_.getString(0))
    val got = q("q_stats_hodges_lehmann").collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    for ((rf, rows) <- li if got.contains(rf)) {
      val xs = rows.map(_.getLong(1))
      val walsh = (for (i <- xs.indices; j <- i until xs.length)
        yield xs(i) + xs(j)).sorted
      val m = walsh.length
      val med = (walsh((m + 1) / 2 - 1) + walsh((m + 2) / 2 - 1)).toDouble / 400.0
      assert(math.abs(got(rf) - med) < 1e-6, s"rf=$rf got=${got(rf)} want=$med")
    }
  }

  test("kalman gain converges to the closed-form steady state") {
    import relational.TsDiagnosticsQueries.{KalmanQ, KalmanR}
    val kInf = (math.sqrt(KalmanQ * KalmanQ + 4 * KalmanQ * KalmanR) - KalmanQ) /
      (2 * KalmanR)
    // steady-state gain k* solves k = (p+q)/(p+q+r) with p = (1-k)(p+q):
    // k* = (sqrt(q^2+4qr) - q) / (2r) ... expressed on the PREDICTED
    // variance m = p+q: k* = m/(m+r), m = (q + sqrt(q^2+4qr))/2.
    val m = (KalmanQ + math.sqrt(KalmanQ * KalmanQ + 4 * KalmanQ * KalmanR)) / 2
    val kStar = m / (m + KalmanR)
    assert(math.abs(kInf - (math.sqrt(41.0) - 1) / 20) < 1e-12)
    val rows = q("q_ts_kalman").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val gain = r.getDouble(4)
      val n = r.getInt(1)
      assert(n > 30, s"series too short for convergence: $n")
      assert(math.abs(gain - kStar) < 1e-6,
        s"type=${r.getString(0)} gain=$gain steady=$kStar")
    }
  }

  test("sample entropy matches a brute-force replica") {
    val rows = q("q_ts_sampen").collect()
    assert(rows.nonEmpty)
    // replicate through the registered query's own series definition via
    // SQL to keep the test independent of column phasing
    val series = Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hr"))
      .agg(sum((col("value").cast("decimal(12,2)") * 100).cast("long")).as("c"))
      .collect().groupBy(_.getString(0))
    rows.foreach { r =>
      val et = r.getString(0)
      val xs = series(et).sortBy(_.getTimestamp(1).getTime).map(_.getLong(2))
      val n = xs.length
      val d = n.toLong * xs.map(x => BigInt(x) * x).sum.toLong -
        { val s = xs.sum; s * s }
      val rr = math.floor(math.sqrt(d.toDouble) / (5.0 * n)).toLong
      var b = 0L; var a = 0L
      for (i <- 0 until n - 1; j <- (i + 1) until n - 1) {
        val m2 = math.max(math.abs(xs(i) - xs(j)), math.abs(xs(i + 1) - xs(j + 1))) <= rr
        if (m2) {
          b += 1
          if (i < n - 2 && j < n - 2 && math.abs(xs(i + 2) - xs(j + 2)) <= rr) a += 1
        }
      }
      assert(r.getLong(1) == b, s"$et B: got ${r.getLong(1)} want $b")
      assert(r.getLong(2) == a, s"$et A: got ${r.getLong(2)} want $a")
    }
  }

  test("hilbert layout: curve is a bijective neighbor walk and beats linear spans") {
    // the defining property on the full 256x256 grid: d is a bijection
    // onto [0, 65536) and consecutive cells are grid neighbors.
    val grid = spark.range(0, 65536).select(
      expr("CAST(id div 256 AS INT)").as("p8"), expr("CAST(id % 256 AS INT)").as("s8"))
    val fold = grid.select(col("p8"), col("s8"),
      expr(layout.LayoutQueries.hilbertFold).as("h")).collect()
    assert(fold.map(_.getLong(2)).distinct.length == 65536)
    val byD = fold.map(r => r.getLong(2) -> (r.getInt(0), r.getInt(1))).sortBy(_._1)
    assert(byD.head._1 == 0L && byD.last._1 == 65535L)
    byD.sliding(2).foreach { case Array((_, (x1, y1)), (_, (x2, y2))) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"non-adjacent step at ($x1,$y1)->($x2,$y2)")
    }
    val spans = q("q_layout_hilbert").collect()
      .map(r => r.getString(0) -> (r.getDouble(2) + r.getDouble(3))).toMap
    assert(spans("hilbert") <= spans("linear"),
      s"hilbert ${spans("hilbert")} should not exceed linear ${spans("linear")}")
  }

  test("4-truss edges all carry support >= 2 and live inside the 3-core") {
    val truss = q("q_graph_truss").collect()
    assert(truss.forall(_.getLong(2) >= graph.CommunityQueries.TrussK - 2))
    if (truss.nonEmpty) {
      val tnodes = truss.flatMap(r => Seq(r.getLong(0), r.getLong(1))).toSet
      val core = q("q_graph_kcore").collect().map(_.getLong(0)).toSet
      assert(tnodes.subsetOf(core),
        s"${tnodes.diff(core).size} truss nodes outside the 3-core")
    }
  }

  test("walks traverse only real edges and have full length") {
    val walks = q("q_graph_walks").collect()
    assert(walks.nonEmpty)
    // the edge set through the same windowed relation the query uses
    val real = graph.GraphQueries.windowedEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    walks.foreach { r =>
      val hops = r.getString(2).split("->").map(_.toLong)
      assert(hops.length == graph.CommunityQueries.WalkLen + 1)
      assert(hops.head == r.getLong(0) && hops.last == r.getLong(1))
      hops.sliding(2).foreach { case Array(a, b) =>
        assert(real.contains((a, b)), s"phantom edge $a->$b")
      }
    }
  }

  test("plsa probabilities are valid and topics are fully populated") {
    val rows = q("text_plsa").collect()
    assert(rows.length == 2 * text.TopicModelQueries.PlsaTopK)
    rows.groupBy(_.getInt(0)).foreach { case (_, g) =>
      assert(g.map(_.getInt(1)).sorted.toSeq == (1 to text.TopicModelQueries.PlsaTopK))
    }
    assert(rows.forall(r => r.getDouble(3) > 0 && r.getDouble(3) <= 1))
  }

  test("croston state is coherent: positive size, interval >= 1, forecast = z/p") {
    val rows = q("q_ts_croston").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val z = r.getDouble(3); val p = r.getDouble(4); val f = r.getDouble(5)
      assert(z > 0 && p >= 1.0)
      assert(math.abs(f - BigDecimal(z / p)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 2e-6)
    }
  }

  test("rank metrics agree: ndcg in [0,1]; mrr=1 iff p@5 has a hit at rank 1") {
    val ndcg = q("q_rank_ndcg").collect()
    assert(ndcg.nonEmpty)
    assert(ndcg.forall(r => r.getDouble(4) >= 0 && r.getDouble(4) <= 1))
    val mrr = q("q_rank_mrr").collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val ndcgByQ = ndcg.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // a query with zero relevant neighbors must score 0 on both metrics
    ndcgByQ.filter(_._2 == 0).keys.foreach(qid => assert(mrr(qid) == 0.0))
  }

  test("watermark detector stays quiet on natural text") {
    val rows = q("text_watermark_detect").collect()
    assert(rows.length > 100)
    val flagged = rows.count(_.getBoolean(4))
    assert(flagged < rows.length / 20,
      s"$flagged/${rows.length} docs flagged — detector is too hot")
  }

  test("allan variance of white-noise-like hourly data decreases with tau") {
    val rows = q("q_ts_allan").collect()
      .groupBy(_.getString(0))
    rows.foreach { case (et, g) =>
      val byTau = g.map(r => r.getInt(1) -> r.getDouble(3)).toMap
      if (byTau.contains(1) && byTau.contains(8) && byTau(1) > 0) {
        assert(byTau(8) < byTau(1),
          s"$et: avar(8)=${byTau(8)} !< avar(1)=${byTau(1)} — hourly totals should average down")
      }
    }
  }

  test("louvain move only relocates nodes with strictly positive gain") {
    val rows = q("q_graph_louvain_move").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val node = r.getLong(0); val comm = r.getLong(1); val moved = r.getBoolean(2)
      if (!moved) assert(comm == node)
      else assert(comm != node)
    }
    assert(rows.exists(_.getBoolean(2)), "expected at least one move")
  }
}
