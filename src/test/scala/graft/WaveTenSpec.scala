package graft

import org.apache.spark.sql.functions._

import graft.graph.{GraphPathQueries, GraphQueries}
import graft.relational.{EventOpsQueries, StatsQueries}

/** Invariant checks for the round-10 fifth-wave operators (search,
  * keyphrases, logreg, KS, Benford, PPR, association rules). The DuckDB
  * hash compare proves cross-engine parity; these prove the SEMANTICS —
  * monotone loss, probability bounds, restart-mass floors — that a
  * twin-implementation bug could preserve.
  */
class WaveTenSpec extends SparkSpec {

  test("tfidf_search returns a descending top-20 with bounded term hits") {
    val rows = SparkEntry.queries("tfidf_search")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.length <= 20 && rows.nonEmpty)
    val scores = rows.map(_.getDouble(2))
    assert(scores.sameElements(scores.sortBy(-_)), "not score-descending")
    assert(rows.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 5))
  }

  test("tfidf_keyphrases caps at K per doc with ranks 1..K") {
    val rows = SparkEntry.queries("tfidf_keyphrases")(spark, sfDir)
      .groupBy("doc_id").agg(count(lit(1)).as("k"), max("rank").as("mr"))
      .collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(1) <= graft.tfidf.TfIdfQueries.KeyphraseK))
    assert(rows.forall(r => r.getInt(2) <= graft.tfidf.TfIdfQueries.KeyphraseK))
  }

  test("q_stats_logreg beats the zero-weight loss and stays finite") {
    val r = SparkEntry.queries("q_stats_logreg")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val loss = r(0).getAs[Double]("log_loss")
    // ln 2 is the loss of the zero init; 5 GD passes must improve on it
    // (label rate ~0.2, so the bias alone buys a big drop).
    assert(loss > 0.0 && loss < 0.6931, s"log_loss=$loss")
    Seq("w_bias", "w_hour", "w_value").foreach { c =>
      val v = r(0).getAs[Double](c)
      assert(!v.isNaN && !v.isInfinite && math.abs(v) < 10.0, s"$c=$v")
    }
    // the label rate is ~0.2 < 0.5, so the fitted bias must go negative.
    assert(r(0).getAs[Double]("w_bias") < 0.0)
  }

  test("q_stats_ks is a bounded metric over all type pairs") {
    val rows = SparkEntry.queries("q_stats_ks")(spark, sfDir).collect()
    CacheScope.releaseAll()
    val nTypes = Tables.load(spark, sfDir, "events")
      .select("event_type").distinct().count()
    assert(rows.length == nTypes * (nTypes - 1) / 2)
    assert(rows.forall { r =>
      val ks = r.getAs[Double]("ks"); ks >= 0.0 && ks <= 1.0
    })
  }

  test("q_stats_ks detects a planted location shift") {
    import spark.implicits._
    // two samples over disjoint cent ranges -> KS must be ~1; identical
    // samples -> 0. Drive the registered query shape indirectly: the
    // implementation is inline, so plant through a parquet round-trip.
    val dir = java.nio.file.Files.createTempDirectory("ks").toString
    val ev = (1 to 200).flatMap { i =>
      Seq((i.toLong, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        1L, "a", 1.00 + (i % 50) * 0.01, "{}"),
        (1000L + i, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          1L, "b", 9.00 + (i % 50) * 0.01, "{}"))
    }.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    ev.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = SparkEntry.queries("q_stats_ks")(spark, dir).collect()
    CacheScope.releaseAll()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("ks") == 1.0)
  }

  test("q_stats_ttest keeps Welch df inside its theoretical bounds") {
    val rows = SparkEntry.queries("q_stats_ttest")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val na = r.getAs[Long]("n_a"); val nb = r.getAs[Long]("n_b")
      val df = r.getAs[Double]("df_welch")
      assert(df >= math.min(na, nb) - 1 - 0.001 && df <= na + nb - 2 + 0.001,
        s"df=$df outside [${math.min(na, nb) - 1}, ${na + nb - 2}]")
      val t = r.getAs[Double]("t_stat")
      assert(!t.isNaN && !t.isInfinite)
    }
  }

  test("q_dq_benford shares sum to ~1 per type with digits in 1..9") {
    val rows = SparkEntry.queries("q_dq_benford")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.forall(r => r.getInt(1) >= 1 && r.getInt(1) <= 9))
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val s = rs.map(_.getAs[Double]("share")).sum
      assert(math.abs(s - 1.0) < 1e-4, s"share sum $s")
    }
  }

  test("q_graph_ppr floors every seed at the restart mass") {
    val rows = SparkEntry.queries("q_graph_ppr")(spark, sfDir).collect()
    CacheScope.releaseAll()
    val base = (100L - GraphQueries.DampPct) * GraphQueries.Scale / 100L
    val seeds = rows.filter(_.getLong(0) % GraphQueries.PprSeedMod == 0)
    assert(seeds.nonEmpty)
    assert(seeds.forall(_.getLong(1) >= base))
    // total PPR mass cannot exceed the seeds' injected mass (truncation
    // only loses): n_seeds * Scale is the fixpoint ceiling.
    val tot = rows.map(_.getLong(1)).sum
    assert(tot <= seeds.length.toLong * GraphQueries.Scale * 2)
  }

  test("sim_dbscan separates planted blobs and drops planted noise") {
    import spark.implicits._
    // two tight 8-point blobs (well inside eps=0.03) + 4 isolated noise
    // points; 64-dim vectors with the plane in dims 0/1.
    def vec(x: Double, y: Double): Array[Float] =
      (Array(x, y) ++ Array.fill(62)(0.0)).map(_.toFloat)
    val rows =
      (0 until 8).map(i => (100L + i, vec(0.5 + i * 0.002, 0.5), 0)) ++
        (0 until 8).map(i => (200L + i, vec(-0.5 - i * 0.002, -0.5), 1)) ++
        Seq((900L, vec(0.0, 0.0), 2), (901L, vec(0.2, -0.2), 2),
          (902L, vec(-0.2, 0.2), 2), (903L, vec(0.9, -0.9), 2))
    val dir = java.nio.file.Files.createTempDirectory("dbscan").toString
    rows.toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("sim_dbscan")(spark, dir).collect()
    CacheScope.releaseAll()
    val byId = out.map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    // noise never appears
    assert(Seq(900L, 901L, 902L, 903L).forall(!byId.contains(_)))
    // both blobs fully clustered, labels are the component minima, and
    // the two clusters are distinct
    val aLbl = (100L until 108L).map(byId(_)._2).distinct
    val bLbl = (200L until 208L).map(byId(_)._2).distinct
    assert(aLbl == Seq(100L) && bLbl == Seq(200L))
    // every blob member has 7 neighbors >= minPts-1=4 -> all core
    assert(out.forall(_.getString(1) == "core"))
  }

  test("q_ts_holt matches a scalar fold over the daily series") {
    val got = SparkEntry.queries("q_ts_holt")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r).toMap
    CacheScope.releaseAll()
    val daily = Tables.load(spark, sfDir, "events")
      .groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum((col("value").cast(
        org.apache.spark.sql.types.DecimalType(12, 2)) * 100).cast("long")).as("c"))
      .collect()
      .map(r => (r.getString(0), r.getDate(1).toString, r.getLong(2)))
    CacheScope.releaseAll()
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    daily.groupBy(_._1).foreach { case (et, rs) =>
      val ys = rs.sortBy(_._2).map(_._3.toDouble / 100.0)
      var l = ys.head; var b = 0.0; var e = 0.0
      ys.tail.foreach { y =>
        val lN = 0.3 * y + 0.7 * (l + b)
        val bN = 0.1 * (lN - l) + 0.9 * b
        e += math.abs((l + b) - y)
        l = lN; b = bN
      }
      val row = got(et)
      assert(row.getAs[Int]("n_days") == ys.length)
      assert(row.getAs[Double]("level") == r6(l), s"$et level")
      assert(row.getAs[Double]("trend") == r6(b), s"$et trend")
      assert(row.getAs[Double]("forecast_7d") == r6(l + 7.0 * b), s"$et fc")
      if (ys.length > 1)
        assert(row.getAs[Double]("mae_1step") == r6(e / (ys.length - 1)), s"$et mae")
    }
  }

  test("q_stats_anova is consistent with its moment inputs") {
    val r = SparkEntry.queries("q_stats_anova")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val n = Tables.load(spark, sfDir, "events").count()
    assert(r(0).getAs[Long]("n") == n)
    val f = r(0).getAs[Double]("f_stat")
    assert(f >= 0.0 && !f.isNaN && !f.isInfinite)
    assert(r(0).getAs[Double]("ms_within") > 0.0)
  }

  test("q_sql_not_in returns exactly the parts absent from recent orders") {
    val got = SparkEntry.queries("q_sql_not_in")(spark, sfDir)
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    CacheScope.releaseAll()
    import org.apache.spark.sql.functions.{col => c}
    val li = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "orders"),
        c("o_orderkey") === c("l_orderkey"))
      .filter(c("o_orderdate") >= "2001-01-01")
      .select("l_partkey").distinct().collect().map(_.getLong(0)).toSet
    val all = Tables.load(spark, sfDir, "part")
      .select("p_partkey").collect().map(_.getLong(0)).toSet
    CacheScope.releaseAll()
    assert(got == all.diff(li))
  }

  test("q_aqp_ci produces a positive error bar") {
    val r = SparkEntry.queries("q_aqp_ci")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(r.length == 1)
    val ci = r(0).getAs[Double]("ci_half")
    assert(ci > 0.0 && !ci.isInfinite)
    // the 95% bar should be reasonable: nonzero but far below the total.
    assert(ci < r(0).getAs[Double]("exact_sum"))
  }

  test("q_markov_stationary conserves mass and sums to one") {
    val rows = SparkEntry.queries("q_markov_stationary")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    val piSum = rows.map(_.getAs[Double]("pi")).sum
    assert(math.abs(piSum - 1.0) < 1e-6, s"pi sum $piSum")
    val mass = rows.map(_.getAs[Long]("pi_fixed")).sum
    // integer truncation only loses mass vs the injected total.
    assert(mass <= rows.length.toLong * relational.MarkovQueries.MarkovScale)
  }

  test("q_graph_mst equals a sequential Kruskal forest edge-for-edge") {
    val got = SparkEntry.queries("q_graph_mst")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    CacheScope.releaseAll()
    val und = GraphQueries.weightedEdges(spark, sfDir)
      .filter(col("src") < col("dst")).collect()
      .map(r => (r.getLong(2), r.getLong(0), r.getLong(1)))
    CacheScope.releaseAll()
    // independent sequential Kruskal under the same (w, src, dst) order
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    val mst = scala.collection.mutable.Set[(Long, Long, Long)]()
    und.sorted.foreach { case (w, s, d) =>
      val (rs, rd) = (find(s), find(d))
      if (rs != rd) { parent(rs) = rd; mst += ((s, d, w)) }
    }
    assert(got == mst.toSet)
    assert(got.map(_._3).sum == mst.toSet.map((e: (Long, Long, Long)) => e._3).sum)
  }

  test("mstOf picks the unique forest on planted graphs, ties included") {
    import spark.implicits._
    // two components bridged by one expensive edge + an all-ties triangle
    val g1 = Seq((1L, 2L, 1L), (3L, 4L, 1L), (1L, 3L, 5L), (2L, 4L, 10L))
      .toDF("src", "dst", "w")
    val m1 = GraphPathQueries.mstOf(g1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    CacheScope.releaseAll()
    assert(m1 == Set((1L, 2L, 1L), (3L, 4L, 1L), (1L, 3L, 5L)))
    val g2 = Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L)).toDF("src", "dst", "w")
    val m2 = GraphPathQueries.mstOf(g2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    CacheScope.releaseAll()
    // all-equal weights: the (w, src, dst) order picks (1,2) and (1,3)
    assert(m2 == Set((1L, 2L, 5L), (1L, 3L, 5L)))
  }

  test("q_assoc_rules yields bounded confidence and positive lift") {
    val rows = SparkEntry.queries("q_assoc_rules")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.forall(_.getLong(2) >= EventOpsQueries.AssocMinSup))
    assert(rows.forall { r =>
      val c = r.getAs[Double]("confidence"); c > 0.0 && c <= 1.0
    })
    assert(rows.forall(_.getAs[Double]("lift") > 0.0))
    // directed rules come in pairs: (a,b) present implies (b,a) present
    // with the same support.
    val sup = rows.map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(sup.forall { case ((a, b), s) => sup.get((b, a)).contains(s) })
  }
}
