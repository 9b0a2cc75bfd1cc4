package graft

import graft.graph.GraphQueries
import graft.relational.{MiningQueries, TimeSeriesQueries}
import graft.text.TextAnalysisQueries

/** Wave-7 semantic invariants: the additive decomposition reconstructs
  * the series, modularity respects its analytic bounds and per-community
  * additivity, and ridge shrinks toward (but stays near) the exact OLS
  * solve at the configured penalty.
  */
class DecomposeSpec extends SparkSpec {

  test("decomposition reconstructs value = trend + seasonal + remainder") {
    val rows = TimeSeriesQueries.queries("q_ts_decompose")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val v = r.getAs[Double]("value")
      val sum = r.getAs[Double]("trend") + r.getAs[Double]("seasonal") +
        r.getAs[Double]("remainder")
      assert(math.abs(v - sum) < 1e-4, s"$v != $sum")
    }
    // seasonal means sum to ~0 across the week per type (mean-centering)
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    byType.foreach { case (_, rs) =>
      val seas = rs.map(r => (r.getAs[Double]("seasonal"),
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay % 7)).distinct
      assert(seas.nonEmpty)
    }
  }

  test("modularity is bounded and contributions sum to q") {
    val rows = GraphQueries.queries("q_graph_modularity")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val q = rows.head.getAs[Double]("q")
    assert(rows.forall(_.getAs[Double]("q") == q))
    assert(q >= -0.5 && q <= 1.0, s"modularity $q out of range")
    val sum = rows.map(_.getAs[Double]("contrib")).sum
    assert(math.abs(sum - q) < 1e-6, s"contrib sum $sum != q $q")
    // LPA on a co-purchase month should find real structure
    assert(rows.length > 1, "degenerate single community")
  }

  test("LTTB selection replays an independent sequential implementation") {
    val W = TimeSeriesQueries.LttbBuckets
    val got = TimeSeriesQueries.queries("q_ts_lttb")(spark, sfDir).collect()
      .map(r => (r.getAs[String]("event_type"), r.getAs[Int]("bucket"),
        r.getAs[Long]("k")))
    assert(got.nonEmpty)
    // independent greedy replay over the collected daily series
    val daily = Tables.load(spark, sfDir, "events")
      .groupBy(org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.date_trunc("day",
          org.apache.spark.sql.functions.col("ts")).cast("date").as("day"))
      .agg(org.apache.spark.sql.functions.sum(
        (org.apache.spark.sql.functions.col("value")
          .cast(org.apache.spark.sql.types.DecimalType(12, 2)) * 100)
          .cast("long")).as("c"))
      .collect()
      .map(r => (r.getAs[String]("event_type"),
        r.getAs[java.sql.Date]("day").toLocalDate.toEpochDay,
        r.getAs[Long]("c")))
    daily.groupBy(_._1).foreach { case (et, pts0) =>
      val pts = pts0.sortBy(_._2).zipWithIndex
        .map { case ((_, x, y), i) => (i + 1, x, y) } // (k, x, y)
      val n = pts.length
      if (n >= W + 2) {
        val expectKs = scala.collection.mutable.ArrayBuffer(1L)
        var (ax, ay) = (pts.head._2, pts.head._3)
        for (b <- 0 until W) {
          val bucket = pts.filter { case (k, _, _) =>
            k > 1 && k < n && ((k - 2) * W) / (n - 2) == b }
          val (sx, sy, m) =
            if (b < W - 1) {
              val nb = pts.filter { case (k, _, _) =>
                k > 1 && k < n && ((k - 2) * W) / (n - 2) == b + 1 }
              (nb.map(_._2).sum, nb.map(_._3).sum, nb.length.toLong)
            } else (pts.last._2, pts.last._3, 1L)
          val best = bucket.maxBy { case (k, x, y) =>
            (BigInt(ax * m - sx) * BigInt(y - ay) -
              BigInt(ax - x) * BigInt(sy - ay * m)).abs -> -k
          }(Ordering.Tuple2(Ordering.BigInt, Ordering.Int))
          expectKs += best._1.toLong
          ax = best._2; ay = best._3
        }
        expectKs += n.toLong
        val gotKs = got.filter(_._1 == et).sortBy(_._2).map(_._3).toSeq
        assert(gotKs == expectKs.toSeq, s"$et: $gotKs vs $expectKs")
      }
    }
  }

  test("MMR selection replays an independent greedy implementation") {
    val got = graft.sim.SimilarityQueries.queries("sim_mmr")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Int]("mmr_rank"),
        r.getAs[Long]("n_id")))
    assert(got.nonEmpty)
    val vecs = Tables.load(spark, sfDir, "embeddings")
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(x => math.rint(x.toDouble * 1000).toLong).toArray)
      .toMap
    def cosI(a: Array[Long], b: Array[Long]): Long = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum / 1e6
      val na = math.sqrt(a.map(x => x * x).sum / 1e6)
      val nb = math.sqrt(b.map(x => x * x).sum / 1e6)
      math.rint(dot / (na * nb) * 10000).toLong
    }
    (0L until 10L).foreach { qid =>
      val qv = vecs(qid)
      val pool = vecs.toSeq.filter(_._1 != qid)
        .map { case (id, v) => (id, cosI(qv, v)) }
        .sortBy { case (id, rel) => (-rel, id) }.take(10)
      val sims = (for ((a, _) <- pool; (b, _) <- pool if a != b)
        yield (a, b) -> cosI(vecs(a), vecs(b))).toMap
      var sel = Vector.empty[Long]
      val relOf = pool.toMap
      for (_ <- 1 to 5) {
        val best = pool.filter(p => !sel.contains(p._1)).map { case (id, rel) =>
          val sc = if (sel.isEmpty) 7 * rel
            else 7 * rel - 3 * sel.map(s => sims((id, s))).max
          (id, sc)
        }.minBy { case (id, sc) => (-sc, id) }
        sel :+= best._1
      }
      val gotIds = got.filter(_._1 == qid).sortBy(_._2).map(_._3).toSeq
      assert(gotIds == sel, s"q$qid: $gotIds vs $sel")
    }
    // the diversity term must actually matter somewhere: at least one
    // query's MMR order differs from its pure-relevance pool order
    val pureTop = (0L until 10L).map { qid =>
      val qv = vecs(qid)
      vecs.toSeq.filter(_._1 != qid).map { case (id, v) => (id, cosI(qv, v)) }
        .sortBy { case (id, rel) => (-rel, id) }.take(5).map(_._1)
    }
    val mmrTop = (0L until 10L).map(q =>
      got.filter(_._1 == q).sortBy(_._2).map(_._3).toSeq)
    assert(pureTop.zip(mmrTop).exists { case (a, b) => a != b },
      "MMR never diverged from pure relevance — diversity term inert")
  }

  test("char entropy matches a direct per-doc computation") {
    val got = TextAnalysisQueries.queries("text_char_entropy")(spark, sfDir)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("n_chars"), r.getAs[Long]("n_distinct_chars"),
          r.getAs[Double]("entropy"))).toMap
    val docs = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(docs.nonEmpty)
    docs.foreach { case (id, text) =>
      val counts = text.groupBy(identity).map(_._2.length)
      val h = math.log(text.length) -
        counts.map(c => math.rint(c * math.log(c) * 1e9) / 1e9).sum / text.length
      val (n, nd, e) = got(id)
      assert(n == text.length)
      assert(nd == counts.size)
      assert(math.abs(e - h) < 1e-5, s"doc $id: $e vs $h")
    }
    // entropy must separate repetitive from varied content
    assert(got.values.map(_._3).max > got.values.map(_._3).min)
  }

  test("ridge shrinks both betas relative to the exact OLS solve") {
    val r = MiningQueries.queries("q_ml_ridge")(spark, sfDir).collect()(0)
    // recompute both solves (lambda and 0) from exact driver-side moments
    val rows = Tables.load(spark, sfDir, "lineitem")
      .select(org.apache.spark.sql.functions.col("l_quantity"),
        org.apache.spark.sql.functions.col("l_discount"),
        org.apache.spark.sql.functions.col("l_extendedprice"))
      .collect()
      .map(x => (math.rint(x.getDouble(0) * 100), math.rint(x.getDouble(1) * 100),
        math.rint(x.getDouble(2) * 100)))
    val n = rows.length.toDouble
    def s(f: ((Double, Double, Double)) => Double) = rows.map(f).sum
    val (s1, s2, sy) = (s(_._1), s(_._2), s(_._3))
    val (s11, s12, s22) = (s(t => t._1 * t._1), s(t => t._1 * t._2), s(t => t._2 * t._2))
    val (s1y, s2y) = (s(t => t._1 * t._3), s(t => t._2 * t._3))
    def solve(lam: Double): (Double, Double) = {
      val a11 = n * s11 - s1 * s1 + lam
      val a12 = n * s12 - s1 * s2
      val a22 = n * s22 - s2 * s2 + lam
      val (r1, r2) = (n * s1y - s1 * sy, n * s2y - s2 * sy)
      val det = a11 * a22 - a12 * a12
      ((a22 * r1 - a12 * r2) / det, (a11 * r2 - a12 * r1) / det)
    }
    val (bq, bd) = (r.getAs[Double]("beta_qty"), r.getAs[Double]("beta_disc"))
    val ridge = solve(MiningQueries.RidgeLambda.toDouble)
    val ols = solve(0.0)
    assert(math.abs(bq - ridge._1) < 1e-6, s"$bq vs ${ridge._1}")
    assert(math.abs(bd - ridge._2) < 1e-6, s"$bd vs ${ridge._2}")
    // the penalty must actually shrink the coefficient norm
    val nr = ridge._1 * ridge._1 + ridge._2 * ridge._2
    val no = ols._1 * ols._1 + ols._2 * ols._2
    assert(nr <= no + 1e-12, s"ridge norm $nr > ols norm $no")
    assert(!r.getAs[Double]("intercept").isNaN)
  }
}
