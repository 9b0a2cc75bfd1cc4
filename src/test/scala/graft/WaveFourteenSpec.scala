package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the wave-14 operators (k-center selection, Haar
  * pyramid, matrix profile, Shapley R²) — semantics the DuckDB twin could
  * share a bug with: greedy monotonicity, wavelet reconstruction, the
  * exclusion zone, and Shapley efficiency.
  */
class WaveFourteenSpec extends SparkSpec {

  test("sim_kcenter: k distinct centers, greedy radii non-increasing") {
    val rows = SparkEntry.queries("sim_kcenter")(spark, sfDir)
      .orderBy("sel_order").collect()
    CacheScope.releaseAll()
    assert(rows.length == graft.sim.SelectionQueries.KCenterK)
    assert(rows.map(_.getAs[Long]("vec_id")).distinct.length == rows.length)
    // farthest-point traversal: the max-min distance shrinks (weakly)
    // with every added center; the seed row reports 0 by convention
    val radii = rows.drop(1).map(_.getAs[Double]("radius2"))
    radii.sliding(2).foreach { case Array(a, b) =>
      assert(b <= a + 1e-9, s"radius grew: $a -> $b")
    }
    assert(rows.head.getAs[Double]("radius2") == 0.0)
  }

  test("q_ts_haar: top approximation reconstructs the 16-day prefix sum") {
    val out = SparkEntry.queries("q_ts_haar")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(out.nonEmpty)
    // recompute the first-16-days sum per type straight off the table
    val ev = Tables.load(spark, sfDir, "events")
    val daily = ev.groupBy(col("event_type"),
        date_trunc("day", col("ts")).cast("date").as("day"))
      .agg(sum((col("value").cast("decimal(12,2)") * 100).cast("long")).as("c"))
    val expect = daily.groupBy("event_type")
      .agg(array_sort(collect_list(struct(col("day"), col("c")))).as("dp"))
      .select(col("event_type"),
        expr("aggregate(slice(transform(dp, p -> p.c), 1, 16), 0L, (a, x) -> a + x)")
          .as("s16"),
        size(col("dp")).as("n"))
      .filter(col("n") >= 16)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = out.filter(r => r.getAs[String]("kind") == "approx")
    assert(approx.nonEmpty)
    approx.foreach { r =>
      assert(r.getAs[Long]("coef") == expect(r.getAs[String]("event_type")))
    }
    // pyramid sizing: 8+4+2+1 details + 1 approx per surviving type
    val perType = out.groupBy(_.getAs[String]("event_type")).view.mapValues(_.length)
    perType.foreach { case (_, n) => assert(n == 16) }
  }

  test("q_ts_matrixprofile: exclusion zone honored, all window starts present") {
    val rows = SparkEntry.queries("q_ts_matrixprofile")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    val w = graft.relational.DtwQueries.MpW
    rows.foreach { r =>
      assert(math.abs(r.getAs[Long]("pos") - r.getAs[Long]("nn_pos")) >= w)
      assert(r.getAs[Double]("nn_dist2") >= 0.0)
    }
    // every start position 0..n-w appears exactly once per type
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (_, rs) =>
      val ps = rs.map(_.getAs[Long]("pos")).sorted
      assert(ps.sameElements(ps.head to ps.last))
      assert(ps.head == 0L)
    }
  }

  test("q_ml_shapley_r2: efficiency (shares sum to joint R2), bounds hold") {
    val rows = SparkEntry.queries("q_ml_shapley_r2")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.length == 2)
    val joint = rows.head.getAs[Double]("r2_joint")
    rows.foreach { r =>
      assert(r.getAs[Double]("r2_joint") == joint)
      val alone = r.getAs[Double]("r2_alone")
      assert(alone >= 0.0 && alone <= 1.0 + 1e-9)
      assert(alone <= joint + 1e-6, "adding a feature cannot lower R2")
    }
    val shareSum = rows.map(_.getAs[Double]("shapley")).sum
    assert(math.abs(shareSum - joint) < 1e-6, s"$shareSum vs $joint")
  }
}
