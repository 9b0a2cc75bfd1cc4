package graft

import graft.relational.CausalQueries

/** Invariants + small-scale brute-force replicas for the causal pack.
  * The DuckDB oracle already hash-checks the arithmetic; these specs check
  * the ESTIMATORS — the matching walk really picks the nearest same-segment
  * control, the stratified IPW total really is the stratum-share-weighted
  * mean, and the published identities hold between the released columns.
  */
class CausalSpec extends SparkSpec {

  private def one(name: String) =
    CausalQueries.queries(name)(spark, sfDir).collect()(0)

  test("did equals the cell-mean double difference") {
    val r = one("q_causal_did")
    val did = (r.getDouble(r.fieldIndex("mean_t_post")) -
      r.getDouble(r.fieldIndex("mean_t_pre"))) -
      (r.getDouble(r.fieldIndex("mean_c_post")) -
        r.getDouble(r.fieldIndex("mean_c_pre")))
    assert(math.abs(did - r.getDouble(r.fieldIndex("did"))) < 2e-6)
    Seq("n_t_pre", "n_t_post", "n_c_pre", "n_c_post")
      .foreach(c => assert(r.getLong(r.fieldIndex(c)) > 0))
  }

  test("wald estimate is the ITT ratio") {
    val r = one("q_causal_iv")
    val ratio = r.getDouble(r.fieldIndex("itt_outcome")) /
      r.getDouble(r.fieldIndex("itt_uptake"))
    assert(math.abs(ratio - r.getDouble(r.fieldIndex("wald_late"))) < 1e-2,
      s"ratio=$ratio wald=${r.getDouble(r.fieldIndex("wald_late"))}")
  }

  test("cuped correlation share is a valid fraction and shrinks toward raw") {
    val r = one("q_causal_cuped")
    val rho2 = r.getDouble(r.fieldIndex("rho2"))
    assert(rho2 >= 0.0 && rho2 <= 1.0)
    assert(r.getLong(r.fieldIndex("n_treat")) >= 2)
    assert(r.getLong(r.fieldIndex("n_control")) >= 2)
    assert(!r.getDouble(r.fieldIndex("ate_cuped")).isNaN)
  }

  test("ipw total is the stratum-share-weighted mean of stratum diffs") {
    val rows = CausalQueries.queries("q_causal_ipw")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val n = rows.map(_.getLong(1)).sum
    val tot = rows.map(r => r.getLong(1).toDouble * r.getDouble(3)).sum / n
    rows.foreach { r =>
      assert(math.abs(r.getDouble(4) - tot) < 1e-5,
        s"ate_ipw=${r.getDouble(4)} recomputed=$tot")
      assert(r.getDouble(2) > 0.0 && r.getDouble(2) < 1.0) // overlap holds
    }
  }

  test("doubly-robust estimate lands near the simple arm difference") {
    val r = one("q_causal_dr")
    val nCells = r.getLong(r.fieldIndex("n_cells"))
    assert(nCells > 0 && nCells <= 2L * 5 * 24, s"cells=$nCells")
    val dr = r.getDouble(r.fieldIndex("ate_dr"))
    val om = r.getDouble(r.fieldIndex("ate_outcome_model"))
    // under randomized assignment all estimators target the same truth;
    // DR and the pure outcome-model estimate must agree within the
    // stratum-weighting correction's scale
    assert(math.abs(dr - om) < 5.0, s"dr=$dr om=$om diverge")
    // and both against the raw IV intent-to-treat outcome difference
    val iv = one("q_causal_iv")
    val itt = iv.getDouble(iv.fieldIndex("itt_outcome"))
    assert(math.abs(dr - itt) < 5.0, s"dr=$dr itt=$itt diverge")
  }

  test("matching att agrees with a brute-force nearest-control scan") {
    val sess = spark
    import sess.implicits._
    val panel = Tables.load(spark, sfDir, "orders")
      .groupBy($"o_custkey").agg(
        org.apache.spark.sql.functions.sum(
          (org.apache.spark.sql.functions.col("o_totalprice")
            .cast("decimal(12,2)") * 100).cast("long")).as("y0"))
      .join(Tables.load(spark, sfDir, "customer"),
        $"o_custkey" === $"c_custkey", "right")
      .select($"c_custkey".as("ck"), $"c_mktsegment".as("seg"),
        ($"c_acctbal".cast("decimal(12,2)") * 100).cast("long").as("x"),
        org.apache.spark.sql.functions.coalesce($"y0",
          org.apache.spark.sql.functions.lit(0L)).as("y"))
      .as[(Long, String, Long, Long)].collect()
    val controls = panel.filter(_._1 % 2 != 0).groupBy(_._2)
    val treated = panel.filter(_._1 % 2 == 0)
    val diffs = treated.flatMap { case (ck, seg, x, y) =>
      controls.get(seg).map { cs =>
        // nearest |x - xc|; ties prefer the PREDECESSOR in (x, ck) order,
        // i.e. the smaller xc; equal xc cannot tie-break differently on y
        // because the window picks the last such control — replicate by
        // (dist, xc desc within equal dist?) — the query's order is
        // (x asc, treat asc, ck asc), so among equal xc the LAST control
        // row in ck order is seen by the prev-walk; the next-walk sees the
        // FIRST. Replicate exactly:
        val below = cs.filter(c => c._3 <= x)
        val above = cs.filter(c => c._3 > x)
        val prev = if (below.isEmpty) None
          else Some(below.maxBy(c => (c._3, c._1)))
        val next = if (above.isEmpty) None
          else Some(above.minBy(c => (c._3, c._1)))
        val pick = (prev, next) match {
          case (Some(p), None) => p
          case (None, Some(nx)) => nx
          case (Some(p), Some(nx)) =>
            if (x - p._3 <= nx._3 - x) p else nx
          case _ => throw new IllegalStateException
        }
        (y - pick._4, math.abs(x - pick._3))
      }
    }
    val att = diffs.map(_._1).sum.toDouble / diffs.length / 100.0
    val r = one("q_causal_matching_att")
    assert(r.getLong(r.fieldIndex("n_matched")) == diffs.length)
    assert(math.abs(r.getDouble(r.fieldIndex("att")) - att) < 1e-4,
      s"query att=${r.getDouble(r.fieldIndex("att"))} brute=$att")
  }

  test("rdd intercepts agree with a local least-squares replica") {
    val sess = spark
    import sess.implicits._
    val band = Tables.load(spark, sfDir, "orders")
      .groupBy($"o_custkey").agg(
        org.apache.spark.sql.functions.sum(
          (org.apache.spark.sql.functions.col("o_totalprice")
            .cast("decimal(12,2)") * 100).cast("long")).as("y0"))
      .join(Tables.load(spark, sfDir, "customer"),
        $"o_custkey" === $"c_custkey", "right")
      .select(($"c_acctbal".cast("decimal(12,2)") * 100).cast("long").as("x"),
        org.apache.spark.sql.functions.coalesce($"y0",
          org.apache.spark.sql.functions.lit(0L)).as("y"))
      .as[(Long, Long)].collect()
      .filter(p => p._1 >= -CausalQueries.RddBandCents &&
        p._1 < CausalQueries.RddBandCents)
    def fit(ps: Array[(Long, Long)]): (Double, Double) = {
      val n = ps.length.toDouble
      val sx = ps.map(_._1.toDouble).sum
      val sy = ps.map(_._2.toDouble).sum
      val sxy = ps.map(p => p._1.toDouble * p._2.toDouble).sum
      val sxx = ps.map(p => p._1.toDouble * p._1.toDouble).sum
      val slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      (slope, (sy - slope * sx) / n / 100.0)
    }
    val (sl, il) = fit(band.filter(_._1 < 0))
    val (sr, ir) = fit(band.filter(_._1 >= 0))
    val r = one("q_causal_rdd")
    assert(math.abs(r.getDouble(r.fieldIndex("slope_left")) - sl) < 1e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("slope_right")) - sr) < 1e-6)
    assert(math.abs(r.getDouble(r.fieldIndex("icept_left")) - il) < 1e-3)
    assert(math.abs(r.getDouble(r.fieldIndex("icept_right")) - ir) < 1e-3)
    assert(math.abs(r.getDouble(r.fieldIndex("rdd_effect")) - (ir - il)) < 2e-3)
  }
}
