package graft

import graft.relational.RegDiagQueries

/** Invariants + brute-force replicas for the model-diagnostics pack. */
class RegDiagSpec extends SparkSpec {

  test("durbin-watson stays in (0,4) and tracks the lag-1 identity") {
    val rows = RegDiagQueries.queries("q_stats_durbin_watson")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dw = r.getDouble(r.fieldIndex("dw"))
      val rho1 = r.getDouble(r.fieldIndex("rho1"))
      assert(dw > 0.0 && dw < 4.0, s"dw out of range: $dw")
      // DW ~ 2(1 - rho1) up to the two boundary terms
      assert(math.abs(dw - 2.0 * (1.0 - rho1)) < 0.75,
        s"dw=$dw rho1=$rho1 break the lag-1 identity beyond edge effects")
    }
  }

  test("breusch-pagan statistic is n times the auxiliary r2") {
    val rows = RegDiagQueries.queries("q_stats_breusch_pagan")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getLong(r.fieldIndex("n_days"))
      val r2 = r.getDouble(r.fieldIndex("r2_aux"))
      val bp = r.getDouble(r.fieldIndex("bp_stat"))
      assert(r2 >= 0.0 && r2 <= 1.0)
      assert(math.abs(bp - n * r2) < 1e-4, s"bp=$bp n*r2=${n * r2}")
    }
  }

  test("vif correlations match a driver-side replica and vifs are >= 1") {
    val sess = spark
    import sess.implicits._
    val rows = Tables.load(spark, sfDir, "lineitem")
      .select($"l_quantity".cast("double"), $"l_extendedprice".cast("double"),
        $"l_discount".cast("double"))
      .as[(Double, Double, Double)].collect()
    def corr(a: Array[Double], b: Array[Double]): Double = {
      val n = a.length.toDouble
      val (sa, sb) = (a.sum, b.sum)
      val sab = a.zip(b).map { case (x, y) => x * y }.sum
      val saa = a.map(x => x * x).sum
      val sbb = b.map(x => x * x).sum
      (n * sab - sa * sb) / math.sqrt((n * saa - sa * sa) * (n * sbb - sb * sb))
    }
    val q = rows.map(_._1); val p = rows.map(_._2); val dc = rows.map(_._3)
    val r = RegDiagQueries.queries("q_stats_vif")(spark, sfDir).collect()(0)
    assert(math.abs(r.getDouble(r.fieldIndex("r_qty_price")) - corr(q, p)) < 1e-4)
    assert(math.abs(r.getDouble(r.fieldIndex("r_qty_disc")) - corr(q, dc)) < 1e-4)
    assert(math.abs(r.getDouble(r.fieldIndex("r_price_disc")) - corr(p, dc)) < 1e-4)
    Seq("vif_quantity", "vif_price", "vif_discount").foreach { c =>
      assert(r.getDouble(r.fieldIndex(c)) >= 1.0 - 1e-9,
        s"$c < 1: ${r.getDouble(r.fieldIndex(c))}")
    }
  }

  test("cooks distance returns each type's top-3 with valid leverage") {
    val rows = RegDiagQueries.queries("q_stats_cooks_distance")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      assert(rs.map(_.getInt(rs.head.fieldIndex("rnk"))).sorted.toSeq ==
        (1 to rs.length))
      // ranked descending by influence
      val ds = rs.sortBy(_.getInt(rs.head.fieldIndex("rnk")))
        .map(_.getDouble(rs.head.fieldIndex("cooks_d")))
      assert(ds.zip(ds.tail).forall { case (a, b) => a >= b })
    }
    rows.foreach { r =>
      val h = r.getDouble(r.fieldIndex("leverage"))
      assert(h > 0.0 && h < 1.0, s"leverage out of (0,1): $h")
      assert(r.getDouble(r.fieldIndex("cooks_d")) >= 0.0)
    }
  }

  test("anderson-darling timing stat is small for the uniform corpus") {
    val rows = RegDiagQueries.queries("q_stats_anderson_darling")(spark, sfDir)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ad = r.getDouble(r.fieldIndex("ad_stat"))
      assert(ad > 0.0, s"A2 must be positive: $ad")
      // events are generated ~uniformly over the range; A2 for a truly
      // uniform sample is ~1; even a loose 20x band catches a broken PIT
      assert(ad < 20.0, s"A2 implausibly large for uniform arrivals: $ad")
    }
  }

  test("log-rank O/E/V agree with a driver-side hazard-table replica") {
    val sess = spark
    import sess.implicits._
    val users = Tables.load(spark, sfDir, "events")
      .groupBy($"user_id")
      .agg(org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.date_trunc("day", $"ts").cast("date"))
          .as("fd"),
        org.apache.spark.sql.functions.max(
          org.apache.spark.sql.functions.date_trunc("day", $"ts").cast("date"))
          .as("ld"),
        org.apache.spark.sql.functions.min(
          org.apache.spark.sql.functions.when($"event_type" === "purchase",
            org.apache.spark.sql.functions.date_trunc("day", $"ts").cast("date")))
          .as("pd"))
      .select($"user_id",
        org.apache.spark.sql.functions.datediff(
          org.apache.spark.sql.functions.coalesce($"pd", $"ld"), $"fd").as("lt"),
        $"pd".isNotNull.as("dead"))
      .as[(Long, Int, Boolean)].collect()
    val byT = users.groupBy(_._2).toSeq.sortBy(_._1)
    var (o1, e1, vv) = (0L, 0.0, 0.0)
    var nTimes = 0
    byT.foreach { case (t, _) =>
      val atRisk = users.filter(_._2 >= t)
      val n = atRisk.length.toDouble
      val n1 = atRisk.count(_._1 % 2 == 0).toDouble
      val deaths = users.filter(u => u._2 == t && u._3)
      val d = deaths.length.toDouble
      if (d > 0 && n > 1) {
        nTimes += 1
        o1 += deaths.count(_._1 % 2 == 0)
        e1 += d * n1 / n
        vv += d * n1 / n * (1.0 - n1 / n) * (n - d) / (n - 1.0)
      }
    }
    val r = RegDiagQueries.queries("q_stats_logrank")(spark, sfDir).collect()(0)
    assert(r.getLong(r.fieldIndex("n_times")) == nTimes)
    assert(r.getLong(r.fieldIndex("o1")) == o1)
    assert(math.abs(r.getDouble(r.fieldIndex("e1_total")) - e1) < 1e-4)
    assert(math.abs(r.getDouble(r.fieldIndex("var_total")) - vv) < 1e-4)
    val chi2 = (o1 - e1) * (o1 - e1) / vv
    assert(math.abs(r.getDouble(r.fieldIndex("logrank_chi2")) - chi2) < 1e-3)
  }
}
