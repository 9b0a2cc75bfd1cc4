package graft

/** Invariant checks for wave 16: per-source boilerplate accounting and
  * the EM-estimated Fellegi–Sunter parameters.
  */
class WaveSixteenSpec extends SparkSpec {

  test("text_boilerplate: counts consistent, signal present on the gate corpus") {
    val rows = SparkEntry.queries("text_boilerplate")(spark, "/root/testdata/sf0.01")
      .collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_shingles")
      val b = r.getAs[Long]("n_boiler")
      assert(n > 0 && b >= 0 && b <= n)
      val ratio = r.getAs[Double]("boiler_ratio")
      assert(math.abs(ratio - b.toDouble / n) < 1e-6)
    }
    // the dial is tuned so the synthetic corpus actually exhibits
    // template shingles — an all-zero column would be a vacuous oracle
    assert(rows.exists(_.getAs[Long]("n_boiler") > 0))
  }

  test("q_er_em_weights: probabilities bounded, EM separates the informative field") {
    val rows = SparkEntry.queries("q_er_em_weights")(spark, "/root/testdata/sf0.01")
      .collect()
    CacheScope.releaseAll()
    assert(rows.length == 3)
    val byField = rows.map(r => r.getAs[String]("field") -> r).toMap
    rows.foreach { r =>
      Seq("m_hat", "u_hat", "p_match").foreach { c =>
        val v = r.getAs[Double](c)
        assert(v >= 0.0 && v <= 1.0, s"$c=$v")
      }
    }
    val p = rows.head.getAs[Double]("p_match")
    assert(rows.forall(_.getAs[Double]("p_match") == p))
    assert(p > 0.0 && p < 1.0)
    // band1 is the field whose agreement actually separates the latent
    // classes under (nation, band5) blocking
    val band = byField("band1")
    assert(band.getAs[Double]("m_hat") > band.getAs[Double]("u_hat"))
    assert(band.getAs[Double]("w_agree") > 0.0)
    // the balance SIGN is constant within a $500 band block, so EM must
    // find it uninformative: agreement probability 1 in BOTH classes
    val neg = byField("neg")
    assert(neg.getAs[Double]("m_hat") == 1.0 && neg.getAs[Double]("u_hat") == 1.0)
    assert(neg.getAs[Double]("w_agree") == 0.0)
  }

  test("q_er_clusters: every node labeled once, matched pairs co-cluster") {
    val rows = SparkEntry.queries("q_er_clusters")(spark, "/root/testdata/sf0.01")
      .collect()
    val matches = SparkEntry.queries("q_er_fellegi")(spark, "/root/testdata/sf0.01")
      .collect()
    CacheScope.releaseAll()
    val off = graft.relational.EntityResolutionQueries.ErSuppOffset
    // one label per node, kinds agree with the id-space split
    assert(rows.map(_.getAs[Long]("node_id")).distinct.length == rows.length)
    rows.foreach { r =>
      val isCust = r.getAs[Long]("node_id") < off
      assert(r.getAs[String]("kind") == (if (isCust) "customer" else "supplier"))
    }
    // transitivity floor: every scored match must land both ends in the
    // same entity
    val ent = rows.map(r => r.getAs[Long]("node_id") -> r.getAs[Long]("entity_id")).toMap
    matches.foreach { m =>
      assert(ent(m.getAs[Long]("custkey")) == ent(m.getAs[Long]("suppkey") + off))
    }
    // entity sizes are consistent with the label multiset
    val bySize = rows.groupBy(_.getAs[Long]("entity_id"))
    rows.foreach { r =>
      assert(r.getAs[Long]("n_members") ==
        bySize(r.getAs[Long]("entity_id")).length.toLong)
    }
    assert(rows.exists(_.getAs[Long]("n_members") > 1))
  }
}
