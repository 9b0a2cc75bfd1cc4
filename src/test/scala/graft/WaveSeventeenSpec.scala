package graft

/** Invariant checks for wave 17: SPRT decision coherence, isotonic
  * monotonicity + mean preservation, and generalization-lattice flags.
  */
class WaveSeventeenSpec extends SparkSpec {

  test("q_ml_sprt: decisions coherent with boundaries") {
    val rows = SparkEntry.queries("q_ml_sprt")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val dec = r.getAs[String]("decision")
      assert(Set("accept_h1", "accept_h0", "continue")(dec))
      assert((dec == "continue") == (r.getAs[java.sql.Date]("decision_day") == null))
      assert(r.getAs[Long]("n_days") > 0)
    }
  }

  test("q_ml_isotonic: fit is monotone, bounded, and mean-preserving") {
    val rows = SparkEntry.queries("q_ml_isotonic")(spark, sfDir)
      .orderBy("disc_band").collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    val iso = rows.map(_.getAs[Double]("p_iso"))
    iso.sliding(2).foreach { case Array(a, b) => assert(b >= a - 1e-9, s"$a -> $b") }
    val raw = rows.map(_.getAs[Double]("p_raw"))
    iso.foreach { v => assert(v >= raw.min - 1e-6 && v <= raw.max + 1e-6) }
    // PAVA / minimax preserves the weighted mean (pool-adjacent identity)
    val n = rows.map(_.getAs[Long]("n").toDouble)
    val wIso = n.zip(iso).map { case (a, b) => a * b }.sum
    val wRaw = n.zip(raw).map { case (a, b) => a * b }.sum
    assert(math.abs(wIso - wRaw) / wRaw < 1e-3, s"$wIso vs $wRaw")
  }

  test("q_dp_generalize: levels agree with the counts, keys match levels") {
    val K = graft.relational.PrivacyQueries.KAnon
    val rows = SparkEntry.queries("q_dp_generalize")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n1, n2) = (r.getAs[Long]("n_l1"), r.getAs[Long]("n_l2"))
      val lvl = r.getAs[Int]("level")
      val key = r.getAs[String]("released_key")
      assert(n2 >= n1)
      if (n1 >= K) assert(lvl == 0 && key.contains("/N"))
      else if (n2 >= K) assert(lvl == 1 && key.contains("/R"))
      else assert(lvl == 2 && key == "*")
    }
  }
}
