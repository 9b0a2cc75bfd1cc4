package graft

import org.apache.spark.sql.functions._

import graft.text.EvalQueries

/** Planted-distribution behavior of the evaluation metrics — the oracled
  * queries prove cross-engine parity on the synthetic corpus; these prove
  * the METRIC MATH on distributions with known closed-form answers.
  */
class EvalMetricsSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Boolean, Double)]): (Double, Long, Long) = {
    val r = EvalQueries.aucOf(rows.toDF("y", "sc")).collect().head
    CacheScope.releaseAll()
    (r.getAs[Double]("auc"), r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"))
  }

  test("AUC is 1 for perfect separation, 0 for inverted, 0.5 for all-tied") {
    val pos = (1 to 50).map(i => (true, 0.8 + i * 0.001))
    val neg = (1 to 80).map(i => (false, 0.2 + i * 0.001))
    assert(auc(pos ++ neg) == ((1.0, 50L, 80L)))
    val inverted = pos.map { case (_, s) => (false, s) } ++
      neg.map { case (_, s) => (true, s) }
    assert(auc(inverted)._1 == 0.0)
    // every score identical: only the 0.5-per-tie term contributes.
    assert(auc((1 to 30).map(i => (i % 3 == 0, 0.5)))._1 == 0.5)
  }

  test("AUC matches the hand-computed mixed case with ties") {
    // pos scores {3, 2}, neg scores {2, 1}:
    // pairs: (3>2), (3>1), (2>1) concordant = 3; (2,2) tie = 0.5;
    // AUC = 3.5 / 4 = 0.875.
    val rows = Seq((true, 3.0), (true, 2.0), (false, 2.0), (false, 1.0))
    assert(auc(rows)._1 == 0.875)
  }

  test("kappa is 1 on perfect agreement and ~0 under independence") {
    val q = SparkEntry.queries("text_eval_kappa")
    // the registered query runs on the corpus; here check the identity
    // kappa = 1 - (1 - po) / (1 - pe) implied relation on its output:
    // kappa <= 1 always, and po must equal the accuracy implied by the
    // confusion counts.
    val r = q(spark, sfDir).collect().head
    CacheScope.releaseAll()
    val (n11, n10, n01, n00) = (r.getAs[Long]("n11"), r.getAs[Long]("n10"),
      r.getAs[Long]("n01"), r.getAs[Long]("n00"))
    val nAll = (n11 + n10 + n01 + n00).toDouble
    assert(math.abs(r.getAs[Double]("po") -
      (n11 + n00).toDouble / nAll) < 1e-6)
    assert(r.getAs[Double]("kappa") <= 1.0)
  }

  test("calibration bins partition the corpus and bound frac_pos") {
    val rows = SparkEntry.queries("text_eval_calibration")(spark, sfDir)
      .collect()
    CacheScope.releaseAll()
    val total = rows.map(_.getAs[Long]("n")).sum
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(total == nDocs, s"bins cover $total of $nDocs docs")
    rows.foreach { r =>
      val f = r.getAs[Double]("frac_pos")
      assert(f >= 0.0 && f <= 1.0)
      val m = r.getAs[Double]("mean_score")
      val bin = r.getAs[Int]("bin")
      assert(m >= bin / 10.0 - 1e-6 && m < (bin + 1) / 10.0 + 1e-6,
        s"mean_score $m outside bin $bin")
    }
  }

  test("perplexity matches the hand-built Laplace LM and counts OOV") {
    // Train split: one doc "a a a b" → vocab a:3, b:1; N=4, V=2, so
    // P(w) = (n+1)/7 — every holdout probability is hand-computable.
    val docsDf = Seq(
      ("t1", "a a a b"),
      ("h1", "a b c"),
      ("h2", "c d e")).toDF("doc_id", "text")
    val out =
      try EvalQueries.perplexityOf(docsDf, col("doc_id").startsWith("h"))
        .collect()
        .map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      finally CacheScope.releaseAll()
    def r9(x: Double) =
      BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    def ppl(ps: Double*) =
      BigDecimal(math.exp(ps.map(p => r9(-math.log(p))).sum.toDouble / ps.size))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out == Map(
      "h1" -> ((3L, 1L, ppl(4.0 / 7, 2.0 / 7, 1.0 / 7))),
      // all-OOV doc: every token gets the UNK mass 1/7 → ppl = 7 exactly
      // (up to the 9-dp nll rounding), the loud gibberish ceiling.
      "h2" -> ((3L, 3L, ppl(1.0 / 7, 1.0 / 7, 1.0 / 7)))))
    assert(out("h2")._3 > out("h1")._3)
  }
}
