package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the round-12 wave-2 operators: the Welch PSD,
  * the per-source dataset card, and the stratified AQP estimator.
  */
class WaveTwentyThreeSpec extends SparkSpec {

  private def run(name: String) = {
    val rows = SparkEntry.queries(name)(spark, sfDir).collect()
    CacheScope.releaseAll()
    rows
  }

  test("q_ts_welch_psd: bounded segments, non-negative averaged power") {
    val got = run("q_ts_welch_psd")
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(Seq(7L, 14L, 30L).contains(r.getAs[Long]("period")))
      val ns = r.getAs[Long]("n_segments")
      assert(ns >= 1 && ns <= relational.SpectralQueries.WelchSegments)
      assert(r.getAs[Double]("welch_power") >= 0.0)
    }
    // every (type, period) cell that q_ts_periodogram reports also has a
    // Welch estimate (the segment split can only DROP sub-2-day segments)
    val types = got.map(_.getString(0)).toSet
    val pg = run("q_ts_periodogram").map(_.getString(0)).toSet
    assert(types == pg)
  }

  test("text_corpus_card: totals reconcile, effective languages bounded") {
    val got = run("text_corpus_card")
    val docs = Tables.load(spark, sfDir, "documents")
    val nDocs = docs.count()
    CacheScope.releaseAll()
    assert(got.map(_.getAs[Long]("n_docs")).sum == nDocs)
    got.foreach { r =>
      val nl = r.getAs[Long]("n_langs")
      val el = r.getAs[Double]("eff_langs")
      assert(el >= 1.0 - 1e-9 && el <= nl + 1e-4) // exp(H) <= support
      assert(r.getAs[Double]("avg_tokens") > 0)
      assert(r.getAs[Long]("n_tokens") >= r.getAs[Long]("n_docs"))
    }
  }

  test("q_aqp_stratified: estimator lands near exact, SE attached and positive") {
    val got = run("q_aqp_stratified")
    assert(got.nonEmpty)
    val se = got.head.getAs[Double]("se_strat")
    assert(se > 0)
    got.foreach { r =>
      assert(r.getAs[Double]("se_strat") == se) // one combined SE on every row
      assert(r.getAs[Long]("n_sample") <= r.getAs[Long]("n_exact"))
      assert(r.getAs[Long]("n_sample") >= 2)
      // a 1/64 uniform sample of thousands of rows: generous 50% bound
      // catches wiring mistakes (wrong scale factor, wrong stratum join)
      // without flaking on sampling noise
      assert(r.getAs[Double]("rel_err") < 0.5)
      // and the estimate really is N_g * sample-mean scaled back to dollars
      assert(r.getAs[Double]("est_sum") > 0)
    }
  }
}
