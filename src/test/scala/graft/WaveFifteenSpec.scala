package graft

import org.apache.spark.sql.functions._

/** Invariant checks for the privacy pack: flag consistency for the
  * k-anonymity audit and mechanism sanity (sensitivity-scaled noise
  * magnitude, release size) for the DP queries.
  */
class WaveFifteenSpec extends SparkSpec {

  test("q_dp_kanonymity: flags agree with the counts they summarize") {
    val rows = SparkEntry.queries("q_dp_kanonymity")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert((r.getAs[Int]("k_ok") == 1) ==
        (r.getAs[Long]("n_rows") >= graft.relational.PrivacyQueries.KAnon))
      assert((r.getAs[Int]("l_ok") == 1) ==
        (r.getAs[Long]("l_div") >= graft.relational.PrivacyQueries.LDiv))
      assert(r.getAs[Long]("l_div") <= 5) // priority domain size
    }
  }

  test("q_dp_laplace_hist: noise stays Laplace(1)-sized around true counts") {
    val rows = SparkEntry.queries("q_dp_laplace_hist")(spark, sfDir).collect()
    CacheScope.releaseAll()
    val truth = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_orderpriority")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.length == truth.size)
    rows.foreach { r =>
      val diff = r.getAs[Double]("noisy_n") - truth(r.getAs[String]("priority"))
      // P(|Lap(1)| > 20) ~ 2e-9: a bigger deviation means a broken draw
      assert(math.abs(diff) < 20.0, s"noise $diff out of range")
      assert(diff != 0.0, "noise must actually perturb the count")
    }
  }

  test("q_dp_noisy_topk: k distinct keys, noisy counts near their truths") {
    val rows = SparkEntry.queries("q_dp_noisy_topk")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.length == graft.relational.PrivacyQueries.DpTopK)
    val keys = rows.map(_.getAs[Long]("custkey"))
    assert(keys.distinct.length == keys.length)
    val truth = Tables.load(spark, sfDir, "orders")
      .groupBy(col("o_custkey")).count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val diff = r.getAs[Double]("noisy_n") - truth(r.getAs[Long]("custkey"))
      assert(math.abs(diff) < 20.0, s"noise $diff out of range")
    }
  }
}
