package graft

/** Structural properties of the bucketed distributed rank: ranks form a
  * permutation, deciles are balanced, and ordering is consistent with the
  * score (rank ties broken by doc_id only across equal scores).
  */
class QualityDecilesSpec extends SparkSpec {

  test("ranks are a permutation, deciles balanced, order matches score") {
    val rows = SparkEntry.queries("text_quality_deciles")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("quality_score"),
        r.getAs[Long]("global_rank"), r.getAs[Long]("decile")))
    val n = rows.length
    assert(n > 0)
    assert(rows.map(_._3).sorted.toSeq == (1L to n).toSeq,
      "global_rank must be a permutation of 1..N")
    // Exact ntile balance: decile sizes differ by at most 1.
    val sizes = rows.groupBy(_._4).view.mapValues(_.length).values
    assert(sizes.max - sizes.min <= 1, s"unbalanced deciles: $sizes")
    // Sorting by rank must sort (score, doc_id) lexicographically.
    val byRank = rows.sortBy(_._3)
    val resorted = rows.sortBy(r => (r._2, r._1))
    assert(byRank.map(_._1).toSeq == resorted.map(_._1).toSeq,
      "rank order must equal (score, doc_id) order")
    CacheScope.releaseAll()
  }
}
