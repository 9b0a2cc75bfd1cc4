package graft

/** Driver-contract integrity: pack keys must be globally unique (a
  * duplicate would silently shadow another pack's query in the merged
  * map), every oracle must refer to a real query, and the flagship entry
  * must return rows.
  */
class SparkEntrySpec extends SparkSpec {

  private val packs = Seq(
    tfidf.TfIdfQueries, pos.PosQueries, relational.RelationalQueries,
    relational.WindowQueries, relational.ScalarFuncQueries,
    relational.AdvancedQueries, dedup.DedupQueries, sim.SimilarityQueries,
    text.TextAnalysisQueries, mm.MultimodalQueries,
    streaming.StreamingQueries)

  test("query keys are globally unique across packs") {
    val all = packs.flatMap(_.queries.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query keys: $dups")
    assert(SparkEntry.queries.size == all.size)
  }

  test("EVERY query is oracled, and every oracle has a query (no drift)") {
    // Round 2 closed the last verification hole (the stemmed TF-IDF path,
    // oracled via the stem-map side table): full bijection from here on.
    val unoracled = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(unoracled.isEmpty, s"queries without oracles: $unoracled")
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
    SparkEntry.oracleSql.foreach { case (k, sql) =>
      assert(sql.trim.nonEmpty && sql.toUpperCase.contains("SELECT"), k)
    }
  }

  test("coverage floor: the surface doesn't silently shrink") {
    assert(SparkEntry.queries.size >= 78,
      s"only ${SparkEntry.queries.size} queries registered")
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
