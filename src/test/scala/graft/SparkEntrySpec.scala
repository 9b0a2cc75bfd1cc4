package graft

/** Driver-contract integrity: pack keys must be globally unique (a
  * duplicate would silently shadow another pack's query in the merged
  * map), every oracle must refer to a real query, and the flagship entry
  * must return rows.
  */
class SparkEntrySpec extends SparkSpec {

  // Derived from the production registry — adding a pack to
  // SparkEntry.packs is the only registration step; this spec follows.
  private val packs = SparkEntry.packs

  test("query keys are globally unique across packs") {
    val all = packs.flatMap(_.queries.keys)
    val dups = all.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query keys: $dups")
    // A duplicate across packs would make the merged map smaller than the
    // concatenated key list — the shadowing this test exists to catch.
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
    // Every registered pack must contribute at least one query, and the
    // merged surface must be exactly the sum of the packs (nothing dropped
    // in the merge).
    val empty = packs.filter(_.queries.isEmpty)
    assert(empty.isEmpty, s"packs with zero queries: $empty")
    assert(SparkEntry.queries.size == packs.map(_.queries.size).sum)
    // ABSOLUTE floor, deliberately not derived from the registry: the
    // derived checks above are self-referential (delete a pack from
    // SparkEntry.packs and they still pass). This pins the pack-name set
    // and the shipped query count; shrinking either is a conscious edit
    // HERE, never a silent registry change. (Growing is free — only
    // removal trips it.)
    val expectedPacks = Set(
      "TfIdfQueries", "PosQueries", "RelationalQueries", "WindowQueries",
      "ScalarFuncQueries", "TpchQueries", "SqlFeatureQueries",
      "ProfilingQueries", "EventOpsQueries", "DedupQueries",
      "SemanticDedupQueries", "BpeQueries", "GraphPathQueries",
      "SimilarityQueries", "TextAnalysisQueries", "CorpusOpsQueries",
      "MultimodalQueries", "StreamingQueries", "SketchQueries",
      "LayoutQueries", "PairEvalQueries", "DriftQueries", "DtwQueries",
      "TimeSeriesQueries", "StatsQueries", "MiningQueries",
      "TextModelQueries", "EvalQueries", "ModelPrepQueries",
      "PrivacyQueries", "DecisionQueries", "SelectionQueries")
    val actualPacks = packs.map(_.getClass.getSimpleName.stripSuffix("$")).toSet
    assert(expectedPacks.subsetOf(actualPacks),
      s"packs removed from the registry: ${expectedPacks -- actualPacks}")
    assert(SparkEntry.queries.size >= 314,
      s"query surface shrank below the round-11 floor: ${SparkEntry.queries.size}")
  }

  test("flagship entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
