package graft

/** Semantics checks for the round-14 wave. The DuckDB hash compare proves
  * cross-engine parity; these prove the MEANING a twin-implementation bug
  * could preserve: the per-source dup counters must be consistent with the
  * global cluster-stats dup rate, and the threshold-sweep histogram must
  * partition exactly the verified LSH pair relation.
  */
class WaveTwentyFiveSpec extends SparkSpec {

  test("per-source dup rates aggregate to the global cluster-stats counts") {
    val bySource = SparkEntry.queries("dedup_rate_by_source")(spark, sfDir).collect()
    CacheScope.releaseAll()
    val stats = SparkEntry.queries("dedup_cluster_stats")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(bySource.nonEmpty && stats.nonEmpty)
    val i = bySource.head.fieldIndex _
    // every source's counters are internally consistent
    bySource.foreach { r =>
      val n = r.getLong(i("n_docs")); val d = r.getLong(i("n_dup_docs"))
      assert(d >= 0 && d <= n)
      assert(math.abs(r.getDouble(i("dup_frac")) - d.toDouble / n) < 2e-6)
    }
    // source totals partition the corpus the stats query counted
    val nDocs = bySource.map(_.getLong(i("n_docs"))).sum
    assert(nDocs == stats.head.getLong(stats.head.fieldIndex("n_docs")))
    // summed dup docs = Σ over cluster sizes > 1 of size·count
    val dupDocs = bySource.map(_.getLong(i("n_dup_docs"))).sum
    val si = stats.head.fieldIndex _
    val dupFromStats = stats.filter(_.getLong(si("cluster_size")) > 1)
      .map(r => r.getLong(si("cluster_size")) * r.getLong(si("n_clusters_of_size")))
      .sum
    assert(dupDocs == dupFromStats,
      s"per-source dup docs $dupDocs vs cluster-stats $dupFromStats")
  }

  test("threshold sweep partitions the verified LSH pair relation") {
    val pairs = SparkEntry.queries("dedup_minhash_lsh")(spark, sfDir).collect()
    CacheScope.releaseAll()
    val sweep = SparkEntry.queries("dedup_threshold_sweep")(spark, sfDir).collect()
    CacheScope.releaseAll()
    val i = sweep.head.fieldIndex _
    assert(sweep.map(_.getLong(i("n_pairs"))).sum == pairs.length,
      "histogram must cover every candidate pair exactly once")
    // buckets are distinct, within [0, 20], and lo = bucket/20
    val buckets = sweep.map(_.getInt(i("bucket")))
    assert(buckets.distinct.length == buckets.length)
    assert(buckets.forall(b => b >= 0 && b <= 20))
    sweep.foreach(r => assert(
      math.abs(r.getDouble(i("jaccard_lo")) - r.getInt(i("bucket")) / 20.0) < 1e-9))
    // recompute the histogram from the pair relation itself
    val pi = pairs.head.fieldIndex _
    val want = pairs.groupBy(r => math.floor(r.getDouble(pi("jaccard")) * 20).toInt)
      .view.mapValues(_.length.toLong).toMap
    val got = sweep.map(r => r.getInt(i("bucket")) -> r.getLong(i("n_pairs"))).toMap
    assert(got == want)
  }
}
