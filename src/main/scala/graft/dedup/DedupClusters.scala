package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over near-dup candidate pairs: the step after LSH
  * in a real dedup pipeline — candidate pairs say "these two are dups",
  * clustering picks ONE canonical doc per group (min doc_id here).
  *
  * Algorithm: distributed min-label propagation to fixpoint. Each step is
  * a join+aggregate over the edge list (fully distributed); the driver
  * only checks the converged flag — no data ever reaches the driver. The
  * iteration count is bounded by the cluster diameter, which for dedup
  * graphs is tiny (near-dup clusters are near-cliques); the `maxIters`
  * bound guards pathological chains.
  */
object DedupClusters {

  /** Broadcast the final label relation only below this row count. What is
    * broadcast is the labels, so the gate is on labels — the old edge-count
    * gate (<=10M edges) could admit ~2x10^7 labels. Byte bound: a
    * LongHashedRelation costs ~64 B/entry (two longs + open-addressing
    * slack + object headers), so 1M labels ≈ 64 MB — inside every default
    * driver/executor memory budget, where 2x10^7 would be >1.2 GB.
    */
  val MaxBroadcastLabels = 1000000L

  /** The default (no `checkpointDir`) storage paths are node-local: the
    * edge relation goes to a driver-created temp dir and iteration state to
    * `localCheckpoint` blocks. On local[n] driver==executor and both work;
    * on a real cluster executors would write `file:` paths the readers
    * can't see, and localCheckpoint blocks die with their executor. Fail
    * fast with the fix in the message rather than corrupt silently.
    */
  private[graft] def requireClusterSafe(master: String,
      checkpointDir: Option[String]): Unit =
    require(checkpointDir.isDefined || master.startsWith("local"),
      s"DedupClusters: master '$master' is not local — pass checkpointDir= " +
        "a shared-filesystem path (edge materialization and localCheckpoint " +
        "are node-local and do not survive on a cluster)")

  /** pairs(doc_a, doc_b) + universe(doc_id) -> (doc_id, cluster_id).
    *
    * Only documents that appear in some candidate pair enter the
    * iteration: everything else is a singleton cluster by definition, and
    * joins back in at the end. At 100 TB the paired set is a sliver of
    * the corpus (that's what LSH is for), so the fixpoint loop runs over
    * the candidate graph, never the full table.
    *
    * `checkpointDir`: when set, iteration state is pinned with RELIABLE
    * checkpoints (`df.checkpoint`) written under that path instead of
    * executor-local blocks. `localCheckpoint` is lost with its executor —
    * fine on local[n], unacceptable for a long fixpoint on a real cluster
    * where one lost executor would fail the whole loop; a shared-FS
    * checkpoint survives executor churn.
    *
    * Convergence is detected from a `chg` flag computed INSIDE the
    * pointer-jump projection, so the per-iteration count is a scan of the
    * just-materialized checkpoint blocks — no extra join job (the old
    * labels-vs-next join burned one full job per iteration).
    *
    * If `maxIters` is exhausted the labels may be partially propagated
    * (long-chain graphs); that is loudly warned, never silent — callers
    * that need a guarantee can raise `maxIters` (pointer jumping makes
    * convergence O(log diameter), so 15 handles diameter ~2^15).
    */
  def clusters(pairs: DataFrame, universe: DataFrame, maxIters: Int = 15,
      checkpointDir: Option[String] = None): DataFrame = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      log.info(f"[graft] clusters $what%-18s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // Iterative-algorithm storage discipline: eager checkpoints, NOT
    // persist/unpersist. Unpersisting an upstream cache invalidates
    // dependent InMemoryRelations and re-registers them on the RAW plan,
    // so later iterations silently recompute the entire candidate-pair
    // lineage (measured: 30-140s per iteration instead of ~1s). Eager
    // checkpoints materialize AND truncate lineage, so each iteration
    // starts from stored blocks whatever happens upstream.
    checkpointDir.foreach(pairs.sparkSession.sparkContext.setCheckpointDir)
    def pin(df: DataFrame): DataFrame =
      if (checkpointDir.isDefined) df.checkpoint(eager = true)
      else df.localCheckpoint(eager = true)

    // pairs is usually an expensive LSH pipeline; it must be materialized
    // exactly once. Two subtleties, both measured at sf0.1:
    //   - both edge directions are derived in ONE pass (explode of the
    //     forward+reverse structs) — a union of two selects reads the
    //     lineage twice;
    //   - the materialization is a parquet WRITE, not an RDD checkpoint:
    //     a write is an *action*, so the full AQE plan (runtime broadcast
    //     conversions, partition coalescing) executes the LSH lineage,
    //     whereas the checkpoint path compiles via `.rdd` and forfeits
    //     those (7.5s vs ~4.6s for the same lineage). Reading the files
    //     back also hands the planner real size stats, so the tiny edge
    //     relation is broadcast in the iteration joins without hints. On a
    //     cluster this is a reliable checkpoint to the shared FS
    //     (`checkpointDir`); locally it spills to a temp dir — node-local
    //     either way, hence the cluster-safety guard, and deleted after the
    //     fixpoint (every downstream reference is materialized in pinned
    //     state by then).
    val ss = pairs.sparkSession
    requireClusterSafe(ss.sparkContext.master, checkpointDir)
    val base = checkpointDir.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-clusters-").toString)
    val edgesPath = s"$base/edges.parquet"
    timed("write(edges)")(pairs.select(explode(array(
        struct(col("doc_a").as("src"), col("doc_b").as("dst")),
        struct(col("doc_b").as("src"), col("doc_a").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .write.mode("overwrite").parquet(edgesPath))
    val edges = ss.read.parquet(edgesPath)
    // Cheap: a column-less aggregate over the just-written files.
    val nEdges = edges.count()

    // Iteration state is candidate-graph-sized — a sliver of the corpus
    // (that's what LSH is for). Pinning ~10^2..10^5 rows across the full
    // spark.sql.shuffle.partitions is pure scheduler overhead, multiplied
    // by 2 pins x iterations x bench runs; coalesce every state relation
    // to a count-derived handful of partitions (~500k edges each, so a
    // 100 TB candidate graph still fans out wide) before materializing.
    val nState = math.max(1L, math.min(
      ss.sparkContext.defaultParallelism.toLong, nEdges / 500000L)).toInt
    def pinState(df: DataFrame): DataFrame = pin(df.coalesce(nState))

    var labels = timed("pin(labels0)")(
      pinState(edges.select(col("src").as("doc_id")).distinct()
        .select(col("doc_id"), col("doc_id").as("cluster_id"))))
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val nbrMin = edges
        .join(labels, edges("dst") === labels("doc_id"))
        .groupBy(col("src"))
        .agg(min(col("cluster_id")).as("nbr_min"))
      // checkpointed: referenced by BOTH sides of the shortcut join.
      val propagated = timed(s"pin(prop$iter)")(pinState(labels
        .join(nbrMin, labels("doc_id") === nbrMin("src"), "left")
        .select(labels("doc_id"), col("cluster_id").as("prev_cluster_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))))
      // pointer jumping: follow the label's label — turns O(diameter)
      // convergence into O(log diameter) (long chains otherwise eat the
      // iteration budget). `chg` carries the convergence signal out of
      // the same projection.
      val next = timed(s"pin(next$iter)")(pinState(propagated.as("l")
        .join(propagated.select(col("doc_id").as("rid"), col("cluster_id").as("rcid")).as("r"),
          col("l.cluster_id") === col("r.rid"), "left")
        .select(col("l.doc_id").as("doc_id"),
          coalesce(col("rcid"), col("l.cluster_id")).as("cluster_id"),
          (coalesce(col("rcid"), col("l.cluster_id")) =!= col("l.prev_cluster_id"))
            .as("chg"))))
      // Scan of the blocks `pin` just wrote — no join, no shuffle.
      converged = timed(s"isEmpty$iter")(next.filter(col("chg")).limit(1).isEmpty)
      labels = next.drop("chg")
      iter += 1
    }
    if (!converged)
      org.slf4j.LoggerFactory.getLogger(getClass).warn(
        s"[graft] DedupClusters did not converge in $maxIters iterations; " +
          "cluster ids may be partially propagated — raise maxIters")
    // The labels count drives the broadcast gate below AND confirms the
    // pinned state is fully materialized; it is a scan of the checkpoint
    // blocks `pin` just wrote — no shuffle.
    val nLabels = timed("count(labels)")(labels.count())
    // The edge materialization is fully consumed: every downstream
    // reference lives in pinned (checkpointed) state, so drop the files
    // now — leaving them would leak a full edge-relation copy per
    // invocation (x2 cluster queries x warm-up + n bench runs).
    timed("delete(edges)") {
      val root = new org.apache.hadoop.fs.Path(
        if (checkpointDir.isDefined) edgesPath else base)
      root.getFileSystem(ss.sparkContext.hadoopConfiguration).delete(root, true)
    }
    // singletons (never paired) keep their own id. The checkpointed label
    // relation has no stats for the planner, so hint the broadcast
    // ourselves when the measured label relation is small — and keep the
    // shuffle join when it isn't (a 100 TB corpus can have a huge paired
    // sliver; an unconditional hint would OOM the driver, not the data).
    val labelSide = labels.withColumnRenamed("doc_id", "pdoc")
    val maybeBroadcast =
      if (nLabels <= MaxBroadcastLabels) broadcast(labelSide) else labelSide
    universe.select(col("doc_id"))
      .join(maybeBroadcast, col("doc_id") === col("pdoc"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }
}
