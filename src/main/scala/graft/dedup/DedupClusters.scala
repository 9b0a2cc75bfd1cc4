package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

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

  /** pairs(doc_a, doc_b) + universe(doc_id) -> (doc_id, cluster_id).
    *
    * Only documents that appear in some candidate pair enter the
    * iteration: everything else is a singleton cluster by definition, and
    * joins back in at the end. At 100 TB the paired set is a sliver of
    * the corpus (that's what LSH is for), so the fixpoint loop runs over
    * the candidate graph, never the full table.
    */
  def clusters(pairs: DataFrame, universe: DataFrame, maxIters: Int = 15): DataFrame = {
    // Iterative-algorithm storage discipline: localCheckpoint (eager), NOT
    // persist/unpersist pairs. Unpersisting an upstream cache invalidates
    // dependent InMemoryRelations and re-registers them on the RAW plan,
    // so later iterations silently recompute the entire candidate-pair
    // lineage (measured: 30-140s per iteration instead of ~1s). Eager
    // localCheckpoint materializes AND truncates lineage, so each
    // iteration starts from stored blocks whatever happens upstream.
    // pairs is usually an expensive LSH pipeline and the symmetric union
    // below reads it twice — checkpoint it once first.
    val p = pairs.localCheckpoint(true)
    val edges = p.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(p.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true)

    var labels = edges.select(col("src").as("doc_id")).distinct()
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val nbrMin = edges
        .join(labels, edges("dst") === labels("doc_id"))
        .groupBy(col("src"))
        .agg(min(col("cluster_id")).as("nbr_min"))
      // checkpointed: referenced by BOTH sides of the shortcut join.
      val propagated = labels
        .join(nbrMin, labels("doc_id") === nbrMin("src"), "left")
        .select(labels("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
        .localCheckpoint(true)
      // pointer jumping: follow the label's label — turns O(diameter)
      // convergence into O(log diameter) (long chains otherwise eat the
      // iteration budget)
      val next = propagated.as("l")
        .join(propagated.select(col("doc_id").as("rid"), col("cluster_id").as("rcid")).as("r"),
          col("l.cluster_id") === col("r.rid"), "left")
        .select(col("l.doc_id").as("doc_id"),
          coalesce(col("rcid"), col("l.cluster_id")).as("cluster_id"))
        .localCheckpoint(true)
      val changed = labels.as("o")
        .join(next.as("n"), col("o.doc_id") === col("n.doc_id"))
        .filter(col("o.cluster_id") =!= col("n.cluster_id"))
        .count()
      labels = next
      converged = changed == 0
      iter += 1
    }
    // singletons (never paired) keep their own id
    universe.select(col("doc_id"))
      .join(labels.withColumnRenamed("doc_id", "pdoc"),
        col("doc_id") === col("pdoc"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cluster_id"))
  }
}
