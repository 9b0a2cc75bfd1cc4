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

  /** pairs(doc_a, doc_b) + universe(doc_id) -> (doc_id, cluster_id). */
  def clusters(pairs: DataFrame, universe: DataFrame, maxIters: Int = 15): DataFrame = {
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)

    var labels = universe.select(col("doc_id"), col("doc_id").as("cluster_id"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      val nbrMin = edges
        .join(labels, edges("dst") === labels("doc_id"))
        .groupBy(col("src"))
        .agg(min(col("cluster_id")).as("nbr_min"))
      val next = labels
        .join(nbrMin, labels("doc_id") === nbrMin("src"), "left")
        .select(labels("doc_id"),
          least(col("cluster_id"), coalesce(col("nbr_min"), col("cluster_id")))
            .as("cluster_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val changed = labels.as("o")
        .join(next.as("n"), col("o.doc_id") === col("n.doc_id"))
        .filter(col("o.cluster_id") =!= col("n.cluster_id"))
        .limit(1).count() // any change at all? (limit(1) stops early)
      labels.unpersist()
      labels = next
      converged = changed == 0
      iter += 1
    }
    labels
  }
}
