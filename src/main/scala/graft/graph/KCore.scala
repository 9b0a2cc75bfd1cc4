package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling: repeatedly delete every
  * node whose degree in the surviving subgraph is below k; what remains
  * is the (maximal) k-core, and each member's degree within it is its
  * core degree. The community-detection / spam-filtering primitive — in
  * a co-purchase graph the 3-core is the "bundle backbone" that survives
  * when incidental one-off pairings are stripped away.
  *
  * Execution shape: each round is ONE aggregation (degree count over the
  * surviving edge relation) and ONE edge filter (two semi joins against
  * the survivor set, both equi on the node key) — the same
  * join-per-iteration skeleton as [[GraphQueries.pagerankOf]], with a
  * data-dependent round count instead of a fixed one. Peeling removes
  * ALL sub-k nodes in a round, so the round count is bounded by the
  * graph's degeneracy-peeling depth, not its node count; clique-heavy
  * graphs (this one: per-order cliques of <= 7 parts) confirm in a
  * handful of rounds. Nothing but scalar counts ever reaches the driver.
  *
  * Convergence policy is the [[graft.dedup.DedupClusters]] discipline:
  * the loop stops only on a CONFIRMED fixpoint — a round that removes
  * zero nodes — and `maxRounds` is a hard-fail guard (a partially peeled
  * "core" silently includes nodes the real core excludes, which is data
  * corruption for any consumer). `strict = false` is the documented
  * opt-out that downgrades exhaustion to a WARN.
  */
object KCore {

  /** The k-core of a symmetric directed (src, dst) edge relation.
    * Returns (node, core_deg) for every node in the core; empty result if
    * the graph has no k-core. Adversarial worst case for `maxRounds`: a
    * path graph at k = 2 peels only its two endpoints per round — depth
    * O(n/2) — which is why exhaustion must throw rather than return the
    * half-peeled set.
    */
  def kcore(edges: DataFrame, k: Int, maxRounds: Int = 30,
      strict: Boolean = true): DataFrame = {
    val log = org.slf4j.LoggerFactory.getLogger(getClass)
    var e = edges.transform(graft.CacheScope.persisted(_))
    var prev = e.select(col("src")).distinct().count()
    var survivors: DataFrame = null
    var converged = false
    var round = 0
    while (!converged && round < maxRounds) {
      round += 1
      survivors = e.groupBy("src").agg(count(lit(1)).as("core_deg"))
        .filter(col("core_deg") >= k)
        .transform(graft.CacheScope.persisted(_))
      val n = survivors.count()
      if (n == prev) {
        // This round removed nothing: every surviving degree was already
        // computed within the surviving set — a confirmed fixpoint.
        converged = true
      } else {
        prev = n
        val s = survivors.select(col("src").as("node"))
        e = e.join(s, col("src") === col("node"), "left_semi")
          .join(s, col("dst") === col("node"), "left_semi")
          .transform(graft.CacheScope.persisted(_))
      }
      log.info(s"[graft] kcore round $round: $prev nodes alive")
    }
    if (!converged) {
      val msg = s"KCore did not reach a confirmed fixpoint in $maxRounds " +
        "rounds; the surviving set still contains sub-k nodes — raise " +
        "maxRounds (depth is bounded by the peeling depth, not node count) " +
        "or pass strict=false to accept the partial core"
      if (strict) throw new IllegalStateException(msg) else log.warn(msg)
    }
    survivors.select(col("src").as("node"), col("core_deg"))
  }
}
