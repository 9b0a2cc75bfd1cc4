package graft.graph

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Opt-in precondition checks for the graph fixpoints whose r13 cold-path
  * cut made symmetry LOAD-BEARING (ADVICE r14): [[GraphPathQueries.katzOf]]
  * and [[GraphQueries.lpaOf]] dropped the per-round "left join nodes +
  * coalesce" re-attach, so on a non-symmetric edge relation a
  * zero-in-degree node silently vanishes from the output — wrong results
  * with no signal. The check makes a future non-symmetric caller fail
  * loudly instead.
  *
  * Debug-mode, not production-path: the verification is a corpus-sized
  * set-difference job, which does not belong in front of every fixpoint
  * at 100 TB (every REGISTERED caller passes relations symmetric by
  * construction — asserted green under this check by EdgeSymmetrySpec).
  * Enabled per-thread via [[withChecks]] (specs), or process-wide with
  * -Dgraft.debug.checks=1 for ad-hoc debugging of a new caller.
  */
object EdgeChecks {

  private val on = ThreadLocal.withInitial[java.lang.Boolean](() =>
    sys.props.get("graft.debug.checks").exists(_.nonEmpty))

  def enabled: Boolean = on.get

  /** Run `body` with the checks enabled on THIS thread (restores the
    * previous state after; thread-local so parallel suites sharing the
    * session never pay for another suite's debugging).
    */
  def withChecks[T](body: => T): T = {
    val prev = on.get
    on.set(true)
    try body finally on.set(prev)
  }

  /** Fail loudly unless every (src, dst) has its (dst, src) twin. limit(1)
    * stops the verification scan at the first counterexample.
    */
  def requireSymmetric(edges: DataFrame, op: String): Unit = if (enabled) {
    val missing = edges.select(col("src"), col("dst"))
      .except(edges.select(col("dst").as("src"), col("src").as("dst")))
      .limit(1).count()
    require(missing == 0L,
      s"$op: edge relation is not symmetric — the fixpoint would silently " +
        "drop zero-in-degree nodes (precondition, ADVICE r13/r14)")
  }
}
