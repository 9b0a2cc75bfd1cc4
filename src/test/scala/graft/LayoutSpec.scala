package graft

import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.SortMergeJoinExec

/** The layout pack's claims are about PLANS, not just results: bucketing
  * must eliminate the join-side shuffle, and the partitioned layout must
  * prune the scan. The DuckDB oracle can only check the numbers; these
  * asserts check the physics.
  */
class LayoutSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  test("bucketed join plans NO exchange under the sort-merge join") {
    try {
      val plan = SparkEntry.queries("q_join_bucketed")(spark, sfDir)
        .queryExecution.executedPlan
      val nodes = flatten(plan)
      val smjs = nodes.collect { case j: SortMergeJoinExec => j }
      assert(smjs.nonEmpty, "bucketed join must plan a sort-merge join " +
        "(broadcast would prove nothing about bucketing)")
      val shufflesUnderJoin = smjs.flatMap(flatten)
        .collect { case e: ShuffleExchangeExec => e }
      assert(shufflesUnderJoin.isEmpty,
        "bucketed scans must satisfy the join's distribution — found a " +
          s"shuffle under the SMJ:\n$plan")
      // The only exchange in the whole plan is the post-join aggregation.
      val all = nodes.collect { case e: ShuffleExchangeExec => e }
      assert(all.size <= 1, s"expected at most the groupBy exchange:\n$plan")
    } finally CacheScope.releaseAll()
  }

  test("z-order bounds BOTH dimensions' spans; linear leaves one unpruned") {
    try {
      val rows = SparkEntry.queries("q_layout_zorder")(spark, sfDir)
        .collect()
        .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2), r.getDouble(3)))
        .toMap
      val (zn, zp, zs) = rows("zorder")
      val (ln, lp, ls) = rows("linear")
      // Same key space, same bucket width: the comparison is fair only if
      // both layouts produce comparable bucket counts.
      assert(zn > 1 && ln > 1, s"degenerate bucketing: zorder=$zn linear=$ln")
      // Linear (partkey-major) sort: near-perfect partkey spans, but each
      // bucket covers (almost) the FULL suppkey range — zone maps prune
      // nothing for suppkey predicates. Z-order must cut that span by an
      // order of magnitude, paying only a bounded partkey-span price.
      assert(zs < ls / 10.0,
        s"zorder suppkey span $zs not << linear's $ls")
      assert(lp < zp, s"linear must win the partkey dimension: $lp vs $zp")
      assert(zp < 65535.0 / 4,
        s"zorder partkey span $zp should stay a fraction of the full range")
    } finally CacheScope.releaseAll()
  }

  test("date-partitioned layout prunes the scan to the filtered partition") {
    try {
      val df = SparkEntry.queries("q_scan_pruned")(spark, sfDir)
      val scans = flatten(df.queryExecution.executedPlan)
        .collect { case s: FileSourceScanExec => s }
      assert(scans.nonEmpty)
      assert(scans.forall(_.partitionFilters.nonEmpty),
        "the event_date filter must reach the scan as a partition filter " +
          "(directory prune), not a data filter")
      // And the pruned read must still produce the right answer (the
      // oracle checks it too; this keeps the spec self-contained).
      val viaLayout = df.collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val direct = Tables.load(spark, sfDir, "events")
        .filter(org.apache.spark.sql.functions.to_date(
          org.apache.spark.sql.functions.col("ts")) === "2024-01-15")
        .groupBy("event_type").count()
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      assert(viaLayout == direct)
    } finally CacheScope.releaseAll()
  }
}
