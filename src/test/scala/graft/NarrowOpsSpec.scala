package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike

/** Machine-checks the ZERO-SHUFFLE property of the map-only operators:
  * scoring/cleaning/chunking/multimodal passes must stay a single narrow
  * stage — at 100 TB an accidental shuffle in one of these turns a
  * read-transform-write pass into a full-corpus repartition. PlanAuditSpec
  * guards the whole surface against cartesian/global-window; this pins the
  * stronger per-query invariant for the ops that advertise it.
  */
class NarrowOpsSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  /** Every operator documented as "one narrow map (+ explode) pass". */
  private val narrow = Seq(
    "text_langid", "text_quality", "text_tokencount", "text_chunk",
    "text_pii_scrub", "text_sample_mix", "mm_decode", "mm_resize",
    "mm_features", "mm_frame_sample")

  test("map-only operators plan zero shuffle exchanges") {
    narrow.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan
      val shuffles = flatten(plan).collect { case e: ShuffleExchangeLike => e }
      CacheScope.releaseAll()
      assert(shuffles.isEmpty,
        s"$name advertises a narrow plan but shuffles:\n${plan.treeString.take(2000)}")
    }
  }
}
