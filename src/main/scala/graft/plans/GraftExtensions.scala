package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

import graft.functions.StemExpr

/** Catalyst optimizer rule: Porter stemming is IDEMPOTENT
  * (stem(stem(x)) = stem(x) — the stemmer's output is always a fixpoint
  * of itself), so nested [[StemExpr]]s collapse to one. Composed
  * cleaning pipelines hit this for real: a stage that stems defensively
  * over the output of a stage that already stemmed pays the (expensive,
  * per-token) stemmer twice per row unless the plan collapses it —
  * exactly the class of rewrite Catalyst can do and a black-box UDF
  * could never express. The whole chain is stripped in one pass, so a
  * single application suffices regardless of nesting depth.
  */
object CollapseIdempotentStem extends Rule[LogicalPlan] {

  private def strip(e: Expression): Expression = e match {
    case StemExpr(c) => strip(c)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case StemExpr(inner @ StemExpr(_)) => StemExpr(strip(inner))
    }
}

/** The library's `SparkSessionExtensions` entry point — production wiring
  * is one config line, no code:
  *
  *   spark.sql.extensions=graft.plans.GraftExtensions
  *
  * Injects [[CollapseIdempotentStem]] into the optimizer and
  * [[AsOfJoinStrategy]] into the planner. (The SQL function surface —
  * porter_stem, dot_q — stays in `GraftFunctions.register`, which works
  * on any session; sessions built with this extension class get the
  * optimizer rewrite and the native as-of operator on top.)
  * ExtensionsSpec drives both wiring paths: a fresh session built
  * through this class, and `experimental.extraOptimizations` /
  * `experimental.extraStrategies` on an existing one.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => CollapseIdempotentStem)
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
  }
}
