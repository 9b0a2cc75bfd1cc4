package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.StemExpr
import graft.plans.{CollapseIdempotentStem, GraftExtensions}

/** The SparkSessionExtensions surface: the idempotent-stem collapse must
  * fire through BOTH wiring paths (a session built with the extensions
  * class, and extraOptimizations on an existing session), rewrite the
  * optimized plan to a single stem per chain, and leave results
  * unchanged.
  */
class ExtensionsSpec extends SparkSpec {

  private def stemCount(df: org.apache.spark.sql.DataFrame): Int = {
    var n = 0
    df.queryExecution.optimizedPlan.foreach(_.expressions.foreach(_.foreach {
      case _: StemExpr => n += 1
      case _ => ()
    }))
    n
  }

  private def tripleStem(ss: SparkSession) = {
    // range-derived input: a literal local relation would be folded away
    // by ConvertToLocalRelation (stem evaluated at plan time) and leave
    // no StemExpr to count.
    val w = element_at(
      array(lit("running"), lit("flies"), lit("caresses"), lit("ponies")),
      (col("id") + 1).cast("int"))
    ss.range(4).select(w.as("w"),
      StemExpr.stem(StemExpr.stem(StemExpr.stem(w))).as("s"))
  }

  test("extraOptimizations path: nested stems collapse to one, results unchanged") {
    val ss = spark.newSession()
    ss.experimental.extraOptimizations = Seq(CollapseIdempotentStem)
    val df = tripleStem(ss)
    assert(stemCount(df) == 1, s"expected 1 StemExpr, plan:\n${df.queryExecution.optimizedPlan}")
    val got = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val expected = Map("running" -> "run", "flies" -> "fli",
      "caresses" -> "caress", "ponies" -> "poni")
    assert(got == expected, s"got $got")
    // Control: without the rule, the same query keeps all three stems.
    val plain = tripleStem(spark)
    assert(stemCount(plain) == 3, "control plan should keep the nested stems")
    assert(plain.collect().map(r => r.getString(1)).toSet ==
      expected.values.toSet, "idempotence: values identical either way")
  }

  test("spark.sql.extensions path: a session built with GraftExtensions rewrites too") {
    // Build a REAL second SparkSession over the same SparkContext with the
    // extensions class applied — the exact production wiring
    // (spark.sql.extensions=graft.plans.GraftExtensions), minus the conf
    // line. Active/default sessions are restored afterwards so the shared
    // spec session is untouched.
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val ss = SparkSession.builder()
      .master(spark.sparkContext.master)
      .withExtensions(new GraftExtensions)
      .getOrCreate() // no active/default session -> builds a NEW one over the live context
    try {
      assert(ss ne spark, "must be a fresh session, not the shared one")
      val df = tripleStem(ss)
      assert(stemCount(df) == 1,
        s"extensions-built session must collapse stems, plan:\n${df.queryExecution.optimizedPlan}")
      assert(df.collect().map(_.getString(1)).sorted.toSeq ==
        Seq("caress", "fli", "poni", "run"))
    } finally {
      SparkSession.setActiveSession(spark)
      SparkSession.setDefaultSession(spark)
    }
  }
}
