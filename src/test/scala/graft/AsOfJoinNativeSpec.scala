package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

import graft.plans.{AsOfJoin, AsOfJoinExec}

/** Semantics and planning of the native AS-OF join (custom
  * LogicalPlan/Strategy/SparkPlan): exact matches on planted edge cases,
  * the tie rule (right.time == left.time matches), null padding for
  * unmatched rows, invariance under input partitioning, and the plan
  * actually containing [[AsOfJoinExec]].
  */
class AsOfJoinNativeSpec extends SparkSpec {
  import spark.implicits._

  private def ts(m: Int): Timestamp = new Timestamp(m * 60000L)

  // left: (id, key, t-minutes); right: (key, t-minutes, tag)
  private def run(lparts: Int, rparts: Int): Set[(Long, Long, Option[String])] = {
    val left = Seq((1L, 10L, 5), (2L, 10L, 10), (3L, 10L, 2), (4L, 20L, 7),
      (5L, 30L, 9))
      .toDF("id", "k", "m")
      .select(col("id"), col("k"), expr("timestamp_millis(m * 60000)").as("t"))
      .repartition(lparts)
    val right = Seq((10L, 3, "a"), (10L, 5, "b"), (10L, 8, "c"), (20L, 7, "d"),
      (20L, 8, "e"), (40L, 1, "z"))
      .toDF("rk", "rm", "tag")
      .select(col("rk"), expr("timestamp_millis(rm * 60000)").as("rt"), col("tag"))
      .repartition(rparts)
    val out = AsOfJoin.asof(left, right, "k", "t", "rk", "rt")
      .select(col("id"), col("k"), col("tag"))
    try out.collect()
      .map(r => (r.getLong(0), r.getLong(1), Option(r.getString(2)))).toSet
    finally CacheScope.releaseAll()
  }

  private val expected = Set(
    (1L, 10L, Some("b")), // t=5: rights at 3,5 <= 5 — the tie AT t matches, latest wins
    (2L, 10L, Some("c")), // t=10: all three precede, latest (8) wins
    (3L, 10L, None), //      t=2: earliest right for the key is 3 — nothing precedes
    (4L, 20L, Some("d")), // exact-equal timestamp; the later right (8) must NOT match
    (5L, 30L, None)) //      key with no right rows: null-padded

  test("planted edge cases: latest-at-or-before per key, ties match, unmatched null-pad") {
    assert(run(3, 2) == expected)
  }

  test("result is invariant under input partitioning") {
    val a = run(1, 1)
    val b = run(7, 3)
    assert(a == b)
  }

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case ad: AdaptiveSparkPlanExec => Seq(ad.executedPlan)
      case q: QueryStageExec => Seq(q.plan)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  test("the plan goes through AsOfJoinExec with co-clustered, co-sorted children") {
    val left = Seq((1L, 10L)).toDF("id", "k")
      .select(col("id"), col("k"), expr("timestamp_millis(id)").as("t"))
    val right = Seq((10L, "x")).toDF("rk", "tag")
      .select(col("rk"), expr("timestamp_millis(rk)").as("rt"), col("tag"))
    val df = AsOfJoin.asof(left, right, "k", "t", "rk", "rt")
    df.collect()
    val execs = flatten(df.queryExecution.executedPlan)
      .collect { case e: AsOfJoinExec => e }
    assert(execs.nonEmpty, "plan must contain the native AsOfJoinExec")
    // The merge contract: both children arrive (key, time)-sorted.
    val e = execs.head
    assert(e.left.outputOrdering.map(_.child.toString.takeWhile(_ != '#')) ==
      Seq("k", "t"))
    assert(e.right.outputOrdering.map(_.child.toString.takeWhile(_ != '#')) ==
      Seq("rk", "rt"))
  }

  test("tolerance bounds the lookback: stale rights null out, fresh ones match") {
    val left = Seq((1L, 10L, 10), (2L, 10L, 4), (3L, 20L, 9))
      .toDF("id", "k", "m")
      .select(col("id"), col("k"), expr("timestamp_millis(m * 60000)").as("t"))
    val right = Seq((10L, 3, "a"), (20L, 8, "b"))
      .toDF("rk", "rm", "tag")
      .select(col("rk"), expr("timestamp_millis(rm * 60000)").as("rt"), col("tag"))
    val out = AsOfJoin.asof(left, right, "k", "t", "rk", "rt",
      toleranceUs = Some(2L * 60L * 1000000L)) // 2 minutes
      .select(col("id"), col("tag"))
    val got =
      try out.collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
      finally CacheScope.releaseAll()
    // id=1 (t=10): right at 3 is 7 min stale — null. id=2 (t=4): 1 min — match.
    // id=3 (t=9): right at 8 is 1 min — match.
    assert(got == Map(1L -> None, 2L -> Some("a"), 3L -> Some("b")), s"got $got")
  }

  test("colliding column names and non-long keys are rejected") {
    val l = Seq((1L, ts(1))).toDF("k", "t")
    val r = Seq((1L, ts(1))).toDF("k", "rt")
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, r, "k", "t", "k", "rt")
    }
    val rs = Seq(("x", ts(1))).toDF("rk", "rt")
    intercept[IllegalArgumentException] {
      AsOfJoin.asof(l, rs, "k", "t", "rk", "rt")
    }
  }
}
