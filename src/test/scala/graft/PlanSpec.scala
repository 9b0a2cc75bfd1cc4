package graft

import graft.tfidf.{TfIdf, TfIdfQueries}

/** Physical-plan shape assertions (SURVEY.md §4): the optimizations the
  * reference hand-wired must appear in Catalyst's chosen plan — broadcast
  * joins where the reference used its distributed cache, TakeOrderedAndProject
  * where it used a single reducer, parquet filter/column pushdown where it
  * projected manually, and whole-stage codegen over the scalar chain.
  */
class PlanSpec extends SparkSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("TF-IDF joins broadcast the small side (no token-stream shuffle join)") {
    val p = plan(TfIdf.pipeline(Tables.load(spark, sfDir, "documents")))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    assert(!p.contains("SortMergeJoin"), "token stream must not sort-merge")
  }

  test("tfidf pipeline scans the corpus exactly ONCE (persisted TF relation)") {
    import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(flatten)
    }
    val df = TfIdf.pipeline(Tables.load(spark, sfDir, "documents"))
    val nodes = flatten(df.queryExecution.executedPlan)
    val direct = nodes.collect { case f: FileSourceScanExec => f }
    assert(direct.isEmpty,
      s"every corpus read must go through the persisted TF_all; found ${direct.size} direct scans")
    val caches = nodes.collect { case c: InMemoryTableScanExec => c }
    assert(caches.size >= 2,
      "both the top-k branch and the TF branch must read the persisted TF_all")
    val cachedPlans = caches.map(_.relation.cacheBuilder.cachedPlan).distinct
    assert(cachedPlans.size == 1, "all cache reads must share ONE cached relation")
    val innerScans = flatten(cachedPlans.head).collect { case f: FileSourceScanExec => f }
    assert(innerScans.size == 1,
      s"the cached TF_all plan must contain exactly one documents scan, got ${innerScans.size}")
  }

  test("top-100 plans as TakeOrderedAndProject, not a global sort") {
    val df = TfIdf.topTerms(
      TfIdf.documentFrequency(
        TfIdf.terms(Tables.load(spark, sfDir, "documents"))), 100)
    assert(plan(df).contains("TakeOrderedAndProject"))
  }

  test("filter/column pushdown reaches the parquet scan") {
    val df = relational.RelationalQueries.queries("q_filter_project")(spark, sfDir)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: ["), scan.take(1500))
    assert(scan.contains("GreaterThan(l_quantity") || scan.contains("l_quantity"),
      "quantity filter should be pushed")
    // only the 5 needed columns are read
    assert(!scan.contains("l_shipdate"), "unneeded columns must be pruned")
  }

  test("scalar pipeline stays inside whole-stage codegen (stem included)") {
    val df = TfIdf.terms(Tables.load(spark, sfDir, "documents"))
    val p = plan(df)
    // codegen'd spans print with the `*(n)` star prefix in executedPlan
    assert(p.contains("*("), p.take(1500))
    assert(p.contains("porter_stem"), "stem expression should be in the plan")
    // the stem projection itself must be inside a codegen'd span
    assert(p.linesIterator.exists(l => l.contains("porter_stem") && l.contains("*(")),
      "stem must not fall out of whole-stage codegen")
  }

  test("partition pruning: filter on the partition column prunes the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.load(spark, sfDir, "events")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val df = spark.read.parquet(dir).filter(org.apache.spark.sql.functions.col("event_type") === "click")
    val p = df.queryExecution.executedPlan.toString
    // the filter must appear as a PartitionFilter (pruned at planning, not
    // evaluated per row); inputFiles is pre-pruning metadata so the plan
    // string is the proof
    assert("PartitionFilters: \\[.*event_type#\\d+ = click".r
      .findFirstIn(p).isDefined, p.take(1200))
    assert(df.count() ==
      Tables.load(spark, sfDir, "events")
        .filter(org.apache.spark.sql.functions.col("event_type") === "click").count())
  }

  test("join strategy hints are honored (merge / shuffle_hash / broadcast)") {
    import org.apache.spark.sql.functions._
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_totalprice"))
    def planOf(hint: String) =
      plan(li.join(o.hint(hint), col("l_orderkey") === col("o_orderkey")))
    // The per-join escape hatches when AQE's choice isn't the right one
    // at cluster scale (a user of the library must be able to pin these).
    assert(planOf("merge").contains("SortMergeJoin"), "merge hint ignored")
    assert(planOf("shuffle_hash").contains("ShuffledHashJoin"),
      "shuffle_hash hint ignored")
    assert(planOf("broadcast").contains("BroadcastHashJoin"),
      "broadcast hint ignored")
  }

  test("ORC roundtrip preserves data and pushes filters to the ORC scan") {
    import org.apache.spark.sql.functions._
    // Parquet is the testdata's format; ORC is the other columnar format
    // a complete library must speak (warehouse interop). Same DataFrame
    // API, same pushdown machinery — assert it actually engages.
    val tmp = java.nio.file.Files.createTempDirectory("graft-orc").toString
    val src = Tables.load(spark, sfDir, "orders")
    src.write.mode("overwrite").orc(tmp)
    val back = spark.read.orc(tmp).filter(col("o_totalprice") > 300000)
      .select(col("o_orderkey"), col("o_totalprice"))
    val p = plan(back)
    assert(p.contains("OrcScan") || p.contains("Format: ORC") ||
      p.toLowerCase.contains("orc"), p.take(800))
    assert(p.contains("PushedFilters: [") && p.contains("o_totalprice"),
      "price filter must reach the ORC scan: " + p.take(800))
    val expected = src.filter(col("o_totalprice") > 300000).count()
    assert(back.count() == expected, "ORC roundtrip changed the row count")
  }

  test("aggregations use partial+final HashAggregate (the stripes pattern)") {
    val df = relational.RelationalQueries.queries("q1_agg")(spark, sfDir)
    val p = plan(df)
    assert("HashAggregate".r.findAllIn(p).size >= 2, p.take(1500))
  }
}
