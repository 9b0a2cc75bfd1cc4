package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.relational.Det._

/** The generic relational operator surface (SURVEY.md §2.1-§2.5 closure):
  * scan/filter/project, hash & broadcast & sort-merge joins, semi/anti
  * joins, aggregations (incl. exact count-distinct, rollup, cube), distinct,
  * having, top-k, set ops. All Catalyst built-ins — the value here is the
  * declarative plan shape (pushdown, broadcast, partial aggregation), each
  * hash-checked against DuckDB.
  *
  * Scale notes: filters/projections sit where Catalyst pushes them into the
  * parquet scan; small dimensions (nation, customer at these SFs) are
  * broadcast explicitly; the lineitem⨝orders join keys both large sides on
  * orderkey so AQE picks shuffled-hash/SMJ at real scale. Double sums go
  * through Det.dsum (exact decimal) so results are order-independent — which
  * is also what you want on a 1000-executor cluster, where partial-agg
  * ordering is nondeterministic.
  */
object RelationalQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // S1/P-family: scan + filter + project, pushdown-friendly.
    "q_filter_project" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 40 && col("l_discount") < 0.05)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"),
          round(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("net_price"))),

    // A-family: TPC-H Q1-shaped wide aggregation (partial agg = stripes).
    "q1_agg" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 4).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("sum_disc_price"),
          davg(col("l_quantity"), 2).as("avg_qty"),
          davg(col("l_discount"), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))),

    // J2-family: 3-way join (broadcast dims, co-keyed fact join) + agg.
    "q_join_3way" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val ord = t(s, d, "orders")
      val li = t(s, d, "lineitem")
      val nat = t(s, d, "nation")
      // nation (25 rows, constant at any SF) carries an explicit broadcast
      // hint; customer does NOT — it scales with the corpus, so the
      // replicated join must stay the planner's size-based choice (it
      // broadcasts at bench SF, degrades to shuffle at 100 TB; an explicit
      // hint would force the OOM — BroadcastAuditSpec pins this).
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount")), 4).as("revenue"),
          count(lit(1)).as("n_items"))
    }),

    // Broadcast equi-join + agg by dimension attribute. The build side is
    // the planner's size-based pick (BroadcastHashJoin at bench SF —
    // PlanSpec-visible — falling back to shuffle when customer outgrows
    // the threshold); an explicit hint here would force a 100 TB OOM,
    // which BroadcastAuditSpec bans.
    "q_join_broadcast" -> ((s, d) => {
      val ord = t(s, d, "orders")
      val cust = t(s, d, "customer")
      ord.join(cust, ord("o_custkey") === cust("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice"), 4).as("total"))
    }),

    // J1: left-semi — customers having at least one high-value order.
    "q_semi_join" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val big = t(s, d, "orders").filter(col("o_totalprice") > 200000)
      cust.join(big, cust("c_custkey") === big("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
    }),

    // J3: left-anti — customers with no high-value order (every customer has
    // SOME order in the testdata, so anti-join against the unfiltered table
    // would be vacuously empty).
    "q_anti_join" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val big = t(s, d, "orders").filter(col("o_totalprice") > 300000)
      cust.join(big, cust("c_custkey") === big("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Left outer: every customer with their high-value-order count; the
    // missing side surfaces as NULL -> coalesced to 0.
    "q_join_left_outer" -> ((s, d) => {
      val cust = t(s, d, "customer")
      val big = t(s, d, "orders").filter(col("o_totalprice") > 200000)
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("nb"), dsum(col("o_totalprice"), 4).as("tb"))
      cust.join(big, cust("c_custkey") === big("o_custkey"), "left_outer")
        .select(col("c_custkey"),
          coalesce(col("nb"), lit(0L)).as("n_big"),
          coalesce(col("tb"), lit(0.0)).as("total_big"))
    }),

    // Full outer: per-nation counts of rich customers vs rich suppliers —
    // the filters create nations present on only one side, so both NULL
    // directions are exercised.
    "q_join_full_outer" -> ((s, d) => {
      val ch = t(s, d, "customer").filter(col("c_acctbal") > 9000)
        .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
      val sh = t(s, d, "supplier").filter(col("s_acctbal") > 9000)
        .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
      ch.join(sh, ch("c_nationkey") === sh("s_nationkey"), "full_outer")
        .select(
          coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
          coalesce(col("n_cust"), lit(0L)).as("n_cust"),
          coalesce(col("n_supp"), lit(0L)).as("n_supp"))
    }),

    // A3: exact count-distinct per key (the DocumentFreq pattern on TPC-H).
    "q_count_distinct" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_orderkey")).as("n_orders"),
          countDistinct(col("l_partkey")).as("n_parts"))),

    // Grouping sets: rollup.
    "q_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity"), 2).as("sum_qty"),
          count(lit(1)).as("n"))),

    // Grouping sets: cube.
    "q_cube" -> ((s, d) =>
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice"), 4).as("total"))),

    // HAVING (post-aggregation filter).
    "q_having" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice"), 4).as("spend"))
        .filter(col("n_orders") >= 10)),

    // DISTINCT projection.
    "q_distinct" -> ((s, d) =>
      t(s, d, "orders").select(col("o_orderstatus"), col("o_orderpriority")).distinct()),

    // T1-family: global top-k with deterministic tiebreak
    // (TakeOrderedAndProject, not a global sort).
    "q_topk_global" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .limit(50)),

    // Set operations over compatible projections.
    "q_set_ops" -> ((s, d) => {
      val bal = t(s, d, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_nationkey").as("nationkey"))
      val sup = t(s, d, "supplier").filter(col("s_acctbal") > 5000)
        .select(col("s_nationkey").as("nationkey"))
      bal.intersect(sup)
    }),

    // Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL): multiplicities
    // matter — a nation with 40 high-balance customers and 3 high-balance
    // suppliers keeps 3 intersect-all rows and 37 except-all rows, which
    // the distinct variants above collapse. Spark plans both as an
    // aggregate + join on (value, replicated min-count) — no sort-based
    // set op; the grouped output keeps the compare stable at any SF.
    "q_set_ops_all" -> ((s, d) => {
      val bal = t(s, d, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_nationkey").as("nationkey"))
      val sup = t(s, d, "supplier").filter(col("s_acctbal") > 5000)
        .select(col("s_nationkey").as("nationkey"))
      bal.intersectAll(sup).groupBy(col("nationkey"))
        .agg(count(lit(1)).as("n"))
        .select(lit("intersect_all").as("op"), col("nationkey"), col("n"))
        .unionByName(
          bal.exceptAll(sup).groupBy(col("nationkey"))
            .agg(count(lit(1)).as("n"))
            .select(lit("except_all").as("op"), col("nationkey"), col("n")))
    }),

    // EXCEPT (distinct set difference) over the same projections: nations
    // with high-balance customers but no high-balance supplier. Spark
    // plans both set ops as aggregate + left-anti/semi join — the
    // scale-correct shape (no sort-based set op).
    "q_except" -> ((s, d) => {
      val bal = t(s, d, "customer").filter(col("c_acctbal") > 5000)
        .select(col("c_nationkey").as("nationkey"))
      val sup = t(s, d, "supplier").filter(col("s_acctbal") > 5000)
        .select(col("s_nationkey").as("nationkey"))
      bal.except(sup)
    }),

    // UNION ALL + aggregation over the union.
    "q_union_all" -> ((s, d) => {
      val c = t(s, d, "customer").select(col("c_nationkey").as("nationkey"))
      val sp = t(s, d, "supplier").select(col("s_nationkey").as("nationkey"))
      c.union(sp).groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
    }),

    // Conditional aggregation (CASE WHEN inside agg).
    "q_case_agg" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(
          sum(when(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("n_finished"),
          sum(when(col("o_orderstatus") === "O", 1L).otherwise(0L)).as("n_open"),
          count(lit(1)).as("n"))),

    // Statistical aggregates (deterministic stddev via exact sums).
    "q_stats_agg" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_linestatus"))
        .agg(
          min(col("l_extendedprice")).as("min_price"),
          max(col("l_extendedprice")).as("max_price"),
          davg(col("l_extendedprice"), 4).as("avg_price"),
          dstddev(col("l_extendedprice")).as("sd_price"))),

    // Approximate query processing: a DETERMINISTIC 1/64 uniform sample
    // (md5-bucket of the row key — reproducible, never rand(), the same
    // discipline as every sampler here) scaled up against the exact
    // answer, with the achieved relative error in the output. This is
    // the accuracy-for-cost dial of interactive OLAP made auditable: at
    // 100 TB the estimate path scans the same data but aggregates 1/64
    // of it after a narrow codegen'd filter (with a materialized sample
    // table, 1/64 of the scan too); the hash gate pins both the sampling
    // function and the scale-up arithmetic cross-engine. Per-group
    // variant below shows the error profile across group sizes.
    "q_aqp_sum" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val inSample = aqpBucket(col("l_orderkey"), col("l_linenumber"))
      val agg = li.agg(
        dsum(col("l_extendedprice"), 4).as("exact_sum"),
        count(lit(1)).as("exact_n"),
        (sum(when(inSample, col("l_extendedprice").cast(org.apache.spark.sql.types.DecimalType(18, 4)))) * AqpScale)
          .cast("double").as("est_sum"),
        (sum(when(inSample, 1L).otherwise(0L)) * AqpScale).as("est_n"))
      agg.select(col("exact_sum"), col("exact_n"), col("est_sum"), col("est_n"),
        round(abs(col("est_sum") - col("exact_sum")) / col("exact_sum"), 6)
          .as("rel_err"))
    }),

    "q_aqp_groupby" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val inSample = aqpBucket(col("l_orderkey"), col("l_linenumber"))
      li.groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("exact_n"),
          (sum(when(inSample, 1L).otherwise(0L)) * AqpScale).as("est_n"))
        .select(col("l_returnflag"), col("exact_n"), col("est_n"),
          round(abs(col("est_n") - col("exact_n")).cast("double") /
            col("exact_n"), 6).as("rel_err"))
    }),

    // The AQP estimate WITH its error bar — what turns q_aqp_sum's
    // after-the-fact rel_err into a usable contract: the Horvitz-
    // Thompson 95% CI for Bernoulli(1/64) sampling, V̂ = Σ_sample x²
    // (1-p)/p², half-width 1.96·sqrt(V̂). The sample's Σx² runs as exact
    // integer cents² through DECIMAL (order-independent), doubles only
    // in the final sqrt; `covered` reports whether the exact answer
    // (computed in the same single scan) fell inside the bar. One scan,
    // conditional aggregates, no second pass.
    "q_aqp_ci" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val inSample = aqpBucket(col("l_orderkey"), col("l_linenumber"))
      val c = (col("l_extendedprice").cast(
        org.apache.spark.sql.types.DecimalType(12, 2)) * 100).cast("long")
      val agg = li.agg(
        dsum(col("l_extendedprice"), 4).as("exact_sum"),
        (sum(when(inSample, col("l_extendedprice")
          .cast(org.apache.spark.sql.types.DecimalType(18, 4)))) * AqpScale)
          .cast("double").as("est_sum"),
        sum(when(inSample, (c * c).cast(
          org.apache.spark.sql.types.DecimalType(24, 0)))
          .otherwise(lit(BigDecimal(0))
            .cast(org.apache.spark.sql.types.DecimalType(24, 0))))
          .cast(org.apache.spark.sql.types.DecimalType(38, 0)).as("sq"))
      // (1-p)/p² with p = 1/64 is exactly 63·64 = 4032; cents² -> $² is
      // the /10000.
      val ci = lit(1.96) * sqrt(lit(4032.0) *
        (col("sq").cast("double") / lit(10000.0)))
      agg.select(col("exact_sum"), col("est_sum"),
        round(ci, 2).as("ci_half"),
        (abs(col("est_sum") - col("exact_sum")) <= ci).as("covered"))
    }),

    // Stratified AQP estimator: the same 1/64 deterministic sample, but
    // the total-revenue estimate is assembled per l_returnflag stratum
    // (N_g · sample-mean_g) — the textbook variance-reduction move when
    // strata differ in level, and the reason real AQP engines keep
    // group-by stats. Per-stratum sample moments are exact cents
    // DECIMALs from ONE scan; each stratum's variance term
    // N_g²·v_g/n_g is a 6dp-pinned double summed in DECIMAL, so the
    // combined standard error is partition-order-proof. Output: one row
    // per stratum (exact vs estimate) with the combined stratified SE
    // attached — compare it against q_aqp_ci's unstratified SE on the
    // identical sample.
    "q_aqp_stratified" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val li = t(s, d, "lineitem")
      val inSample = aqpBucket(col("l_orderkey"), col("l_linenumber"))
      val c = (col("l_extendedprice").cast(DecimalType(12, 2)) * 100)
        .cast("long")
      val g = li.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("ng_all"),
          dsum(col("l_extendedprice"), 4).as("exact_sum"),
          sum(when(inSample, 1L).otherwise(0L)).as("n_s"),
          sum(when(inSample, c).otherwise(0L)).as("s_c"),
          sum(when(inSample, (c * c).cast(DecimalType(24, 0)))
            .otherwise(lit(BigDecimal(0)).cast(DecimalType(24, 0))))
            .cast(DecimalType(38, 0)).as("q_c"))
        .filter(col("n_s") >= 2)
        .transform(graft.CacheScope.persisted(_))
      val nsd = col("n_s").cast("double")
      val est = col("ng_all").cast("double") *
        (col("s_c").cast("double") / nsd) / 100.0
      val vg = (nsd * col("q_c").cast("double") -
        col("s_c").cast("double") * col("s_c").cast("double")) /
        (nsd * (nsd - 1))
      val gg = g.select(col("l_returnflag"), col("ng_all"), col("exact_sum"),
        col("n_s"), round(est, 2).as("est_sum"),
        round(col("ng_all").cast("double") * col("ng_all").cast("double") *
          vg / nsd / 10000.0, 6).cast(DecimalType(28, 6)).as("vterm"))
      val se = gg.agg(sum(col("vterm")).as("vsum"))
        .select(round(sqrt(col("vsum").cast("double")), 2).as("se_strat"))
      gg.crossJoin(broadcast(se))
        .select(col("l_returnflag"), col("ng_all").as("n_exact"),
          col("n_s").as("n_sample"), col("exact_sum"), col("est_sum"),
          round(abs(col("est_sum") - col("exact_sum").cast("double")) /
            col("exact_sum").cast("double"), 6).as("rel_err"),
          col("se_strat"))
    })
  )

  /** AQP sample: 4 of 256 first-md5-byte values = a 1/64 deterministic
    * uniform bucket over the (orderkey, linenumber) row identity.
    */
  private val AqpScale = 64L
  private def aqpBucket(ok: org.apache.spark.sql.Column,
      ln: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    // lexicographic compare of the first hex byte — '00'..'03' are
    // exactly bytes 0-3, and string ordering is engine-identical (the
    // SQL twin uses the same substr < '04')
    substring(md5(concat(ok.cast("string"), lit("_"), ln.cast("string"))),
      1, 2) < "04"

  /** SQL twin of [[aqpBucket]]. */
  private val aqpBucketSql: String =
    "substr(md5(CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)), 1, 2) < '04'"

  override val oracles: Map[String, String] = Map(
    "q_aqp_sum" ->
      s"""SELECT ${dsumSql("l_extendedprice", 4)} AS exact_sum,
         |       count(*) AS exact_n,
         |       CAST(sum(CASE WHEN $aqpBucketSql
         |                     THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) * $AqpScale
         |            AS DOUBLE) AS est_sum,
         |       CAST(sum(CASE WHEN $aqpBucketSql THEN 1 ELSE 0 END) * $AqpScale
         |            AS BIGINT) AS est_n,
         |       round(abs(est_sum - exact_sum) / exact_sum, 6) AS rel_err
         |FROM lineitem""".stripMargin,

    "q_aqp_ci" ->
      s"""SELECT ${dsumSql("l_extendedprice", 4)} AS exact_sum,
         |       CAST(sum(CASE WHEN $aqpBucketSql
         |                     THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) * $AqpScale
         |            AS DOUBLE) AS est_sum,
         |       round(1.96 * sqrt(4032.0 *
         |             (CAST(CAST(sum(CASE WHEN $aqpBucketSql
         |                       THEN CAST(c * c AS DECIMAL(24,0))
         |                       ELSE CAST(0 AS DECIMAL(24,0)) END) AS DECIMAL(38,0)) AS DOUBLE) / 10000.0)), 2) AS ci_half,
         |       abs(CAST(sum(CASE WHEN $aqpBucketSql
         |                     THEN CAST(l_extendedprice AS DECIMAL(18,4)) END) * $AqpScale
         |            AS DOUBLE) - ${dsumSql("l_extendedprice", 4)}) <=
         |       1.96 * sqrt(4032.0 *
         |             (CAST(CAST(sum(CASE WHEN $aqpBucketSql
         |                       THEN CAST(c * c AS DECIMAL(24,0))
         |                       ELSE CAST(0 AS DECIMAL(24,0)) END) AS DECIMAL(38,0)) AS DOUBLE) / 10000.0)) AS covered
         |FROM (SELECT l_orderkey, l_linenumber, l_extendedprice,
         |             CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
         |      FROM lineitem)""".stripMargin,

    "q_aqp_stratified" ->
      s"""WITH base AS (
         |  SELECT l_returnflag, l_extendedprice,
         |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c,
         |         $aqpBucketSql AS in_s
         |  FROM lineitem
         |), g AS (
         |  SELECT l_returnflag, count(*) AS ng_all,
         |         ${dsumSql("l_extendedprice", 4)} AS exact_sum,
         |         CAST(sum(CASE WHEN in_s THEN 1 ELSE 0 END) AS BIGINT) AS n_s,
         |         CAST(sum(CASE WHEN in_s THEN c ELSE 0 END) AS BIGINT) AS s_c,
         |         sum(CASE WHEN in_s THEN CAST(c AS DECIMAL(24,0)) *
         |                                 CAST(c AS DECIMAL(24,0))
         |             ELSE CAST(0 AS DECIMAL(24,0)) END) AS q_c
         |  FROM base GROUP BY 1 HAVING n_s >= 2
         |), gg AS (
         |  SELECT l_returnflag, ng_all, exact_sum, n_s,
         |         round(CAST(ng_all AS DOUBLE) *
         |               (CAST(s_c AS DOUBLE) / CAST(n_s AS DOUBLE)) / 100.0, 2)
         |           AS est_sum,
         |         CAST(round(CAST(ng_all AS DOUBLE) * CAST(ng_all AS DOUBLE) *
         |                ((CAST(n_s AS DOUBLE) * CAST(q_c AS DOUBLE) -
         |                  CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE)) /
         |                 (CAST(n_s AS DOUBLE) * (CAST(n_s AS DOUBLE) - 1))) /
         |                CAST(n_s AS DOUBLE) / 10000.0, 6) AS DECIMAL(28,6))
         |           AS vterm
         |  FROM g
         |), se AS (
         |  SELECT round(sqrt(CAST(sum(vterm) AS DOUBLE)), 2) AS se_strat FROM gg
         |)
         |SELECT gg.l_returnflag, gg.ng_all AS n_exact, gg.n_s AS n_sample,
         |       gg.exact_sum, gg.est_sum,
         |       round(abs(gg.est_sum - gg.exact_sum) / gg.exact_sum, 6)
         |         AS rel_err,
         |       se.se_strat
         |FROM gg CROSS JOIN se""".stripMargin,

    "q_aqp_groupby" ->
      s"""SELECT l_returnflag,
         |       count(*) AS exact_n,
         |       CAST(sum(CASE WHEN $aqpBucketSql THEN 1 ELSE 0 END) * $AqpScale
         |            AS BIGINT) AS est_n,
         |       round(CAST(abs(est_n - exact_n) AS DOUBLE) / exact_n, 6) AS rel_err
         |FROM lineitem
         |GROUP BY l_returnflag""".stripMargin,

    "q_filter_project" ->
      """SELECT l_orderkey, l_partkey, l_quantity,
        |       round(l_extendedprice * (1 - l_discount), 4) AS net_price
        |FROM lineitem WHERE l_quantity > 40 AND l_discount < 0.05""".stripMargin,

    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       ${dsumSql("l_quantity", 2)} AS sum_qty,
         |       ${dsumSql("l_extendedprice", 4)} AS sum_base_price,
         |       ${dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS sum_disc_price,
         |       ${davgSql("l_quantity", 2)} AS avg_qty,
         |       ${davgSql("l_discount", 4)} AS avg_disc,
         |       count(*) AS count_order
         |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
         |GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_3way" ->
      s"""SELECT n_name,
         |       ${dsumSql("l_extendedprice * (1 - l_discount)", 4)} AS revenue,
         |       count(*) AS n_items
         |FROM lineitem
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |GROUP BY n_name""".stripMargin,

    "q_join_broadcast" ->
      s"""SELECT c_mktsegment, count(*) AS n_orders,
         |       ${dsumSql("o_totalprice", 4)} AS total
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |GROUP BY c_mktsegment""".stripMargin,

    "q_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 200000)""".stripMargin,

    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)""".stripMargin,

    "q_join_left_outer" ->
      s"""WITH big AS (
         |  SELECT o_custkey, count(*) AS nb, ${dsumSql("o_totalprice", 4)} AS tb
         |  FROM orders WHERE o_totalprice > 200000 GROUP BY o_custkey
         |)
         |SELECT c_custkey,
         |       COALESCE(nb, 0) AS n_big,
         |       COALESCE(tb, 0.0) AS total_big
         |FROM customer LEFT OUTER JOIN big ON c_custkey = o_custkey""".stripMargin,

    "q_join_full_outer" ->
      """WITH ch AS (
        |  SELECT c_nationkey, count(*) AS n_cust FROM customer
        |  WHERE c_acctbal > 9000 GROUP BY c_nationkey
        |), sh AS (
        |  SELECT s_nationkey, count(*) AS n_supp FROM supplier
        |  WHERE s_acctbal > 9000 GROUP BY s_nationkey
        |)
        |SELECT COALESCE(c_nationkey, s_nationkey) AS nationkey,
        |       COALESCE(n_cust, 0) AS n_cust,
        |       COALESCE(n_supp, 0) AS n_supp
        |FROM ch FULL OUTER JOIN sh ON c_nationkey = s_nationkey""".stripMargin,

    "q_count_distinct" ->
      """SELECT l_returnflag,
        |       count(DISTINCT l_orderkey) AS n_orders,
        |       count(DISTINCT l_partkey) AS n_parts
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
         |       ${dsumSql("l_quantity", 2)} AS sum_qty, count(*) AS n
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         |       ${dsumSql("o_totalprice", 4)} AS total
         |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,

    "q_having" ->
      s"""SELECT o_custkey, count(*) AS n_orders,
         |       ${dsumSql("o_totalprice", 4)} AS spend
         |FROM orders GROUP BY o_custkey HAVING count(*) >= 10""".stripMargin,

    "q_distinct" ->
      "SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",

    "q_topk_global" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 50""".stripMargin,

    "q_set_ops" ->
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
        |INTERSECT
        |SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000""".stripMargin,

    "q_set_ops_all" ->
      """SELECT 'intersect_all' AS op, nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
        |  INTERSECT ALL
        |  SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
        |) GROUP BY 2
        |UNION ALL
        |SELECT 'except_all' AS op, nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
        |  EXCEPT ALL
        |  SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000
        |) GROUP BY 2""".stripMargin,

    "q_except" ->
      """SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
        |EXCEPT
        |SELECT s_nationkey AS nationkey FROM supplier WHERE s_acctbal > 5000""".stripMargin,

    "q_union_all" ->
      """SELECT nationkey, count(*) AS n FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION ALL
        |  SELECT s_nationkey AS nationkey FROM supplier
        |) GROUP BY nationkey""".stripMargin,

    "q_case_agg" ->
      """SELECT o_orderpriority,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_open,
        |       count(*) AS n
        |FROM orders GROUP BY o_orderpriority""".stripMargin,

    "q_stats_agg" ->
      s"""SELECT l_linestatus,
         |       min(l_extendedprice) AS min_price,
         |       max(l_extendedprice) AS max_price,
         |       ${davgSql("l_extendedprice", 4)} AS avg_price,
         |       ${dstddevSql("l_extendedprice")} AS sd_price
         |FROM lineitem GROUP BY l_linestatus""".stripMargin
  )
}
