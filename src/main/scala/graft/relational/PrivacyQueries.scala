package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}

/** Privacy operators — the audit and release steps a pipeline runs before
  * training data or aggregate statistics leave a trust boundary:
  * k-anonymity / l-diversity audit of quasi-identifier groups, and
  * differentially-private releases (Laplace-noised histogram, noisy
  * top-k) with the [[MiningQueries]] bootstrap's md5-derived uniform
  * draws so the "noise" is engine-reproducible: DP noise must be
  * cryptographically random in production, but the MECHANISM (sensitivity
  * bound, inverse-CDF transform, post-noise ranking) is what this pack
  * oracles — swapping the md5 draw for a secure RNG is a one-line change
  * at the draw site.
  *
  * Scale shape: everything is a bounded group-by (QI-group cells, the
  * 5-cell priority histogram) or a global TakeOrdered(k) on a
  * noisy-count relation — no windows, no sorts beyond top-k, and the
  * per-key noise is a narrow codegen'd hash expression.
  */
object PrivacyQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** k-anonymity threshold (min rows per released QI group). */
  val KAnon = 100

  /** l-diversity threshold (min distinct sensitive values per QI group). */
  val LDiv = 3

  /** DP privacy budget: Laplace scale = sensitivity (1 count) / epsilon. */
  val DpEpsilon = 1.0

  /** t-closeness release threshold on the ordered EMD. */
  val TClose = 0.2

  /** Noisy top-k size. */
  val DpTopK = 10

  /** 24-bit md5 uniform for `key` (the q_stats_bootstrap draw), as a
    * Laplace(1/epsilon) deviate via inverse CDF: u in (0,1) can never hit
    * exactly 0.5 or the endpoints because u = (u24 + 0.5) / 2^24.
    */
  private def laplace(key: Column): Column = {
    val u24 = conv(substring(md5(key), 1, 6), 16, 10).cast("long")
    val u = (u24.cast("double") + 0.5) / 16777216.0
    -lit(1.0 / DpEpsilon) * signum(u - 0.5) *
      log(lit(1.0) - lit(2.0) * abs(u - 0.5))
  }

  private def laplaceSql(key: String): String = {
    val u = s"((('0x' || substring(md5($key), 1, 6))::BIGINT + 0.5) / 16777216.0)"
    s"(-(${1.0 / DpEpsilon}) * sign($u - 0.5) * ln(1.0 - 2.0 * abs($u - 0.5)))"
  }

  /** Standard Gumbel deviate -ln(-ln(u)) on the same md5 uniform. */
  private def gumbel(key: Column): Column = {
    val u24 = conv(substring(md5(key), 1, 6), 16, 10).cast("long")
    val u = (u24.cast("double") + 0.5) / 16777216.0
    -log(-log(u))
  }

  private def gumbelSql(key: String): String = {
    val u = s"((('0x' || substring(md5($key), 1, 6))::BIGINT + 0.5) / 16777216.0)"
    s"(-ln(-ln($u)))"
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // k-anonymity / l-diversity audit: for every quasi-identifier group
    // (market segment x nation) over the customer-joined orders, how many
    // rows share the QI, and how many DISTINCT sensitive values
    // (order priority) do they span? Groups failing either bound are the
    // ones a release would have to suppress or generalize. One size-
    // planned equi-join into one two-key aggregation; the QI-cell
    // relation is domain-bounded (segments x nations), corpus-size-free.
    "q_dp_kanonymity" -> ((s, d) => {
      val j = t(s, d, "orders").select(col("o_custkey"), col("o_orderpriority"))
        // no explicit broadcast: customer scales with the corpus, so the
        // size-based planner must keep the right to shuffle-join at scale
        .join(t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
      j.groupBy(col("c_mktsegment").as("segment"), col("c_nationkey").as("nation"))
        .agg(count(lit(1)).as("n_rows"),
          countDistinct(col("o_orderpriority")).as("l_div"))
        .select(col("segment"), col("nation"), col("n_rows"), col("l_div"),
          (col("n_rows") >= KAnon).cast("int").as("k_ok"),
          (col("l_div") >= LDiv).cast("int").as("l_ok"))
    }),

    // Entropy l-diversity of each (segment, nation) quasi-identifier
    // group — the STRONGER criterion behind q_dp_kanonymity's distinct
    // count (Machanavajjhala et al. 2007): a class with 3 distinct
    // sensitive values 98/1/1 passes distinct-l but leaks; entropy-l =
    // exp(H) weighs the distribution. Per-cell entropy contributions are
    // pinned at 9dp and summed in DECIMAL (partition-order proof); the
    // release flag compares the 4dp-pinned exp on both engines. Scale
    // shape: one orders-sized join+groupBy to the bounded QI x sensitive
    // grid; everything after is domain-bounded agg-to-agg.
    "q_dp_entropy_ldiv" -> ((s, d) => {
      val j = t(s, d, "orders").select(col("o_custkey"), col("o_orderpriority"))
        .join(t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          col("c_nationkey").as("nation"), col("o_orderpriority").as("prio"))
      val cell = j.groupBy("segment", "nation", "prio")
        .agg(count(lit(1)).as("c"))
        .transform(graft.CacheScope.persisted(_))
      val grp = cell.groupBy("segment", "nation")
        .agg(sum(col("c")).as("n_g"), count(lit(1)).as("l_distinct"))
      val p = col("c").cast("double") / col("n_g").cast("double")
      val el = round(exp(col("hh").cast("double")), 4)
      cell.join(broadcast(grp), Seq("segment", "nation"))
        .select(col("segment"), col("nation"), col("n_g"), col("l_distinct"),
          round(-p * log(p), 9).cast(DecimalType(14, 9)).as("h"))
        .groupBy(col("segment"), col("nation"))
        .agg(first(col("n_g")).cast("long").as("n_rows"),
          first(col("l_distinct")).cast("long").as("l_distinct"),
          sum(col("h")).as("hh"))
        .select(col("segment"), col("nation"), col("n_rows"),
          col("l_distinct"), el.as("entropy_l"),
          when(el >= LDiv, 1).otherwise(0).as("el_ok"))
    }),

    // t-closeness of each (segment, nation) quasi-identifier group: the
    // ordered-EMD between the group's order-priority distribution and
    // the global one. With p_j − q_j = (n_gj·N − N_j·n_g)/(n_g·N) the
    // prefix differences have an INTEGER numerator, so
    // EMD = Σ_k |prefix_k| / (n_g·N·(m−1)) is exact integers until one
    // final correctly-rounded division — no per-cell floating ratios to
    // drift. The (group × priority) grid is densified from two bounded
    // domain relations (a broadcast of the 5-row priority marginal), the
    // prefix rides a window PARTITIONED by the group, and everything
    // downstream of the two grouped counts is domain-bounded.
    "q_dp_tcloseness" -> ((s, d) => {
      val j = t(s, d, "orders").select(col("o_custkey"), col("o_orderpriority"))
        .join(t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_mktsegment").as("segment"),
          col("c_nationkey").as("nation"), col("o_orderpriority").as("prio"))
        .transform(graft.CacheScope.persisted(_))
      val cell = j.groupBy("segment", "nation", "prio")
        .agg(count(lit(1)).as("ng_j"))
      val grp = j.groupBy("segment", "nation").agg(count(lit(1)).as("n_g"))
      val glob = j.groupBy("prio").agg(count(lit(1)).as("n_j"))
      val tot = j.agg(count(lit(1)).as("n_tot"),
        countDistinct(col("prio")).as("m"))
      val grid = grp.crossJoin(broadcast(glob))
        .join(cell, Seq("segment", "nation", "prio"), "left")
        .crossJoin(broadcast(tot))
        .select(col("segment"), col("nation"), col("prio"), col("n_g"),
          col("n_tot"), col("m"),
          (coalesce(col("ng_j"), lit(0L)) * col("n_tot") -
            col("n_j") * col("n_g")).as("term"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("segment", "nation")
        .orderBy(col("prio").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      grid.withColumn("pref", sum(col("term")).over(w))
        .groupBy(col("segment"), col("nation"))
        .agg(min(col("n_g")).as("n_rows"),
          sum(abs(col("pref"))).as("num"),
          min(col("n_g") * col("n_tot") * (col("m") - 1)).as("den"))
        .select(col("segment"), col("nation"), col("n_rows"),
          round(col("num").cast("double") / col("den").cast("double"), 6)
            .as("t_close"))
        .withColumn("t_ok", (col("t_close") <= TClose).cast("int"))
    }),

    // Laplace mechanism on the order-priority histogram: counts have
    // sensitivity 1 (one order moves one cell), so count + Lap(1/eps) is
    // eps-DP. The released cells carry ONLY the noisy value. Bounded
    // 5-cell aggregate; the noise is a per-cell scalar expression.
    "q_dp_laplace_hist" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"))
        .select(col("priority"),
          round(col("n").cast("double") +
            laplace(concat(lit("dp:"), col("priority"))), 6).as("noisy_n"),
          lit(DpEpsilon).as("epsilon"))),

    // k-anonymity REPAIR by generalization ascent: groups failing k at
    // (segment, nation) roll up the location hierarchy to (segment,
    // region); groups still failing are fully suppressed. Output: each
    // original QI group's achieved generalization level and released
    // key — the lattice-climb step an anonymizing release pipeline runs
    // after the audit. Two domain-bounded aggregations plus broadcast
    // hierarchy joins; the level decision is exact integer compares.
    "q_dp_generalize" -> ((s, d) => {
      val nat = t(s, d, "nation")
        .select(col("n_nationkey").as("nation"), col("n_regionkey").as("region"))
      val base = t(s, d, "orders").select(col("o_custkey"))
        // same no-hint rule as q_dp_kanonymity: customer is corpus-sized
        .join(t(s, d, "customer")
          .select(col("c_custkey"), col("c_mktsegment").as("segment"),
            col("c_nationkey").as("nation")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), "nation")
      val l1 = base.groupBy("segment", "nation", "region")
        .agg(count(lit(1)).as("n_l1"))
      val l2 = l1.groupBy("segment", "region")
        .agg(sum(col("n_l1")).as("n_l2"))
      l1.join(l2, Seq("segment", "region"))
        .select(col("segment"), col("nation"), col("region"),
          col("n_l1"), col("n_l2"),
          when(col("n_l1") >= KAnon, 0)
            .when(col("n_l2") >= KAnon, 1).otherwise(2).as("level"),
          when(col("n_l1") >= KAnon,
              concat(col("segment"), lit("/N"), col("nation")))
            .when(col("n_l2") >= KAnon,
              concat(col("segment"), lit("/R"), col("region")))
            .otherwise(lit("*")).as("released_key"))
    }),

    // DP noisy top-k: per-customer order counts + Lap(1/eps) each, then
    // the k largest NOISY counts (one-shot noisy-max composition). The
    // ranking is a global TakeOrdered(k) over the noisy relation — the
    // only "sort" is the k-row heap merge, which is exactly what survives
    // a 1000-executor release job. Ties (astronomically unlikely off the
    // continuous noise) break on custkey so both engines pick one order.
    "q_dp_noisy_topk" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n"))
        .select(col("custkey"),
          round(col("n").cast("double") +
            laplace(concat(lit("dpk:"), col("custkey").cast("string"))), 6).as("noisy_n"))
        .orderBy(col("noisy_n").desc, col("custkey").asc)
        .limit(DpTopK)),

    // Exponential mechanism: privately select the most common order
    // priority via the Gumbel-max trick — winner = argmax of
    // eps·u(c)/(2Δu) + Gumbel, which samples candidates with probability
    // ∝ exp(eps·u/(2Δu)), the textbook mechanism for categorical
    // releases where Laplace-on-counts doesn't apply. The Gumbel deviate
    // is -ln(-ln(u)) on the same seeded md5 uniform as the Laplace
    // queries (audit-replayable "noise" — the whole DP pack's
    // convention). The candidate relation is domain-bounded (priorities),
    // so everything after the one orders-sized agg is constant work.
    "q_dp_exponential" -> ((s, d) => {
      val scored = t(s, d, "orders")
        .groupBy(col("o_orderpriority").as("priority"))
        .agg(count(lit(1)).as("n"))
        .select(col("priority"), col("n"),
          round(lit(DpEpsilon / 2.0) * col("n").cast("double") +
            gumbel(concat(lit("dpe:"), col("priority"))), 6).as("noisy_score"))
        .transform(graft.CacheScope.persisted(_))
      // struct-max: ties on the 6dp score (effectively impossible on
      // distinct md5 draws, but the rule must still be total) break to
      // the LARGEST priority string in both engines.
      val top = scored.agg(max(struct(col("noisy_score"),
        col("priority"))).as("w"))
      scored.crossJoin(broadcast(top))
        .select(col("priority"), col("n"), col("noisy_score"),
          (col("noisy_score") === col("w.noisy_score") &&
            col("priority") === col("w.priority")).as("is_winner"))
    }))

  override val oracles: Map[String, String] = Map(

    "q_dp_tcloseness" ->
      s"""WITH j AS (
         |  SELECT c.c_mktsegment AS segment, c.c_nationkey AS nation,
         |         o.o_orderpriority AS prio
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |), cell AS (
         |  SELECT segment, nation, prio, count(*) AS ng_j
         |  FROM j GROUP BY 1, 2, 3
         |), grp AS (
         |  SELECT segment, nation, count(*) AS n_g FROM j GROUP BY 1, 2
         |), marg AS (
         |  SELECT prio, count(*) AS n_j FROM j GROUP BY 1
         |), tot AS (
         |  SELECT count(*) AS n_tot, count(DISTINCT prio) AS m FROM j
         |), grid AS (
         |  SELECT g.segment, g.nation, gl.prio, g.n_g, t.n_tot, t.m,
         |         COALESCE(c.ng_j, 0) * t.n_tot - gl.n_j * g.n_g AS term
         |  FROM grp g
         |  CROSS JOIN marg gl
         |  CROSS JOIN tot t
         |  LEFT JOIN cell c ON c.segment = g.segment AND c.nation = g.nation
         |                  AND c.prio = gl.prio
         |), pref AS (
         |  SELECT segment, nation, n_g, n_tot, m,
         |         sum(term) OVER (PARTITION BY segment, nation
         |                         ORDER BY prio
         |                         ROWS UNBOUNDED PRECEDING) AS pref
         |  FROM grid
         |), agg AS (
         |  SELECT segment, nation, min(n_g) AS n_rows,
         |         CAST(sum(abs(pref)) AS BIGINT) AS num,
         |         min(n_g * n_tot * (m - 1)) AS den
         |  FROM pref GROUP BY 1, 2
         |)
         |SELECT segment, nation, n_rows,
         |       round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS t_close,
         |       CAST(round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6)
         |            <= $TClose AS INTEGER) AS t_ok
         |FROM agg""".stripMargin,

    "q_dp_kanonymity" ->
      s"""SELECT c.c_mktsegment AS segment, c.c_nationkey AS nation,
         |       count(*) AS n_rows,
         |       count(DISTINCT o.o_orderpriority) AS l_div,
         |       CAST(count(*) >= $KAnon AS INTEGER) AS k_ok,
         |       CAST(count(DISTINCT o.o_orderpriority) >= $LDiv AS INTEGER) AS l_ok
         |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |GROUP BY 1, 2""".stripMargin,

    "q_dp_entropy_ldiv" ->
      s"""WITH j AS (
         |  SELECT c.c_mktsegment AS segment, c.c_nationkey AS nation,
         |         o.o_orderpriority AS prio
         |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
         |), cell AS (
         |  SELECT segment, nation, prio, count(*) AS c FROM j GROUP BY 1, 2, 3
         |), grp AS (
         |  SELECT segment, nation, CAST(sum(c) AS BIGINT) AS n_g,
         |         count(*) AS l_distinct
         |  FROM cell GROUP BY 1, 2
         |), hh AS (
         |  SELECT cell.segment, cell.nation,
         |         CAST(max(g.n_g) AS BIGINT) AS n_rows,
         |         CAST(max(g.l_distinct) AS BIGINT) AS l_distinct,
         |         round(exp(CAST(sum(CAST(round(
         |             -(CAST(cell.c AS DOUBLE) / CAST(g.n_g AS DOUBLE)) *
         |             ln(CAST(cell.c AS DOUBLE) / CAST(g.n_g AS DOUBLE)), 9)
         |           AS DECIMAL(14,9))) AS DOUBLE)), 4) AS entropy_l
         |  FROM cell JOIN grp g
         |    ON g.segment = cell.segment AND g.nation = cell.nation
         |  GROUP BY 1, 2
         |)
         |SELECT segment, nation, n_rows, l_distinct, entropy_l,
         |       CASE WHEN entropy_l >= $LDiv THEN 1 ELSE 0 END AS el_ok
         |FROM hh""".stripMargin,

    "q_dp_laplace_hist" ->
      s"""SELECT o_orderpriority AS priority,
         |       round(CAST(count(*) AS DOUBLE) +
         |             ${laplaceSql("'dp:' || o_orderpriority")}, 6) AS noisy_n,
         |       $DpEpsilon AS epsilon
         |FROM orders GROUP BY 1""".stripMargin,

    "q_dp_generalize" ->
      s"""WITH base AS (
         |  SELECT c.c_mktsegment AS segment, c.c_nationkey AS nation,
         |         n.n_regionkey AS region
         |  FROM orders o
         |  JOIN customer c ON o.o_custkey = c.c_custkey
         |  JOIN nation n ON n.n_nationkey = c.c_nationkey
         |), l1 AS (
         |  SELECT segment, nation, region, count(*) AS n_l1
         |  FROM base GROUP BY 1, 2, 3
         |), l2 AS (
         |  SELECT segment, region, CAST(sum(n_l1) AS BIGINT) AS n_l2
         |  FROM l1 GROUP BY 1, 2
         |)
         |SELECT l1.segment, l1.nation, l1.region, l1.n_l1, l2.n_l2,
         |       CASE WHEN l1.n_l1 >= $KAnon THEN 0
         |            WHEN l2.n_l2 >= $KAnon THEN 1 ELSE 2 END AS level,
         |       CASE WHEN l1.n_l1 >= $KAnon
         |              THEN l1.segment || '/N' || CAST(l1.nation AS VARCHAR)
         |            WHEN l2.n_l2 >= $KAnon
         |              THEN l1.segment || '/R' || CAST(l1.region AS VARCHAR)
         |            ELSE '*' END AS released_key
         |FROM l1 JOIN l2 USING (segment, region)""".stripMargin,

    "q_dp_noisy_topk" ->
      s"""SELECT custkey,
         |       round(CAST(n AS DOUBLE) +
         |             ${laplaceSql("'dpk:' || CAST(custkey AS VARCHAR)")}, 6) AS noisy_n
         |FROM (SELECT o_custkey AS custkey, count(*) AS n FROM orders GROUP BY 1)
         |ORDER BY noisy_n DESC, custkey ASC LIMIT $DpTopK""".stripMargin,

    "q_dp_exponential" ->
      s"""WITH scored AS (
         |  SELECT o_orderpriority AS priority, count(*) AS n,
         |         round(${DpEpsilon / 2.0} * CAST(count(*) AS DOUBLE) +
         |               ${gumbelSql("'dpe:' || o_orderpriority")}, 6) AS noisy_score
         |  FROM orders GROUP BY 1
         |), w AS (
         |  SELECT noisy_score, priority FROM scored
         |  ORDER BY noisy_score DESC, priority DESC LIMIT 1
         |)
         |SELECT s.priority, s.n, s.noisy_score,
         |       s.noisy_score = w.noisy_score AND s.priority = w.priority
         |         AS is_winner
         |FROM scored s CROSS JOIN w""".stripMargin)
}
