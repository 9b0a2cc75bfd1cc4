package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}

/** Robust / nonparametric statistics beyond the [[StatsQueries]] /
  * [[InferenceQueries]] decision table: Kendall's tau-b (pairwise rank
  * concordance — the third correlation after Pearson q_corr and Spearman),
  * the Hodges–Lehmann pseudomedian (the location estimator dual to the
  * Wilcoxon test), Bartlett's equal-variance test (the parametric,
  * more-powerful sibling of q_stats_levene), and the two-sample
  * Cramér–von Mises statistic (a whole-distribution distance more
  * tail-sensitive than q_stats_ks's single supremum).
  *
  * Determinism discipline ([[Det]]): everything that counts, orders, or
  * selects is exact integer/DECIMAL (cents, pair counts, rank gaps); ln and
  * sqrt run on identical operands in both engines and are round()-pinned
  * BEFORE any magnitude-amplifying multiply (the Bartlett ln·(n-1) terms
  * round the ln itself to 9 first — a raw 1-ulp ln divergence scaled by
  * n~1e6 would otherwise punch through a 6dp pin).
  *
  * Scale shapes: the two pairwise operators (tau, HL) run on a
  * deterministic orderkey-modulus sample — the dial documents the 100 TB
  * setting — and generate pairs through a BROADCAST self-join, never a
  * shuffle on the 3-value group key; the HL median of ~1e6 Walsh sums is
  * selected in-plan from a (group, value) count relation (the Walsh-sum
  * domain is value-bounded — see the query comment for why this beats
  * radix narrowing); Bartlett is one full-table aggregation to |types| rows; CvM
  * ranks ride the 64-shard range partition + triangular prefix-bases join
  * (the q_stats_wilcoxon machinery) so no window is ever unpartitioned.
  */
object RobustStatsQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  private def cents(c: Column): Column =
    (c.cast(DecimalType(12, 2)) * 100).cast("long")

  private val CentsSql = "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"

  /** Orderkey modulus for the pairwise-statistic sample: ~1% of orders,
    * i.e. ~2k lineitems per returnflag at sf0.1 → ~2e6 broadcast-generated
    * pairs per group. At 100 TB raise the modulus so the per-group sample
    * stays ~2-5k rows (pairs grow quadratically; the sample, not the data,
    * is the knob). Pairwise statistics on a fixed-size deterministic
    * sample are the standard estimator at any scale.
    */
  val PairMod = 101

  /** Event-id modulus for the CvM two-sample ranks (one in 7). */
  val CvmMod = 7

  /** TOST equivalence margin (cents) and one-sided z critical (α=0.05). */
  val TostDelta = 500.0
  val TostZCrit = 1.645

  /** SRM chi-square critical value (dof 1, α=0.05). */
  val SrmChi2Crit = 3.841

  /** Value-range shards for the CvM global rank (the q_stats_wilcoxon
    * constant: per-shard window load is ~1/64 of the sample).
    */
  val CvmShards = 64

  /** The sampled lineitem relation both pairwise operators share:
    * (returnflag, unique pair id, cents(quantity), cents(extendedprice)).
    * (orderkey, linenumber) is NOT unique in the synthetic data, so the
    * pair id is a row_number under the deterministic (id, x, y) order —
    * fully identical rows get distinct uids in an arbitrary-but-
    * irrelevant order (their pairs contribute only ties), and every
    * multiset pair is generated exactly once. The window partitions the
    * 3-value group key over the BOUNDED sample — fine here, and the
    * reason the sample, not the raw table, carries the uid.
    */
  private def sampled(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy("rf").orderBy("id", "x", "y")
    t(s, d, "lineitem")
      .filter(col("l_orderkey") % PairMod === 0)
      .select(col("l_returnflag").as("rf"),
        (col("l_orderkey") * 8 + col("l_linenumber")).as("id"),
        cents(col("l_quantity")).as("x"),
        cents(col("l_extendedprice")).as("y"))
      .withColumn("uid", row_number().over(w))
      .drop("id")
  }

  private val SampledSql =
    s"""SELECT rf, x, y,
       |       row_number() OVER (PARTITION BY rf ORDER BY id, x, y) AS uid
       |FROM (
       |  SELECT l_returnflag AS rf, l_orderkey * 8 + l_linenumber AS id,
       |         CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
       |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
       |  FROM lineitem WHERE l_orderkey % $PairMod = 0)""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Kendall's tau-b between quantity and price per returnflag: the
    // fraction of concordant minus discordant pairs, tie-corrected on both
    // margins. Everything is exact integers — concordance is a sign
    // comparison, tie corrections n1/n2 come from value-group counts, and
    // the denominator multiplies sub-2^53 longs as doubles only in the
    // final expression. Scale shape: the bounded sample broadcasts; pair
    // generation is a narrow BroadcastHashJoin on rf with the id< residual
    // (never a 3-key shuffle); tie counts are one groupBy over the sample.
    "q_stats_kendall" -> ((s, d) => {
      val li = sampled(s, d).transform(graft.CacheScope.persisted(_))
      val sgn = (a: Column, b: Column) =>
        when(a < b, -1L).otherwise(when(a > b, 1L).otherwise(0L))
      val pairs = li.as("a").join(broadcast(li.as("b")),
          col("a.rf") === col("b.rf") && col("a.uid") < col("b.uid"))
        .select(col("a.rf").as("rf"),
          (sgn(col("a.x"), col("b.x")) * sgn(col("a.y"), col("b.y"))).as("cd"))
        .groupBy("rf")
        .agg(sum(when(col("cd") === 1L, 1L).otherwise(0L)).as("conc"),
          sum(when(col("cd") === -1L, 1L).otherwise(0L)).as("disc"))
      def tiePairs(v: String): DataFrame =
        li.groupBy(col("rf"), col(v)).agg(count(lit(1)).as("c"))
          // Integer div (ADVICE r11): c*(c-1) is even so `div` is exact by
          // construction, where double `/` relied on staying under 2^53.
          .groupBy("rf").agg(sum(expr("c * (c - 1) div 2")).as(s"t$v"))
      val n = li.groupBy("rf").agg(count(lit(1)).as("n"))
      val m = n.join(broadcast(tiePairs("x")), "rf")
        .join(broadcast(tiePairs("y")), "rf")
        .join(broadcast(pairs), "rf")
        .withColumn("n0", expr("n * (n - 1) div 2"))
      m.filter(col("n0") > col("tx") && col("n0") > col("ty"))
        .select(col("rf").as("l_returnflag"), col("n").as("n_items"),
          col("conc").as("concordant"), col("disc").as("discordant"),
          round((col("conc") - col("disc")).cast("double") /
            sqrt((col("n0") - col("tx")).cast("double") *
              (col("n0") - col("ty")).cast("double")), 9).as("tau_b"))
    }),

    // Goodman–Kruskal gamma and Somers' D(y|x) on the SAME sampled pair
    // population as q_stats_kendall — the two concordance coefficients a
    // tie-heavy ordinal association actually calls for: gamma ignores ALL
    // tied pairs ((C−D)/(C+D), the right number when ties are structural,
    // e.g. coarse ordinal scales), Somers' D keeps pairs tied only on the
    // dependent y in the denominator ((C−D)/(n0−Tx) — the asymmetric
    // "does x predict y's direction" version, and the statistic under the
    // AUC identity D = 2·AUC−1 for binary y). Identical exact-integer
    // pair/tie machinery as kendall (sign comparisons, integer-div tie
    // counts, one broadcast self-join on the bounded sample); only the
    // final one-division formulas differ.
    "q_stats_concordance" -> ((s, d) => {
      val li = sampled(s, d).transform(graft.CacheScope.persisted(_))
      val sgn = (a: Column, b: Column) =>
        when(a < b, -1L).otherwise(when(a > b, 1L).otherwise(0L))
      val pairs = li.as("a").join(broadcast(li.as("b")),
          col("a.rf") === col("b.rf") && col("a.uid") < col("b.uid"))
        .select(col("a.rf").as("rf"),
          (sgn(col("a.x"), col("b.x")) * sgn(col("a.y"), col("b.y"))).as("cd"))
        .groupBy("rf")
        .agg(sum(when(col("cd") === 1L, 1L).otherwise(0L)).as("conc"),
          sum(when(col("cd") === -1L, 1L).otherwise(0L)).as("disc"))
      def tiePairs(v: String): DataFrame =
        li.groupBy(col("rf"), col(v)).agg(count(lit(1)).as("c"))
          .groupBy("rf").agg(sum(expr("c * (c - 1) div 2")).as(s"t$v"))
      val n = li.groupBy("rf").agg(count(lit(1)).as("n"))
      n.join(broadcast(tiePairs("x")), "rf")
        .join(broadcast(pairs), "rf")
        .withColumn("n0", expr("n * (n - 1) div 2"))
        .filter(col("conc") + col("disc") > 0 && col("n0") > col("tx"))
        .select(col("rf").as("l_returnflag"), col("n").as("n_items"),
          col("conc").as("concordant"), col("disc").as("discordant"),
          round((col("conc") - col("disc")).cast("double") /
            (col("conc") + col("disc")).cast("double"), 9).as("gamma"),
          round((col("conc") - col("disc")).cast("double") /
            (col("n0") - col("tx")).cast("double"), 9).as("somers_dyx"))
    }),

    // Hodges–Lehmann pseudomedian of quantity per returnflag: the median
    // of all Walsh averages (x_i + x_j)/2, i <= j — the location estimator
    // whose confidence interval inverts the Wilcoxon signed-rank test,
    // robust to 29% contamination where the mean tolerates none. The
    // Walsh-sum DOMAIN is bounded (quantity ≤ 50 units → s ≤ 10⁴ cents),
    // so the exact median comes from ONE streamed pass over the pair
    // generator into a (group, value) count relation, then an in-plan
    // prefix-sum selection over that ≤10⁴-value relation — no sort of the
    // pair population, no multi-pass radix narrowing (measured 9.6 s →
    // the counting plan at sf0.1; RadixSelect remains the tool when the
    // value domain is unbounded), no driver traffic at all. The even/odd
    // midpoint picks the first values whose running count reaches
    // (m+1)/2 and (m+2)/2 — both exact integers.
    "q_stats_hodges_lehmann" -> ((s, d) => {
      val li = sampled(s, d).transform(graft.CacheScope.persisted(_))
      val cnt = li.as("a").join(broadcast(li.as("b")),
          col("a.rf") === col("b.rf") && col("a.uid") <= col("b.uid"))
        .groupBy(col("a.rf").as("rf"), (col("a.x") + col("b.x")).as("s"))
        .agg(count(lit(1)).as("c"))
      val w = Window.partitionBy("rf").orderBy("s")
        .rowsBetween(Window.unboundedPreceding, 0)
      val cum = cnt.withColumn("cum", sum(col("c")).over(w))
        .withColumn("m", sum(col("c")).over(Window.partitionBy("rf")))
        .transform(graft.CacheScope.persisted(_))
      val sel = cum.groupBy(col("rf"), col("m"))
        .agg(min(when(col("cum") >= expr("(m + 1) div 2"), col("s"))).as("slo"),
          min(when(col("cum") >= expr("(m + 2) div 2"), col("s"))).as("shi"))
      val ns = li.groupBy("rf").agg(count(lit(1)).as("n"))
      sel.join(broadcast(ns), "rf")
        .select(col("rf").as("l_returnflag"), col("n").as("n_items"),
          col("m").as("m_pairs"),
          round((col("slo") + col("shi")).cast("double") / 400.0, 6)
            .as("hl_qty"))
    }),

    // Bartlett's test for equal value-variance across event types — the
    // parametric complement of q_stats_levene (more powerful under
    // normality, famously fragile otherwise; running both is the
    // monitoring playbook). Within-group sums of squares come from exact
    // 4dp-decimal dollar moments SHIFTED by the per-type integer mean
    // (the q_stats_jarque_bera trick: keeps the scaled sums under 2^53 so
    // the decimal->double casts are exact in both engines); every ln is
    // round(,9)-pinned BEFORE being scaled by (n-1)~1e6, and per-group
    // terms decimal-sum so no float ordering exists anywhere. Scale
    // shape: two events-sized aggregations (shift, moments) + broadcast
    // joins — no window, no sample needed.
    "q_stats_bartlett" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"), col("value").cast(DecimalType(18, 4)).as("v"))
      val shift = ev.groupBy("event_type")
        .agg((sum(col("v")).cast(DecimalType(28, 4)) / count(lit(1)))
          .cast("long").as("mu"))
      val g = ev.join(broadcast(shift), "event_type")
        .select(col("event_type"), (col("v") - col("mu")).as("w"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("w")).cast(DecimalType(18, 4)).as("s1"),
          sum(col("w") * col("w")).cast(DecimalType(28, 4)).as("s2"))
        .filter(col("n") >= 2)
        // ssw = (n-1)*Si^2 exactly; 2dp pin keeps the later decimal sum
        // castable to double exactly at any realistic scale.
        .withColumn("ssw", round(col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double") /
            col("n").cast("double"), 2))
        .withColumn("term",
          round(log(col("ssw") / (col("n") - 1)), 9) * (col("n") - 1))
        .transform(graft.CacheScope.persisted(_))
      val tot = g.agg(count(lit(1)).as("k"), sum(col("n")).as("nt"),
        sum(col("ssw").cast(DecimalType(24, 2))).as("p"),
        sum(round(col("term"), 4).cast(DecimalType(20, 4))).cast("double").as("st"),
        sum(round(lit(1.0) / (col("n") - 1), 12).cast(DecimalType(20, 12)))
          .cast("double").as("si"))
      val dfw = (col("nt") - col("k")).cast("double")
      val c = lit(1.0) + (col("si") - lit(1.0) / dfw) /
        (lit(3.0) * (col("k") - 1).cast("double"))
      val chi = g.crossJoin(broadcast(tot))
        .select(col("event_type"), col("n").as("n_obs"),
          round(col("ssw") / (col("n") - 1), 6).as("var_value"),
          round((dfw * round(log(col("p").cast("double") / dfw), 9) - col("st")) / c,
            6).as("chi2"),
          (col("k") - 1).as("dof"))
      chi
    }),

    // Sample-ratio-mismatch guardrail: the md5-parity 50/50 assignment
    // (the q_ml_sprt experiment split) checked against its own design —
    // chi-square on observed variant USER counts vs n/2 expected. SRM is
    // the first thing an experimentation platform validates; a triggered
    // flag invalidates every downstream test on the split. Exact integer
    // counts; (o−e)²/e = (2o−n)²/(2n) avoids the rational e entirely.
    "q_stats_srm" -> ((s, d) => {
      val v = t(s, d, "events")
        .select(col("user_id")).distinct()
        .select((conv(substring(md5(col("user_id").cast("string")), 1, 6), 16, 10)
          .cast("long") % 2).as("variant"))
        .groupBy("variant").agg(count(lit(1)).as("o"))
      val tot = v.agg(sum(col("o")).as("n"))
      val chi = (lit(2) * col("o") - col("n")) *
        (lit(2) * col("o") - col("n"))
      val per = v.crossJoin(broadcast(tot))
        .select(col("variant"), col("o").as("n_users"),
          round(chi.cast("double") / (lit(2.0) * col("n").cast("double")), 6)
            .as("contrib"))
      val s2 = per.agg(sum(col("contrib").cast(DecimalType(18, 6)))
        .cast("double").as("chi2"))
      per.crossJoin(broadcast(s2))
        .select(col("variant"), col("n_users"), col("contrib"),
          round(col("chi2"), 6).as("chi2"),
          (col("chi2") > SrmChi2Crit).as("srm_flag"))
    }),

    // TOST equivalence test (two one-sided tests) between click and view
    // mean values: unlike q_stats_ttest, which can only FAIL to find a
    // difference, TOST positively establishes |μA−μB| < δ — the "safe to
    // ship, no worse than control" decision. Welch t-statistics against
    // both margin bounds from exact scale-0 decimal kernels; equivalence
    // iff t_lower > z_crit AND t_upper < −z_crit (z≈1.645, α=0.05).
    "q_stats_tost" -> ((s, d) => {
      val ev = t(s, d, "events")
        .filter(col("event_type").isin("click", "view"))
        .select(col("event_type").as("g"), cents(col("value"))
          .cast(DecimalType(14, 0)).as("v"))
      val m = ev.groupBy("g")
        .agg(count(lit(1)).cast(DecimalType(8, 0)).as("n"),
          sum(col("v")).cast(DecimalType(19, 0)).as("s1"),
          sum(col("v") * col("v")).cast(DecimalType(30, 0)).as("s2"))
        .filter(col("n") > 1)
        .select(col("g"), col("n").cast("long").as("n"),
          (col("s1").cast("double") / col("n").cast("double")).as("mu"),
          ((col("n") * col("s2") - col("s1") * col("s1")).cast("double") /
            (col("n").cast("double") * (col("n") - 1).cast("double")))
            .as("vv"), col("n").cast("double").as("nd"))
      val a = m.filter(col("g") === "click")
        .select(col("n").as("n_a"), col("mu").as("mu_a"),
          col("vv").as("v_a"), col("nd").as("nd_a"))
      val b = m.filter(col("g") === "view")
        .select(col("n").as("n_b"), col("mu").as("mu_b"),
          col("vv").as("v_b"), col("nd").as("nd_b"))
      val se = sqrt(col("v_a") / col("nd_a") + col("v_b") / col("nd_b"))
      val diff = col("mu_a") - col("mu_b")
      a.crossJoin(broadcast(b))
        .select(col("n_a"), col("n_b"),
          round(diff / 100.0, 6).as("diff_value"),
          round(se / 100.0, 6).as("se_value"),
          round((diff + TostDelta) / se, 6).as("t_lower"),
          round((diff - TostDelta) / se, 6).as("t_upper"),
          ((diff + TostDelta) / se > TostZCrit &&
            (diff - TostDelta) / se < -TostZCrit).as("equivalent"))
    }),

    // Two-sample Cramér–von Mises between 'click' and 'view' value
    // distributions: T = U/(n·m·N) − (4nm−1)/(6N) with
    // U = n·Σ_A(r_i−i)² + m·Σ_B(s_j−j)², where r−i for an A-element is
    // exactly the count of B-elements preceding it under the (value, id)
    // total order — ties cannot exist in the order, so both engines agree
    // bit-for-bit on every rank gap. That count is a shard-partitioned
    // cumulative sum (64 value-range shards, cross-shard offsets from the
    // triangular prefix-bases join over the 64-row totals relation —
    // q_stats_wilcoxon's shape): no unpartitioned window at any scale.
    // All of U is exact integer/DECIMAL; doubles only in the final T.
    "q_stats_cvm" -> ((s, d) => {
      val e = t(s, d, "events")
        .filter(col("event_type").isin("click", "view") &&
          col("event_id") % CvmMod === 0)
        .select(col("event_type").as("g"), col("event_id").as("id"),
          cents(col("value")).as("v"))
        .transform(graft.CacheScope.persisted(_))
      val rng = e.agg(min(col("v")).as("v0"), max(col("v")).as("v1"))
      val sh = e.crossJoin(broadcast(rng))
        .withColumn("shard", expr(s"(v - v0) * $CvmShards div (v1 - v0 + 1)"))
        .transform(graft.CacheScope.persisted(_))
      val isA = (col("g") === "click").cast("long")
      val isB = (col("g") === "view").cast("long")
      val tot = sh.groupBy("shard").agg(sum(isA).as("ta"), sum(isB).as("tb"))
      val bases = tot.as("b").join(tot.as("o"), col("o.shard") < col("b.shard"), "left")
        .groupBy(col("b.shard").as("shard"))
        .agg(coalesce(sum(col("o.ta")), lit(0L)).as("ba"),
          coalesce(sum(col("o.tb")), lit(0L)).as("bb"))
      val w = Window.partitionBy("shard").orderBy(col("v"), col("id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val gaps = sh.join(broadcast(bases), "shard")
        .withColumn("cumA", coalesce(sum(isA).over(w), lit(0L)) + col("ba"))
        .withColumn("cumB", coalesce(sum(isB).over(w), lit(0L)) + col("bb"))
        .select(col("g"),
          when(col("g") === "click", col("cumB")).otherwise(col("cumA")).as("o"))
      val m = gaps.groupBy("g")
        .agg(count(lit(1)).as("cnt"),
          sum((col("o") * col("o")).cast(DecimalType(28, 0))).as("ss"))
      val a = m.filter(col("g") === "click")
        .select(col("cnt").as("n"), col("ss").as("sa"))
      val b = m.filter(col("g") === "view")
        .select(col("cnt").as("m"), col("ss").as("sb"))
      a.crossJoin(broadcast(b))
        .select(col("n"), col("m"),
          round((col("n").cast("double") * col("sa").cast("double") +
              col("m").cast("double") * col("sb").cast("double")) /
              (col("n").cast("double") * col("m").cast("double") *
                (col("n") + col("m")).cast("double")) -
            (lit(4.0) * col("n").cast("double") * col("m").cast("double") - 1) /
              (lit(6.0) * (col("n") + col("m")).cast("double")), 9).as("t_cvm"))
    }))

  override val oracles: Map[String, String] = Map(

    "q_stats_kendall" ->
      s"""WITH li AS ($SampledSql
        |), pr AS (
        |  SELECT a.rf,
        |         sign(a.x - b.x) * sign(a.y - b.y) AS cd
        |  FROM li a JOIN li b ON a.rf = b.rf AND a.uid < b.uid
        |), cd AS (
        |  SELECT rf,
        |         CAST(sum(CASE WHEN cd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conc,
        |         CAST(sum(CASE WHEN cd = -1 THEN 1 ELSE 0 END) AS BIGINT) AS disc
        |  FROM pr GROUP BY rf
        |), tx AS (
        |  SELECT rf, sum(c * (c - 1) // 2) AS tx FROM (
        |    SELECT rf, x, count(*) AS c FROM li GROUP BY rf, x) GROUP BY rf
        |), ty AS (
        |  SELECT rf, sum(c * (c - 1) // 2) AS ty FROM (
        |    SELECT rf, y, count(*) AS c FROM li GROUP BY rf, y) GROUP BY rf
        |), n AS (SELECT rf, count(*) AS n FROM li GROUP BY rf)
        |SELECT n.rf AS l_returnflag, n.n AS n_items,
        |       cd.conc AS concordant, cd.disc AS discordant,
        |       round(CAST(cd.conc - cd.disc AS DOUBLE) /
        |             sqrt(CAST(n.n * (n.n - 1) // 2 - tx.tx AS DOUBLE) *
        |                  CAST(n.n * (n.n - 1) // 2 - ty.ty AS DOUBLE)), 9) AS tau_b
        |FROM n JOIN cd USING (rf) JOIN tx USING (rf) JOIN ty USING (rf)
        |WHERE n.n * (n.n - 1) // 2 > tx.tx AND n.n * (n.n - 1) // 2 > ty.ty""".stripMargin,

    "q_stats_concordance" ->
      s"""WITH li AS ($SampledSql
        |), pr AS (
        |  SELECT a.rf,
        |         sign(a.x - b.x) * sign(a.y - b.y) AS cd
        |  FROM li a JOIN li b ON a.rf = b.rf AND a.uid < b.uid
        |), cd AS (
        |  SELECT rf,
        |         CAST(sum(CASE WHEN cd = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conc,
        |         CAST(sum(CASE WHEN cd = -1 THEN 1 ELSE 0 END) AS BIGINT) AS disc
        |  FROM pr GROUP BY rf
        |), tx AS (
        |  SELECT rf, sum(c * (c - 1) // 2) AS tx FROM (
        |    SELECT rf, x, count(*) AS c FROM li GROUP BY rf, x) GROUP BY rf
        |), n AS (SELECT rf, count(*) AS n FROM li GROUP BY rf)
        |SELECT n.rf AS l_returnflag, n.n AS n_items,
        |       cd.conc AS concordant, cd.disc AS discordant,
        |       round(CAST(cd.conc - cd.disc AS DOUBLE) /
        |             CAST(cd.conc + cd.disc AS DOUBLE), 9) AS gamma,
        |       round(CAST(cd.conc - cd.disc AS DOUBLE) /
        |             CAST(n.n * (n.n - 1) // 2 - tx.tx AS DOUBLE), 9) AS somers_dyx
        |FROM n JOIN cd USING (rf) JOIN tx USING (rf)
        |WHERE cd.conc + cd.disc > 0 AND n.n * (n.n - 1) // 2 > tx.tx""".stripMargin,

    "q_stats_hodges_lehmann" ->
      s"""WITH li AS ($SampledSql
        |), p AS (
        |  SELECT a.rf, a.x + b.x AS s
        |  FROM li a JOIN li b ON a.rf = b.rf AND a.uid <= b.uid
        |), r AS (
        |  SELECT rf, s, row_number() OVER (PARTITION BY rf ORDER BY s) AS rn,
        |         count(*) OVER (PARTITION BY rf) AS m
        |  FROM p
        |), n AS (SELECT rf, count(*) AS n FROM li GROUP BY rf)
        |SELECT r.rf AS l_returnflag, max(n.n) AS n_items, max(r.m) AS m_pairs,
        |       round(avg(CASE WHEN r.rn IN ((r.m + 1) // 2, (r.m + 2) // 2)
        |                      THEN CAST(r.s AS DOUBLE) END) / 200.0, 6) AS hl_qty
        |FROM r JOIN n USING (rf)
        |GROUP BY r.rf""".stripMargin,

    "q_stats_bartlett" ->
      """WITH ev AS (
        |  SELECT event_type, CAST(value AS DECIMAL(18,4)) AS v FROM events
        |), sh AS (
        |  SELECT event_type,
        |         CAST(CAST(sum(v) AS DECIMAL(28,4)) / count(*) AS BIGINT) AS mu
        |  FROM ev GROUP BY event_type
        |), g AS (
        |  SELECT ev.event_type, count(*) AS n,
        |         CAST(sum(v - mu) AS DECIMAL(18,4)) AS s1,
        |         CAST(sum((v - mu) * (v - mu)) AS DECIMAL(28,4)) AS s2
        |  FROM ev JOIN sh USING (event_type)
        |  GROUP BY ev.event_type HAVING count(*) >= 2
        |), gg AS (
        |  SELECT event_type, n,
        |         round(CAST(s2 AS DOUBLE) -
        |               CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) /
        |               CAST(n AS DOUBLE), 2) AS ssw
        |  FROM g
        |), gt AS (
        |  SELECT event_type, n, ssw,
        |         round(ln(ssw / (n - 1)), 9) * (n - 1) AS term
        |  FROM gg
        |), tot AS (
        |  SELECT count(*) AS k, sum(n) AS nt,
        |         sum(CAST(ssw AS DECIMAL(24,2))) AS p,
        |         CAST(sum(CAST(round(term, 4) AS DECIMAL(20,4))) AS DOUBLE) AS st,
        |         CAST(sum(CAST(round(1.0 / (n - 1), 12) AS DECIMAL(20,12))) AS DOUBLE) AS si
        |  FROM gt
        |)
        |SELECT gt.event_type, gt.n AS n_obs,
        |       round(gt.ssw / (gt.n - 1), 6) AS var_value,
        |       round((CAST(tot.nt - tot.k AS DOUBLE) *
        |                round(ln(CAST(tot.p AS DOUBLE) / CAST(tot.nt - tot.k AS DOUBLE)), 9)
        |              - tot.st) /
        |             (1.0 + (tot.si - 1.0 / CAST(tot.nt - tot.k AS DOUBLE)) /
        |                    (3.0 * CAST(tot.k - 1 AS DOUBLE))), 6) AS chi2,
        |       tot.k - 1 AS dof
        |FROM gt CROSS JOIN tot""".stripMargin,

    "q_stats_srm" ->
      s"""WITH v AS (
        |  SELECT ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 6))::BIGINT % 2 AS variant
        |  FROM (SELECT DISTINCT user_id FROM events)
        |), o AS (
        |  SELECT variant, count(*) AS o FROM v GROUP BY 1
        |), tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM o),
        |per AS (
        |  SELECT variant, o AS n_users,
        |         round(CAST((2 * o - n) * (2 * o - n) AS DOUBLE) /
        |               (2.0 * CAST(n AS DOUBLE)), 6) AS contrib
        |  FROM o CROSS JOIN tot
        |), s2 AS (
        |  SELECT CAST(sum(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE) AS chi2 FROM per
        |)
        |SELECT variant, n_users, contrib, round(chi2, 6) AS chi2,
        |       chi2 > $SrmChi2Crit AS srm_flag
        |FROM per CROSS JOIN s2""".stripMargin,

    "q_stats_tost" ->
      s"""WITH ev AS (
        |  SELECT event_type AS g, CAST($CentsSql AS DECIMAL(14,0)) AS v
        |  FROM events WHERE event_type IN ('click', 'view')
        |), m AS (
        |  SELECT g, CAST(count(*) AS BIGINT) AS n,
        |         CAST(CAST(sum(v) AS DECIMAL(19,0)) AS DOUBLE) /
        |           CAST(count(*) AS DOUBLE) AS mu,
        |         CAST(CAST(count(*) AS DECIMAL(8,0)) *
        |                CAST(sum(CAST(v AS DECIMAL(19,0)) * v) AS DECIMAL(30,0)) -
        |              CAST(sum(v) AS DECIMAL(19,0)) * CAST(sum(v) AS DECIMAL(19,0))
        |              AS DOUBLE) /
        |           (CAST(count(*) AS DOUBLE) * CAST(count(*) - 1 AS DOUBLE)) AS vv,
        |         CAST(count(*) AS DOUBLE) AS nd
        |  FROM ev GROUP BY g HAVING count(*) > 1
        |)
        |SELECT a.n AS n_a, b.n AS n_b,
        |       round((a.mu - b.mu) / 100.0, 6) AS diff_value,
        |       round(sqrt(a.vv / a.nd + b.vv / b.nd) / 100.0, 6) AS se_value,
        |       round((a.mu - b.mu + $TostDelta) / sqrt(a.vv / a.nd + b.vv / b.nd), 6) AS t_lower,
        |       round((a.mu - b.mu - $TostDelta) / sqrt(a.vv / a.nd + b.vv / b.nd), 6) AS t_upper,
        |       (a.mu - b.mu + $TostDelta) / sqrt(a.vv / a.nd + b.vv / b.nd) > $TostZCrit AND
        |       (a.mu - b.mu - $TostDelta) / sqrt(a.vv / a.nd + b.vv / b.nd) < -$TostZCrit AS equivalent
        |FROM (SELECT * FROM m WHERE g = 'click') a
        |CROSS JOIN (SELECT * FROM m WHERE g = 'view') b""".stripMargin,

    "q_stats_cvm" ->
      s"""WITH e AS (
        |  SELECT event_type AS g, event_id AS id, $CentsSql AS v
        |  FROM events
        |  WHERE event_type IN ('click', 'view') AND event_id % $CvmMod = 0
        |), r AS (
        |  SELECT g,
        |         row_number() OVER (ORDER BY v, id) -
        |         row_number() OVER (PARTITION BY g ORDER BY v, id) AS o
        |  FROM e
        |), m AS (
        |  SELECT g, count(*) AS cnt, sum(CAST(o AS DECIMAL(28,0)) * o) AS ss
        |  FROM r GROUP BY g
        |)
        |SELECT a.cnt AS n, b.cnt AS m,
        |       round((CAST(a.cnt AS DOUBLE) * CAST(a.ss AS DOUBLE) +
        |              CAST(b.cnt AS DOUBLE) * CAST(b.ss AS DOUBLE)) /
        |             (CAST(a.cnt AS DOUBLE) * CAST(b.cnt AS DOUBLE) *
        |              CAST(a.cnt + b.cnt AS DOUBLE)) -
        |             (4.0 * CAST(a.cnt AS DOUBLE) * CAST(b.cnt AS DOUBLE) - 1) /
        |             (6.0 * CAST(a.cnt + b.cnt AS DOUBLE)), 9) AS t_cvm
        |FROM (SELECT * FROM m WHERE g = 'click') a
        |CROSS JOIN (SELECT * FROM m WHERE g = 'view') b""".stripMargin)
}
