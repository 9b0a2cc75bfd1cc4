package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}

/** Hypothesis-testing and effect-size operators over `events` — the second
  * wave of "is this shift real?" primitives beyond [[StatsQueries]]:
  * Wilcoxon signed-rank (paired, nonparametric), Jarque–Bera normality,
  * Cramér's V effect size, Cohen's d, Grubbs max-outlier, and the
  * two-proportion z-test. Together with q_stats_ttest / q_stats_mannwhitney
  * these cover the standard before/after monitoring decision table
  * (paired vs unpaired × parametric vs rank-based).
  *
  * Determinism discipline (see [[Det]]): every quantity that ORDERS or
  * SELECTS rows is exact integer/DECIMAL arithmetic (cents, counts,
  * 2x-scaled average ranks, |n*x - s1| deviations); doubles appear only in
  * final closed-form statistics computed from identical operands in both
  * engines, pinned with round(,6).
  *
  * Scale shapes: everything aggregates events once to a bounded relation
  * (per-user, per-type-day, or per-cell) before any join; the one global
  * ranking (Wilcoxon) uses value-range shards + the triangular
  * prefix-bases join — a shard-partitioned window, never an unpartitioned
  * one (the text_pack_sequences discipline).
  */
object InferenceQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Event-id cap for the Fisher-exact 2×2 sample — exact tests are a
    * small-table tool, and the cap keeps the hypergeometric support (and
    * so the whole computation) constant-size at any corpus scale.
    */
  val FisherSample = 500L

  private def cents(c: Column): Column =
    (c.cast(DecimalType(12, 2)) * 100).cast("long")

  /** Standard-normal quantiles for q_stats_power: z_{0.025} (two-sided
    * α=0.05) and z_{0.2} (80% power) — compile-time literals shared
    * verbatim with the oracle SQL.
    */
  val PowerZAlpha = 1.959964
  val PowerZBeta = 0.841621

  private val CentsSql = "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"

  /** Value-range shards for the Wilcoxon global rank: a constant-size
    * offsets relation (prefix bases) at any scale; within a shard the rank
    * window is shard-partitioned. 64 shards keeps the triangular bases
    * join at 64^2/2 rows while bounding per-shard skew at ~1/64 of the
    * pair population for any non-degenerate |d| distribution.
    */
  val RankShards = 64

  /** Generalized-ESD outlier rounds (unrolled in both engines). */
  val EsdRounds = 3

  /** Events split into equal time halves by epoch-microsecond midpoint
    * (the q_dq_drift_psi convention — integer `div`, never double `/`).
    */
  private def withHalf(ev: DataFrame): DataFrame = {
    val rng = ev.agg(min(col("us")).as("us0"), max(col("us")).as("us1"))
    ev.crossJoin(broadcast(rng))
      .withColumn("first_half", expr("us < us0 + (us1 - us0) div 2"))
      .drop("us0", "us1")
  }

  private val HalfSql =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us,
      |         CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS c
      |  FROM events
      |), rng AS (SELECT min(us) AS us0, max(us) AS us1 FROM ev),
      |h AS (
      |  SELECT user_id, event_type, c,
      |         us < us0 + (us1 - us0) // 2 AS first_half
      |  FROM ev CROSS JOIN rng
      |)""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Wilcoxon signed-rank test: did per-user total spend shift between
    // the first and second half of the time range? The PAIRED rank-based
    // sibling of q_stats_mannwhitney (which compares independent
    // samples) — each user is their own control, so user-level variance
    // cancels. All rank machinery is exact integers: d = cents(H2) -
    // cents(H1) per user; rank2 = TWICE the average rank of |d|
    // (2*cntBelow + tieCnt + 1 — the q_stats_spearman trick, integral
    // even for x.5 average ranks); W2+ = sum of rank2 over positive d.
    // The normal approximation z = (W2 - n(n+1)/2)/sqrt(n(n+1)(2n+1)/6)
    // runs on identical doubles. Scale shape: one events-sized agg to
    // per-user rows, then the 64-shard range-partitioned rank (window is
    // shard-partitioned; shard offsets ride the triangular bases join
    // over a 64-row relation) — no global sort at any scale.
    // Fisher's exact test on a 2×2 over a BOUNDED order sample (the
    // key-range cap keeps the hypergeometric support constant at any
    // corpus scale — exact tests are for small tables; the chi-square
    // family covers the large-n regime). Log-binomials are built from
    // 9dp-pinned ln terms folded in exact DECIMAL (one aggregate HOF per
    // support point, ≤ sample² term evaluations total, no lgamma — Spark
    // has none and DuckDB's wouldn't match anyway), so every support
    // point's log-probability is bit-identical across engines; tail
    // membership (lp ≤ lp_obs + 1e-7, the standard two-sided rule)
    // therefore decides identically, and the p-values are decimal sums
    // of 12dp-pinned exp terms. Everything downstream of the one
    // filtered scan is a ≤ support-size relation.
    "q_stats_fisher_exact" -> ((s, d) => {
      val o = t(s, d, "events")
        .filter(col("event_id") < FisherSample)
        .select((col("event_type") === "purchase").cast("long").as("x"),
          (col("value") >= 50.0).cast("long").as("y"))
      val m = o.agg(count(lit(1)).as("n"), sum(col("x")).as("r1"),
        sum(col("y")).as("c1"), sum(col("x") * col("y")).as("a"))
      def lgC(aE: String, bE: String): String =
        s"""IF(($bE) = 0, CAST(0.0 AS DECIMAL(28,9)),
           |   aggregate(sequence(1L, CAST(($bE) AS BIGINT)),
           |     CAST(0.0 AS DECIMAL(28,9)),
           |     (acc, i) -> CAST(acc + CAST(round(ln(CAST(($aE) - ($bE) + i AS DOUBLE)
           |                                           / i), 9) AS DECIMAL(28,9))
           |                      AS DECIMAL(28,9))))""".stripMargin
      val sup = m
        .withColumn("lgn", expr(lgC("n", "c1")))
        .select(col("n"), col("r1"), col("c1"), col("a"), col("lgn"),
          explode(sequence(greatest(lit(0L), col("r1") + col("c1") - col("n")),
            least(col("r1"), col("c1")))).as("k"))
        .withColumn("lp",
          expr(lgC("r1", "k")) + expr(lgC("n - r1", "c1 - k")) - col("lgn"))
        .transform(graft.CacheScope.persisted(_))
      val obs = sup.filter(col("k") === col("a"))
        .select(col("lp").as("lp_obs"))
      val joined = sup.crossJoin(broadcast(obs))
      val pTerm = round(exp(col("lp").cast("double")), 12)
        .cast(DecimalType(16, 12))
      joined.agg(
          min(col("n")).as("n"), min(col("r1")).as("r1"),
          min(col("c1")).as("c1"), min(col("a")).as("a"),
          round(min(col("lp_obs")).cast("double"), 6).as("lp_obs"),
          sum(when(col("k") >= col("a"), pTerm)
            .otherwise(lit(0.0).cast(DecimalType(16, 12))))
            .cast("double").as("pg0"),
          sum(when(col("lp") <= col("lp_obs") + lit(1e-7), pTerm)
            .otherwise(lit(0.0).cast(DecimalType(16, 12))))
            .cast("double").as("pt0"))
        .select(col("n"), col("r1"), col("c1"), col("a"), col("lp_obs"),
          round(col("pg0"), 9).as("p_greater"),
          round(col("pt0"), 9).as("p_two_sided"))
    }),

    // Odds ratio with the Woolf logit CI on the SAME bounded 2×2 as
    // q_stats_fisher_exact — the effect-size companion to that test's
    // p-value (a tiny p with OR ≈ 1 is a large-sample artifact; the CI
    // says whether the association is material). Cells are exact
    // integers; ln(OR) and se ride identical IEEE operands, the CI
    // endpoints pin exp at 4dp (the perplexity discipline).
    "q_stats_oddsratio" -> ((s, d) => {
      val o = t(s, d, "events")
        .filter(col("event_id") < FisherSample)
        .select((col("event_type") === "purchase").cast("long").as("x"),
          (col("value") >= 50.0).cast("long").as("y"))
      val m = o.agg(count(lit(1)).as("n"),
          sum(col("x") * col("y")).as("a"),
          sum(col("x") * (lit(1L) - col("y"))).as("b"),
          sum((lit(1L) - col("x")) * col("y")).as("c"),
          sum((lit(1L) - col("x")) * (lit(1L) - col("y"))).as("dd"))
        .filter(col("a") > 0 && col("b") > 0 && col("c") > 0 && col("dd") > 0)
      val or0 = (col("a") * col("dd")).cast("double") /
        (col("b") * col("c")).cast("double")
      val se0 = sqrt(lit(1.0) / col("a") + lit(1.0) / col("b") +
        lit(1.0) / col("c") + lit(1.0) / col("dd"))
      m.select(col("n"), col("a"), col("b"), col("c"), col("dd").as("d"),
        round(or0, 6).as("odds_ratio"),
        round(log(or0), 6).as("log_or"),
        round(se0, 6).as("se_log_or"),
        round(exp(log(or0) - lit(1.96) * se0), 4).as("ci_lo"),
        round(exp(log(or0) + lit(1.96) * se0), 4).as("ci_hi"))
    }),

    // Power analysis / sample-size calculator for the two-proportion
    // test — the experiment-design step BEFORE q_stats_two_prop runs:
    // given the observed purchase vs click conversion-to-high-value
    // rates, the minimum n per arm to detect that difference at
    // α=0.05 (two-sided) with 80% power is
    // n = (z_α/2+z_β)²·(p1q1+p2q2)/Δ². The z quantiles are compile-time
    // literals (identical in both engines); the p's are exact rationals
    // from one bounded aggregation; ceil of the one shared double is
    // the released integer.
    "q_stats_power" -> ((s, d) => {
      val ev = t(s, d, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .select((col("event_type") === "purchase").as("g1"),
          (col("value") >= 50.0).cast("long").as("y"))
      val agg = ev.agg(
        sum(when(col("g1"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("g1"), col("y")).otherwise(0L)).as("x1"),
        sum(when(!col("g1"), 1L).otherwise(0L)).as("n2"),
        sum(when(!col("g1"), col("y")).otherwise(0L)).as("x2"))
        .filter(col("n1") > 0 && col("n2") > 0)
      val p1 = col("x1").cast("double") / col("n1").cast("double")
      val p2 = col("x2").cast("double") / col("n2").cast("double")
      agg.select(col("n1"), col("x1"), col("n2"), col("x2"),
          round(p1, 6).as("p1"), round(p2, 6).as("p2"),
          round(p1 - p2, 6).as("delta"),
          (p1 * (lit(1.0) - p1) + p2 * (lit(1.0) - p2)).as("vsum0"),
          ((p1 - p2) * (p1 - p2)).as("d20"))
        .filter(col("d20") > 0)
        .select(col("n1"), col("x1"), col("n2"), col("x2"),
          col("p1"), col("p2"), col("delta"),
          ceil(lit((PowerZAlpha + PowerZBeta) * (PowerZAlpha + PowerZBeta)) *
            col("vsum0") / col("d20")).cast("long").as("n_per_arm"))
    }),

    // Cochran–Armitage trend test: is the fulfilled-rate MONOTONE in the
    // (ordered) order priority? The chi-square family only detects "some
    // difference"; the trend test spends its one degree of freedom on
    // the ordering, which is the question a priority dial actually
    // poses. With N-scaled kernels T_N = N·Σsa − A·Σsn and
    // Var·N³ = A(N−A)(N·Σs²n − (Σsn)²) everything is exact integers and
    // Z = T_N / √(VarN3/N) is three correctly-rounded IEEE ops. One
    // grouped count over orders, then a 5-row relation.
    "q_stats_trend" -> ((s, d) => {
      val g = t(s, d, "orders")
        .select(substring(col("o_orderpriority"), 1, 1).cast("long").as("sc"),
          (col("o_orderstatus") === "F").cast("long").as("y"))
        .groupBy("sc")
        .agg(count(lit(1)).as("ni"), sum(col("y")).as("ai"))
      g.agg(sum(col("ni")).cast(DecimalType(9, 0)).as("nn"),
          sum(col("ai")).cast(DecimalType(9, 0)).as("aa"),
          sum(col("sc") * col("ai")).cast(DecimalType(12, 0)).as("ssa"),
          sum(col("sc") * col("ni")).cast(DecimalType(12, 0)).as("ssn"),
          sum(col("sc") * col("sc") * col("ni")).cast(DecimalType(13, 0))
            .as("ss2n"),
          count(lit(1)).as("n_groups"))
        .select(col("nn").cast("long").as("n_total"),
          col("aa").cast("long").as("n_pos"), col("n_groups"),
          (col("nn") * col("ssa") - col("aa") * col("ssn"))
            .cast(DecimalType(24, 0)).as("tn"),
          // staged casts keep every decimal product under width 38 in
          // BOTH engines (DuckDB errors past 38; Spark silently clamps)
          ((col("aa") * (col("nn") - col("aa"))).cast(DecimalType(12, 0)) *
            (col("nn") * col("ss2n") - col("ssn") * col("ssn"))
              .cast(DecimalType(15, 0)))
            .cast(DecimalType(38, 0)).as("varn3"),
          col("nn").cast("double").as("nd"))
        .filter(col("varn3") > 0)
        .select(col("n_total"), col("n_pos"), col("n_groups"),
          round(col("tn").cast("double") /
            sqrt(col("varn3").cast("double") / col("nd")), 4).as("z_trend"))
    }),

    "q_stats_wilcoxon" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          cents(col("value")).as("c"))
      val u = withHalf(ev)
        .groupBy("user_id")
        .agg(sum(when(col("first_half"), col("c")).otherwise(0L)).as("s1"),
          sum(when(col("first_half"), 0L).otherwise(col("c"))).as("s2"))
        .select((col("s2") - col("s1")).as("d"))
        .filter(col("d") =!= 0)
        .select(col("d"), abs(col("d")).as("a"))
      // Distinct-|d| tie groups: cnt per group + how many are positive.
      val grp = u.groupBy("a")
        .agg(count(lit(1)).as("cnt"),
          sum(when(col("d") > 0, 1L).otherwise(0L)).as("pos"))
        .transform(graft.CacheScope.persisted(_))
      val rng = grp.agg(min(col("a")).as("a0"), max(col("a")).as("a1"))
      val sharded = grp.crossJoin(broadcast(rng))
        .withColumn("shard",
          expr(s"(a - a0) * $RankShards div (a1 - a0 + 1)"))
        .transform(graft.CacheScope.persisted(_))
      val totals = sharded.groupBy("shard").agg(sum(col("cnt")).as("t"))
      val bases = graft.text.TextAnalysisQueries
        .prefixBases(totals, "shard", desc = false)
      val cumBefore = sum(col("cnt")).over(
        Window.partitionBy("shard").orderBy("a")
          .rowsBetween(Window.unboundedPreceding, -1))
      val ranked = sharded.join(broadcast(bases), "shard")
        .select(col("pos"), col("cnt"),
          (col("base") + coalesce(cumBefore, lit(0L))).as("below"))
        .select(col("pos"), col("cnt"),
          (lit(2) * col("below") + col("cnt") + 1).as("rank2"))
      // n from the tie-group counts, W2+ from pos * rank2 — both exact.
      val m = ranked
        .agg(sum(col("cnt")).as("n"), sum(col("pos") * col("rank2")).as("w2"))
        .filter(col("n") > 0)
      m.select(col("n").cast("long").as("n_pairs"),
          (col("w2").cast("double") / 2).as("w_plus"),
          round((col("w2").cast("double") -
              (col("n") * (col("n") + 1)).cast("double") / 2) /
            sqrt((col("n") * (col("n") + 1) * (lit(2) * col("n") + 1)).cast("double") / 6),
            6).as("z"))
    }),

    // Jarque–Bera normality test of the per-type daily-total distribution:
    // JB = n/6 * (S^2 + (K-3)^2/4) from skewness and kurtosis. The daily
    // totals are exact cents; central moments come from power sums of the
    // SHIFTED series x - (s1 div n) — the integer shift keeps the decimal
    // power sums ~1e18 instead of ~1e32, far from both the DECIMAL(38)
    // clamp and the decimal->double conversion divergence (the
    // q_graph_assortativity lesson). The moment formulas then run on
    // identical doubles in both engines, pinned at 6dp. Scale shape: one
    // events-sized agg to type×day, a broadcast per-type shift join, one
    // bounded agg — no window, no collect.
    "q_stats_jarque_bera" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(sum(cents(col("value"))).as("x"))
        .transform(graft.CacheScope.persisted(_))
      // Integer `div` for the shift in BOTH engines: Spark casts
      // double->long by truncation but DuckDB ROUNDS, so a double mean
      // here would silently diverge.
      val shift = daily.groupBy("event_type")
        .agg(expr("sum(x) div count(1)").as("m0"))
      val xc = (col("x") - col("m0")).cast(DecimalType(12, 0))
      // s4's factors are DECIMAL(19): 19+19=38 is the widest product
      // BOTH engines accept (DuckDB errors past 38 rather than clamping);
      // values fit while |xc| <= ~3e9 cents — the documented dial.
      val m = daily.join(broadcast(shift), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(xc).as("s1d"),
          sum(xc * xc).as("s2d"),
          sum((xc * xc).cast(DecimalType(24, 0)) * xc).as("s3d"),
          sum((xc * xc).cast(DecimalType(19, 0)) *
            (xc * xc).cast(DecimalType(19, 0))).as("s4d"))
        .filter(col("n") >= 8 &&
          col("n") * col("s2d") - col("s1d") * col("s1d") > 0)
        .select(col("event_type"), col("n"),
          col("n").cast("double").as("nd"), col("s1d").cast("double").as("p1"),
          col("s2d").cast("double").as("p2"), col("s3d").cast("double").as("p3"),
          col("s4d").cast("double").as("p4"))
      // Identical-text double formulas (see matching oracle SQL).
      m.select(col("event_type"), col("n").cast("long").as("n_days"),
          expr("p1 / nd").as("mu"), col("nd"), col("p2"), col("p3"), col("p4"))
        .select(col("event_type"), col("n_days"),
          expr("p2 / nd - mu * mu").as("m2"),
          expr("p3 / nd - 3 * mu * (p2 / nd) + 2 * mu * mu * mu").as("m3"),
          expr("p4 / nd - 4 * mu * (p3 / nd) + 6 * mu * mu * (p2 / nd) " +
            "- 3 * mu * mu * mu * mu").as("m4"),
          col("nd"))
        .select(col("event_type"), col("n_days"),
          expr("m3 / (m2 * sqrt(m2))").as("skew"),
          expr("m4 / (m2 * m2)").as("kurt"), col("nd"))
        .select(col("event_type"), col("n_days"),
          round(col("skew"), 6).as("skewness"),
          round(col("kurt"), 6).as("kurtosis"),
          round(expr("nd / 6 * (skew * skew + (kurt - 3) * (kurt - 3) / 4)"),
            6).as("jb"))
    }),

    // Cramér's V: the [0,1] effect size of the event_type × time-of-day
    // association that q_stats_chisq tests — V = sqrt(chi2 / (n *
    // min(r-1, c-1))). A chi-squared p-value at 100 TB is always ~0
    // (everything is "significant" at n=1e12); V is the number that
    // still means something, which is why it ships as its own operator.
    // Same exact-margins + round(,6)-pinned-contribution DECIMAL sum as
    // q_stats_chisq; one row out.
    "q_stats_cramers_v" -> ((s, d) => {
      val cells = t(s, d, "events")
        .groupBy(col("event_type"), (hour(col("ts")) / lit(6)).cast("int").as("bucket"))
        .agg(count(lit(1)).as("o"))
        .transform(graft.CacheScope.persisted(_))
      val rt = cells.groupBy("event_type").agg(sum(col("o")).as("rt"))
      val ct = cells.groupBy("bucket").agg(sum(col("o")).as("ct"))
      val g = cells.agg(sum(col("o")).as("n"),
        countDistinct(col("event_type")).as("r"),
        countDistinct(col("bucket")).as("c"))
      val e = (col("rt") * col("ct")).cast("double") / col("n").cast("double")
      val contrib = round((col("o").cast("double") - e) *
        (col("o").cast("double") - e) / e, 6)
      val chi2 = cells.join(rt, "event_type").join(ct, "bucket")
        .crossJoin(broadcast(g))
        .select(contrib.cast(DecimalType(18, 6)).as("contrib"))
        .agg(sum(col("contrib")).cast("double").as("chi2"))
      g.crossJoin(broadcast(chi2))
        .select(col("n").cast("long").as("n"), col("r").cast("long").as("r"),
          col("c").cast("long").as("c"), col("chi2"),
          round(sqrt(col("chi2") /
            (col("n").cast("double") * least(col("r") - 1, col("c") - 1).cast("double"))),
            6).as("cramers_v"))
    }),

    // Cohen's d per event type: the standardized first-half vs
    // second-half mean shift — the effect size behind q_stats_ttest's
    // significance answer, and the threshold a retraining trigger should
    // gate on instead of a p-value (same rationale as Cramér's V at
    // scale). Variances from exact cents sums; pooled sd and d on
    // identical doubles; means reported in currency units. Scale shape:
    // one 1-row range broadcast + one events-sized agg to type×half.
    "q_stats_cohens_d" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"), unix_micros(col("ts")).as("us"),
          cents(col("value")).as("c"))
      val h = withHalf(ev)
        .groupBy("event_type")
        .agg(
          sum(when(col("first_half"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("first_half"), col("c")).otherwise(0L)).as("t1"),
          sum(when(col("first_half"), col("c") * col("c")).otherwise(0L)).as("q1"),
          sum(when(col("first_half"), 0L).otherwise(1L)).as("n2"),
          sum(when(col("first_half"), 0L).otherwise(col("c"))).as("t2"),
          sum(when(col("first_half"), 0L).otherwise(col("c") * col("c"))).as("q2"))
        .filter(col("n1") >= 2 && col("n2") >= 2)
      val v1 = (col("n1").cast("double") * col("q1").cast("double") -
        col("t1").cast("double") * col("t1").cast("double")) /
        (col("n1").cast("double") * (col("n1").cast("double") - 1))
      val v2 = (col("n2").cast("double") * col("q2").cast("double") -
        col("t2").cast("double") * col("t2").cast("double")) /
        (col("n2").cast("double") * (col("n2").cast("double") - 1))
      val sp2 = ((col("n1").cast("double") - 1) * v1 +
        (col("n2").cast("double") - 1) * v2) /
        (col("n1").cast("double") + col("n2").cast("double") - 2)
      h.filter(sp2 > 0)
        .select(col("event_type"), col("n1"), col("n2"),
          round(col("t1").cast("double") / col("n1").cast("double") / 100, 4).as("mean_first"),
          round(col("t2").cast("double") / col("n2").cast("double") / 100, 4).as("mean_second"),
          round((col("t2").cast("double") / col("n2").cast("double") -
            col("t1").cast("double") / col("n1").cast("double")) / sqrt(sp2),
            6).as("cohens_d"))
    }),

    // Grubbs max-outlier: for each event type, the single day whose total
    // deviates most from the type mean, with its test statistic
    // G = |x - mean| / sd. The day is selected by the EXACT integer
    // deviation |n*x - s1| (ties break to the earliest day) via ONE
    // max(struct) aggregation — the q_graph_mst min-edge discipline, no
    // window, no double ordering anywhere. G itself is identical doubles
    // pinned at 6dp.
    "q_stats_grubbs" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(sum(cents(col("value"))).as("x"))
        .transform(graft.CacheScope.persisted(_))
      // The variance gate runs on DECIMALs: s1*s1 as long*long would wrap
      // silently past 9.2e18 (s1 is a whole-type cents total).
      val m = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
          sum(col("x").cast(DecimalType(18, 0)) * col("x")).as("s2"))
        .filter(col("n") >= 3 &&
          col("n") * col("s2") -
            col("s1").cast(DecimalType(18, 0)) * col("s1") > 0)
      val dev = abs(col("n") * col("x") - col("s1"))
      val picked = daily.join(broadcast(m), "event_type")
        .select(col("event_type"), col("n"), col("s1"), col("s2"),
          struct(dev.as("dev"),
            (-datediff(col("day"), to_date(lit("1970-01-01")))).as("negday"),
            col("x").as("x")).as("cand"))
        .groupBy("event_type")
        .agg(first(col("n")).as("n"), first(col("s1")).as("s1"),
          first(col("s2")).as("s2"), max(col("cand")).as("top"))
      val sd = sqrt((col("n").cast("double") * col("s2").cast("double") -
        col("s1").cast("double") * col("s1").cast("double")) /
        (col("n").cast("double") * (col("n").cast("double") - 1)))
      picked.select(col("event_type"), col("n").cast("long").as("n_days"),
        date_format(date_add(to_date(lit("1970-01-01")),
          (-col("top.negday")).cast("int")), "yyyy-MM-dd").as("outlier_day"),
        round(col("top.x").cast("double") / 100, 2).as("outlier_value"),
        round(col("top.dev").cast("double") / col("n").cast("double") / sd,
          6).as("grubbs_g"))
    }),

    // Granger-causality screen over every ordered pair of event types:
    // does x's lagged daily total improve the AR(1) fit of y's?
    // F = ((SSE_r − SSE_u)/1) / (SSE_u/(n−3)) between the restricted
    // (y_t ~ y_{t−1}) and unrestricted (y_t ~ y_{t−1} + x_{t−1}) OLS —
    // the standard lead/lag dependency triage before building any
    // cross-series model. Arithmetic: daily totals in integer HUNDREDS
    // of currency shifted by each type's integer-div mean (the
    // q_stats_jarque_bera discipline), so every moment is an exact int64
    // sum with |xc| ≤ ~1e4 at sf0.1 and all closed-form algebra runs on
    // identical doubles. Scale shape: one events-sized agg, one lag
    // window per type, then a day equi-join fanned only by the bounded
    // |types|² pair count; "previous" means each series' previous
    // OBSERVATION (the daily grid is dense in this corpus).
    "q_ts_granger" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(sum(cents(col("value"))).as("c"))
        .withColumn("v", expr("c div 10000"))
      val shift = daily.groupBy("event_type")
        .agg(expr("sum(v) div count(1)").as("m0"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val lagd = daily.join(broadcast(shift), "event_type")
        .select(col("event_type"), col("day"), (col("v") - col("m0")).as("xc"))
        .withColumn("xl", lag(col("xc"), 1).over(w))
        .filter(col("xl").isNotNull)
        .transform(graft.CacheScope.persisted(_))
      val xs = lagd.select(col("event_type").as("x_type"), col("day"),
        col("xl").as("x1"))
      val ys = lagd.select(col("event_type").as("y_type"), col("day"),
        col("xc").as("y0"), col("xl").as("y1"))
      val m = ys.join(xs, "day").filter(col("x_type") =!= col("y_type"))
        .groupBy("x_type", "y_type")
        .agg(count(lit(1)).as("n"),
          sum(col("y0")).as("sy"), sum(col("y1")).as("sy1"),
          sum(col("x1")).as("sx1"),
          sum(col("y0") * col("y0")).as("syy"),
          sum(col("y1") * col("y1")).as("sy1y1"),
          sum(col("x1") * col("x1")).as("sx1x1"),
          sum(col("y0") * col("y1")).as("syy1"),
          sum(col("y0") * col("x1")).as("syx1"),
          sum(col("y1") * col("x1")).as("sy1x1"))
        .filter(col("n") >= 10)
        .select(col("x_type"), col("y_type"), col("n"),
          col("n").cast("double").as("nd"),
          col("sy").cast("double").as("syd"), col("sy1").cast("double").as("sy1d"),
          col("sx1").cast("double").as("sx1d"), col("syy").cast("double").as("syyd"),
          col("sy1y1").cast("double").as("sy1y1d"),
          col("sx1x1").cast("double").as("sx1x1d"),
          col("syy1").cast("double").as("syy1d"),
          col("syx1").cast("double").as("syx1d"),
          col("sy1x1").cast("double").as("sy1x1d"))
      // Identical-text double formulas (see the matching oracle SQL).
      m.select(col("x_type"), col("y_type"), col("n"), col("nd"),
          expr("syyd - syd * syd / nd").as("myy"),
          expr("sy1y1d - sy1d * sy1d / nd").as("a11"),
          expr("sx1x1d - sx1d * sx1d / nd").as("a22"),
          expr("sy1x1d - sy1d * sx1d / nd").as("a12"),
          expr("syy1d - syd * sy1d / nd").as("c1"),
          expr("syx1d - syd * sx1d / nd").as("c2"))
        .filter(col("a11") > 0 && col("a22") > 0 &&
          expr("a11 * a22 - a12 * a12") > 0)
        .select(col("x_type"), col("y_type"), col("n"), col("nd"),
          col("myy"), col("c1"), col("c2"),
          expr("myy - c1 * c1 / a11").as("sse_r"),
          expr("(a22 * c1 - a12 * c2) / (a11 * a22 - a12 * a12)").as("b1"),
          expr("(a11 * c2 - a12 * c1) / (a11 * a22 - a12 * a12)").as("b2"))
        .select(col("x_type"), col("y_type"), col("n"), col("nd"),
          col("sse_r"), col("b2"),
          expr("myy - (b1 * c1 + b2 * c2)").as("sse_u"))
        .filter(col("sse_u") > 0)
        .select(col("x_type"), col("y_type"), col("n").cast("long").as("n_days"),
          round(col("b2"), 6).as("cross_coef"),
          round(expr("(sse_r - sse_u) / (sse_u / (nd - 3))"), 6).as("f_stat"))
    }),

    // Wald–Wolfowitz runs test: is each type's daily-total series RANDOM
    // around its mean, or does it trend/oscillate? The independence check
    // that belongs before any i.i.d.-assuming test above. Above/below is
    // the EXACT integer comparison n*x > s1 (ties count as below — a
    // deterministic convention both engines share); runs count from one
    // lag window over the bounded per-type daily relation; the normal
    // approximation z assembles on identical doubles. Scale shape: one
    // events-sized agg, one broadcast mean join, one partitioned window.
    "q_stats_runs" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(sum(cents(col("value"))).as("x"))
        .transform(graft.CacheScope.persisted(_))
      val m = daily.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val signed = daily.join(broadcast(m), "event_type")
        .select(col("event_type"),
          col("day"), (col("n") * col("x") > col("s1")).as("up"))
      val agg = signed
        .withColumn("brk",
          when(lag(col("up"), 1).over(w).isNull ||
            lag(col("up"), 1).over(w) =!= col("up"), 1L).otherwise(0L))
        .groupBy("event_type")
        .agg(count(lit(1)).as("nd"),
          sum(when(col("up"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("up"), 0L).otherwise(1L)).as("n2"),
          sum(col("brk")).as("runs"))
        .filter(col("n1") > 0 && col("n2") > 0 && col("nd") >= 3)
      val n1d = col("n1").cast("double")
      val n2d = col("n2").cast("double")
      val nd = n1d + n2d
      val mu = lit(2.0) * n1d * n2d / nd + 1
      val v = lit(2.0) * n1d * n2d * (lit(2.0) * n1d * n2d - nd) /
        (nd * nd * (nd - 1))
      agg.filter(v > 0)
        .select(col("event_type"), col("nd").cast("long").as("n_days"),
          col("n1").cast("long").as("n_above"),
          col("n2").cast("long").as("n_below"),
          col("runs").cast("long").as("runs"),
          round((col("runs").cast("double") - mu) / sqrt(v), 6).as("z"))
    }),

    // Friedman test: do the event types RANK consistently within each
    // day (blocked repeated-measures), or is the daily ordering noise?
    // The blocked sibling of q_stats_kruskal (independent samples) —
    // day-level market effects cancel because ranking happens INSIDE
    // each day. Ranks are the exact 2×-average-rank integers
    // (2·cntBelow + tieCnt + 1) from a day-keyed self-join whose fan-out
    // is |types|² per day — bounded, no window, no global sort; only
    // COMPLETE blocks (days where every type traded) enter, the
    // textbook requirement. χ² assembles on identical doubles.
    "q_stats_friedman" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(sum(cents(col("value"))).as("x"))
        .transform(graft.CacheScope.persisted(_))
      val k = daily.agg(countDistinct(col("event_type")).as("k"))
      val complete = daily.groupBy("day").agg(count(lit(1)).as("c"))
        .crossJoin(broadcast(k)).filter(col("c") === col("k"))
        .select(col("day"))
      val blocks = daily.join(complete, "day")
        .transform(graft.CacheScope.persisted(_))
      val rank2 = blocks.as("a")
        .join(blocks.select(col("day").as("bd"), col("x").as("bx")).as("b"),
          col("a.day") === col("bd"))
        .groupBy(col("a.day").as("day"), col("a.event_type").as("event_type"))
        .agg((lit(2) * sum(when(col("bx") < col("a.x"), 1L).otherwise(0L)) +
          sum(when(col("bx") === col("a.x"), 1L).otherwise(0L)) + 1).as("r2"))
      val sums = rank2.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum(col("r2")).as("rj2"))
        .transform(graft.CacheScope.persisted(_))
      val chi = sums.crossJoin(broadcast(k))
        .agg(first(col("k")).as("k"), first(col("n")).as("n"),
          sum(col("rj2") * col("rj2")).as("sr2"))
        .filter(col("n") > 0 && col("k") >= 2)
        .select(col("k"),
          round(lit(3.0) * col("sr2").cast("double") /
            (col("n").cast("double") * col("k").cast("double") *
              (col("k").cast("double") + 1)) -
            lit(3.0) * col("n").cast("double") * (col("k").cast("double") + 1),
            6).as("chi2"))
      sums.crossJoin(broadcast(chi))
        .select(col("event_type"), col("n").cast("long").as("n_blocks"),
          round(col("rj2").cast("double") / (lit(2.0) * col("n").cast("double")),
            6).as("mean_rank"),
          col("k").cast("long").as("k"), col("chi2"))
    }),

    // Generalized ESD (Rosner): the top-EsdRounds outliers per event
    // type by REPEATED Grubbs rounds — after each pick the day is
    // REMOVED and mean/sd recomputed, which is what lets ESD find
    // multiple outliers where a single Grubbs test masks (two spikes
    // inflate each other's sd). Selection stays the exact-integer
    // |n·x − s1| max-struct (ties to the earliest day); each round's
    // removal is one anti-join; rounds are unrolled (a dial, not a
    // loop), so the oracle unrolls the same three CTEs.
    "q_stats_esd" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(sum(cents(col("value"))).as("x"))
        .transform(graft.CacheScope.persisted(_))
      var rem = daily
      val rounds = (1 to EsdRounds).map { i =>
        val m = rem.groupBy("event_type")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("s1"),
            sum(col("x").cast(DecimalType(18, 0)) * col("x")).as("s2"))
          .filter(col("n") >= 3 &&
            col("n") * col("s2") -
              col("s1").cast(DecimalType(18, 0)) * col("s1") > 0)
        val dev = abs(col("n") * col("x") - col("s1"))
        val picked = rem.join(broadcast(m), "event_type")
          .select(col("event_type"), col("n"), col("s1"), col("s2"),
            struct(dev.as("dev"),
              (-datediff(col("day"), to_date(lit("1970-01-01")))).as("negday"),
              col("x").as("x")).as("cand"))
          .groupBy("event_type")
          .agg(first(col("n")).as("n"), first(col("s1")).as("s1"),
            first(col("s2")).as("s2"), max(col("cand")).as("top"))
          .transform(graft.CacheScope.persisted(_))
        val sd = sqrt((col("n").cast("double") * col("s2").cast("double") -
          col("s1").cast("double") * col("s1").cast("double")) /
          (col("n").cast("double") * (col("n").cast("double") - 1)))
        val out = picked.select(col("event_type"), lit(i).as("round"),
          date_format(date_add(to_date(lit("1970-01-01")),
            (-col("top.negday")).cast("int")), "yyyy-MM-dd").as("outlier_day"),
          round(col("top.x").cast("double") / 100, 2).as("outlier_value"),
          round(col("top.dev").cast("double") / col("n").cast("double") / sd,
            6).as("r_stat"))
        rem = rem.join(picked.select(col("event_type").as("pt"),
            date_add(to_date(lit("1970-01-01")),
              (-col("top.negday")).cast("int")).as("pd")),
          rem("event_type") === col("pt") && rem("day") === col("pd"),
          "left_anti")
        out
      }
      rounds.reduce(_.unionByName(_))
    }),

    // Chow structural-break test: did each type's AR(1) dynamics CHANGE
    // between the calendar halves of the range? Pooled vs split-sample
    // least squares on y_t ~ y_{t−1}: F = ((SSE_p − SSE_1 − SSE_2)/2) /
    // ((SSE_1 + SSE_2)/(n−4)) — the regime-shift sibling of
    // q_ts_granger's nested-model F, and the test behind "did the
    // pipeline change the data's dynamics, or just its level?". Same
    // exact-integer moment discipline (hundreds units, integer-div mean
    // shift, lag window per type); the half split is integer DATE
    // arithmetic on each type's own range.
    "q_ts_chow" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(sum(cents(col("value"))).as("c"))
        .withColumn("v", expr("c div 10000"))
      val shift = daily.groupBy("event_type")
        .agg(expr("sum(v) div count(1)").as("m0"),
          min(col("day")).as("d0"), max(col("day")).as("d1"))
      val w = Window.partitionBy("event_type").orderBy("day")
      val lagd = daily.join(broadcast(shift), "event_type")
        .select(col("event_type"), col("day"), (col("v") - col("m0")).as("y"),
          (col("day") < date_add(col("d0"),
            (datediff(col("d1"), col("d0")) / 2).cast("int"))).as("first_half"))
        .withColumn("y1", lag(col("y"), 1).over(w))
        .filter(col("y1").isNotNull)
      def moments(df: DataFrame, seg: String) = df.groupBy("event_type")
        .agg(count(lit(1)).as(s"n$seg"),
          sum(col("y")).as(s"sy$seg"), sum(col("y1")).as(s"sx$seg"),
          sum(col("y") * col("y")).as(s"syy$seg"),
          sum(col("y1") * col("y1")).as(s"sxx$seg"),
          sum(col("y") * col("y1")).as(s"sxy$seg"))
      val mp = moments(lagd, "p")
      val m1 = moments(lagd.filter(col("first_half")), "1")
      val m2 = moments(lagd.filter(!col("first_half")), "2")
      def sse(seg: String) = expr(
        s"(syy${seg}d - sy${seg}d * sy${seg}d / n${seg}d) - " +
          s"(sxy${seg}d - sy${seg}d * sx${seg}d / n${seg}d) * " +
          s"(sxy${seg}d - sy${seg}d * sx${seg}d / n${seg}d) / " +
          s"(sxx${seg}d - sx${seg}d * sx${seg}d / n${seg}d)")
      val j = mp.join(m1, "event_type").join(m2, "event_type")
        .filter(col("n1") >= 4 && col("n2") >= 4)
      val jd = Seq("p", "1", "2").foldLeft(j) { (df, seg) =>
        df.withColumn(s"n${seg}d", col(s"n$seg").cast("double"))
          .withColumn(s"sy${seg}d", col(s"sy$seg").cast("double"))
          .withColumn(s"sx${seg}d", col(s"sx$seg").cast("double"))
          .withColumn(s"syy${seg}d", col(s"syy$seg").cast("double"))
          .withColumn(s"sxx${seg}d", col(s"sxx$seg").cast("double"))
          .withColumn(s"sxy${seg}d", col(s"sxy$seg").cast("double"))
      }
        .filter(expr("sxxpd - sxpd * sxpd / npd") > 0 &&
          expr("sxx1d - sx1d * sx1d / n1d") > 0 &&
          expr("sxx2d - sx2d * sx2d / n2d") > 0)
        .withColumn("sse_p", sse("p"))
        .withColumn("sse_s", sse("1") + sse("2"))
        .filter(col("sse_s") > 0)
      jd.select(col("event_type"),
        col("n1").cast("long").as("n_first"),
        col("n2").cast("long").as("n_second"),
        round(expr("((sse_p - sse_s) / 2) / (sse_s / (n1d + n2d - 4))"), 6)
          .as("f_stat"))
    }),

    // Two-proportion z-test: did the error RATE (share of 'error' events)
    // change between the first and second half of the range? The
    // categorical sibling of q_stats_ttest — exact counts, pooled
    // p-hat, identical-double z, one row out.
    "q_stats_two_prop" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"), unix_micros(col("ts")).as("us"),
          cents(col("value")).as("c"))
      val agg = withHalf(ev).agg(
        sum(when(col("first_half"), 1L).otherwise(0L)).as("n1"),
        sum(when(col("first_half") && col("event_type") === "error", 1L)
          .otherwise(0L)).as("x1"),
        sum(when(col("first_half"), 0L).otherwise(1L)).as("n2"),
        sum(when(!col("first_half") && col("event_type") === "error", 1L)
          .otherwise(0L)).as("x2"))
        .filter(col("n1") > 0 && col("n2") > 0 &&
          col("x1") + col("x2") > 0 && col("x1") + col("x2") < col("n1") + col("n2"))
      val p1 = col("x1").cast("double") / col("n1").cast("double")
      val p2 = col("x2").cast("double") / col("n2").cast("double")
      val ph = (col("x1") + col("x2")).cast("double") /
        (col("n1") + col("n2")).cast("double")
      agg.select(col("n1"), col("x1"), col("n2"), col("x2"),
        round(p1, 6).as("p_first"), round(p2, 6).as("p_second"),
        round((p1 - p2) /
          sqrt(ph * (lit(1) - ph) *
            (lit(1.0) / col("n1").cast("double") + lit(1.0) / col("n2").cast("double"))),
          6).as("z"))
    }))

  override val oracles: Map[String, String] = Map(

    "q_stats_oddsratio" ->
      s"""WITH o AS (
         |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x,
         |         CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS y
         |  FROM events WHERE event_id < $FisherSample
         |), m AS (
         |  SELECT count(*) AS n,
         |         CAST(sum(x * y) AS BIGINT) AS a,
         |         CAST(sum(x * (1 - y)) AS BIGINT) AS b,
         |         CAST(sum((1 - x) * y) AS BIGINT) AS c,
         |         CAST(sum((1 - x) * (1 - y)) AS BIGINT) AS dd
         |  FROM o
         |), k AS (
         |  SELECT n, a, b, c, dd,
         |         CAST(a * dd AS DOUBLE) / CAST(b * c AS DOUBLE) AS or0,
         |         sqrt(1.0 / a + 1.0 / b + 1.0 / c + 1.0 / dd) AS se0
         |  FROM m WHERE a > 0 AND b > 0 AND c > 0 AND dd > 0
         |)
         |SELECT n, a, b, c, dd AS d,
         |       round(or0, 6) AS odds_ratio,
         |       round(ln(or0), 6) AS log_or,
         |       round(se0, 6) AS se_log_or,
         |       round(exp(ln(or0) - 1.96 * se0), 4) AS ci_lo,
         |       round(exp(ln(or0) + 1.96 * se0), 4) AS ci_hi
         |FROM k""".stripMargin,

    "q_stats_power" ->
      s"""WITH ev AS (
         |  SELECT event_type = 'purchase' AS g1,
         |         CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS y
         |  FROM events WHERE event_type IN ('purchase', 'click')
         |), agg AS (
         |  SELECT CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         |         CAST(sum(CASE WHEN g1 THEN y ELSE 0 END) AS BIGINT) AS x1,
         |         CAST(sum(CASE WHEN NOT g1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
         |         CAST(sum(CASE WHEN NOT g1 THEN y ELSE 0 END) AS BIGINT) AS x2
         |  FROM ev
         |), k AS (
         |  SELECT n1, x1, n2, x2,
         |         CAST(x1 AS DOUBLE) / n1 AS p1r,
         |         CAST(x2 AS DOUBLE) / n2 AS p2r
         |  FROM agg WHERE n1 > 0 AND n2 > 0
         |)
         |SELECT n1, x1, n2, x2,
         |       round(p1r, 6) AS p1, round(p2r, 6) AS p2,
         |       round(p1r - p2r, 6) AS delta,
         |       CAST(ceil(($PowerZAlpha + $PowerZBeta) * ($PowerZAlpha + $PowerZBeta) *
         |            (p1r * (1.0 - p1r) + p2r * (1.0 - p2r)) /
         |            ((p1r - p2r) * (p1r - p2r))) AS BIGINT) AS n_per_arm
         |FROM k WHERE (p1r - p2r) * (p1r - p2r) > 0""".stripMargin,

    "q_stats_trend" ->
      s"""WITH g AS (
         |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS sc,
         |         count(*) AS ni,
         |         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
         |              AS BIGINT) AS ai
         |  FROM orders GROUP BY 1
         |), m AS (
         |  SELECT CAST(sum(ni) AS DECIMAL(9,0)) AS nn,
         |         CAST(sum(ai) AS DECIMAL(9,0)) AS aa,
         |         CAST(sum(sc * ai) AS DECIMAL(12,0)) AS ssa,
         |         CAST(sum(sc * ni) AS DECIMAL(12,0)) AS ssn,
         |         CAST(sum(sc * sc * ni) AS DECIMAL(13,0)) AS ss2n,
         |         count(*) AS n_groups
         |  FROM g
         |), k AS (
         |  SELECT CAST(nn AS BIGINT) AS n_total, CAST(aa AS BIGINT) AS n_pos,
         |         n_groups,
         |         CAST(nn * ssa - aa * ssn AS DECIMAL(24,0)) AS tn,
         |         CAST(CAST(aa * (nn - aa) AS DECIMAL(12,0)) *
         |              CAST(nn * ss2n - ssn * ssn AS DECIMAL(15,0))
         |              AS DECIMAL(38,0)) AS varn3,
         |         CAST(nn AS DOUBLE) AS nd
         |  FROM m
         |)
         |SELECT n_total, n_pos, n_groups,
         |       round(CAST(tn AS DOUBLE) /
         |             sqrt(CAST(varn3 AS DOUBLE) / nd), 4) AS z_trend
         |FROM k WHERE varn3 > 0""".stripMargin,

    "q_stats_fisher_exact" ->
      s"""WITH o AS (
         |  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS x,
         |         CASE WHEN value >= 50.0 THEN 1 ELSE 0 END AS y
         |  FROM events WHERE event_id < $FisherSample
         |), m AS (
         |  SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS r1,
         |         CAST(sum(y) AS BIGINT) AS c1, CAST(sum(x * y) AS BIGINT) AS a
         |  FROM o
         |), lgn AS (
         |  SELECT CAST(sum(CAST(round(ln(CAST(n - c1 + i AS DOUBLE) / i), 9)
         |                       AS DECIMAL(28,9))) AS DECIMAL(28,9)) AS lgn
         |  FROM (SELECT n, c1, unnest(range(1, c1 + 1)) AS i FROM m)
         |), ks AS (
         |  SELECT n, r1, c1, a,
         |         unnest(range(greatest(0, r1 + c1 - n), least(r1, c1) + 1)) AS k
         |  FROM m
         |), t1 AS (
         |  SELECT k, CAST(sum(CAST(round(ln(CAST(r1 - k + i AS DOUBLE) / i), 9)
         |                          AS DECIMAL(28,9))) AS DECIMAL(28,9)) AS lg1
         |  FROM (SELECT k, r1, unnest(range(1, k + 1)) AS i FROM ks) GROUP BY k
         |), t2 AS (
         |  SELECT k, CAST(sum(CAST(round(ln(CAST(n - r1 - (c1 - k) + i AS DOUBLE) / i), 9)
         |                          AS DECIMAL(28,9))) AS DECIMAL(28,9)) AS lg2
         |  FROM (SELECT k, n, r1, c1, unnest(range(1, c1 - k + 1)) AS i FROM ks)
         |  GROUP BY k
         |), lp AS (
         |  SELECT ks.n, ks.r1, ks.c1, ks.a, ks.k,
         |         COALESCE(t1.lg1, CAST(0.0 AS DECIMAL(28,9)))
         |           + COALESCE(t2.lg2, CAST(0.0 AS DECIMAL(28,9)))
         |           - lgn.lgn AS lp
         |  FROM ks LEFT JOIN t1 USING (k) LEFT JOIN t2 USING (k) CROSS JOIN lgn
         |), obs AS (SELECT lp AS lp_obs FROM lp WHERE k = a)
         |SELECT min(lp.n) AS n, min(lp.r1) AS r1, min(lp.c1) AS c1,
         |       min(lp.a) AS a,
         |       round(CAST(min(o.lp_obs) AS DOUBLE), 6) AS lp_obs,
         |       round(CAST(sum(CASE WHEN lp.k >= lp.a
         |                  THEN CAST(round(exp(CAST(lp.lp AS DOUBLE)), 12) AS DECIMAL(16,12))
         |                  ELSE CAST(0.0 AS DECIMAL(16,12)) END) AS DOUBLE), 9)
         |         AS p_greater,
         |       round(CAST(sum(CASE WHEN CAST(lp.lp AS DOUBLE) <= CAST(o.lp_obs AS DOUBLE) + 1e-7
         |                  THEN CAST(round(exp(CAST(lp.lp AS DOUBLE)), 12) AS DECIMAL(16,12))
         |                  ELSE CAST(0.0 AS DECIMAL(16,12)) END) AS DOUBLE), 9)
         |         AS p_two_sided
         |FROM lp CROSS JOIN obs o""".stripMargin,

    "q_stats_wilcoxon" ->
      s"""$HalfSql, u AS (
         |  SELECT user_id,
         |         sum(CASE WHEN first_half THEN c ELSE 0 END) AS s1,
         |         sum(CASE WHEN first_half THEN 0 ELSE c END) AS s2
         |  FROM h GROUP BY 1
         |), dd AS (
         |  SELECT s2 - s1 AS d, abs(s2 - s1) AS a FROM u WHERE s2 <> s1
         |), r AS (
         |  SELECT d, 2 * rank() OVER (ORDER BY a)
         |            + count(*) OVER (PARTITION BY a) - 1 AS rank2
         |  FROM dd
         |), agg AS (
         |  SELECT count(*) AS n,
         |         sum(CASE WHEN d > 0 THEN rank2 ELSE 0 END) AS w2
         |  FROM r
         |)
         |SELECT CAST(n AS BIGINT) AS n_pairs,
         |       CAST(w2 AS DOUBLE) / 2 AS w_plus,
         |       round((CAST(w2 AS DOUBLE) - CAST(n * (n + 1) AS DOUBLE) / 2) /
         |             sqrt(CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE) / 6),
         |             6) AS z
         |FROM agg WHERE n > 0""".stripMargin,

    "q_stats_jarque_bera" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         sum($CentsSql) AS x
         |  FROM events GROUP BY 1, 2
         |), shift AS (
         |  SELECT event_type, CAST(sum(x) AS BIGINT) // count(*) AS m0
         |  FROM daily GROUP BY 1
         |), mm AS (
         |  SELECT d.event_type, count(*) AS n,
         |         sum(CAST(d.x - s.m0 AS DECIMAL(12,0))) AS s1d,
         |         sum(CAST(d.x - s.m0 AS DECIMAL(12,0)) *
         |             CAST(d.x - s.m0 AS DECIMAL(12,0))) AS s2d,
         |         sum(CAST(CAST(d.x - s.m0 AS DECIMAL(12,0)) *
         |                  CAST(d.x - s.m0 AS DECIMAL(12,0)) AS DECIMAL(24,0)) *
         |             CAST(d.x - s.m0 AS DECIMAL(12,0))) AS s3d,
         |         sum(CAST(CAST(d.x - s.m0 AS DECIMAL(12,0)) *
         |                  CAST(d.x - s.m0 AS DECIMAL(12,0)) AS DECIMAL(19,0)) *
         |             CAST(CAST(d.x - s.m0 AS DECIMAL(12,0)) *
         |                  CAST(d.x - s.m0 AS DECIMAL(12,0)) AS DECIMAL(19,0))) AS s4d
         |  FROM daily d JOIN shift s ON s.event_type = d.event_type
         |  GROUP BY 1
         |), f AS (
         |  SELECT event_type, n, CAST(n AS DOUBLE) AS nd,
         |         CAST(s1d AS DOUBLE) AS p1, CAST(s2d AS DOUBLE) AS p2,
         |         CAST(s3d AS DOUBLE) AS p3, CAST(s4d AS DOUBLE) AS p4
         |  FROM mm WHERE n >= 8 AND n * s2d - s1d * s1d > 0
         |), c1 AS (
         |  SELECT event_type, n, nd, p1 / nd AS mu, p2, p3, p4 FROM f
         |), c2 AS (
         |  SELECT event_type, n, nd,
         |         p2 / nd - mu * mu AS m2,
         |         p3 / nd - 3 * mu * (p2 / nd) + 2 * mu * mu * mu AS m3,
         |         p4 / nd - 4 * mu * (p3 / nd) + 6 * mu * mu * (p2 / nd)
         |           - 3 * mu * mu * mu * mu AS m4
         |  FROM c1
         |), c3 AS (
         |  SELECT event_type, n, nd,
         |         m3 / (m2 * sqrt(m2)) AS skew, m4 / (m2 * m2) AS kurt
         |  FROM c2
         |)
         |SELECT event_type, CAST(n AS BIGINT) AS n_days,
         |       round(skew, 6) AS skewness, round(kurt, 6) AS kurtosis,
         |       round(nd / 6 * (skew * skew + (kurt - 3) * (kurt - 3) / 4), 6) AS jb
         |FROM c3""".stripMargin,

    "q_stats_cramers_v" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(hour(ts) // 6 AS INTEGER) AS bucket,
        |         count(*) AS o
        |  FROM events GROUP BY 1, 2
        |), rt AS (SELECT event_type, sum(o) AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT bucket, sum(o) AS ct FROM cells GROUP BY 1),
        |g AS (
        |  SELECT sum(o) AS n, count(DISTINCT event_type) AS r,
        |         count(DISTINCT bucket) AS c
        |  FROM cells
        |), chi AS (
        |  SELECT CAST(sum(CAST(round(
        |           (CAST(cl.o AS DOUBLE) - CAST(r.rt * t.ct AS DOUBLE) / CAST(g.n AS DOUBLE)) *
        |           (CAST(cl.o AS DOUBLE) - CAST(r.rt * t.ct AS DOUBLE) / CAST(g.n AS DOUBLE)) /
        |           (CAST(r.rt * t.ct AS DOUBLE) / CAST(g.n AS DOUBLE)),
        |           6) AS DECIMAL(18,6))) AS DOUBLE) AS chi2
        |  FROM cells cl
        |  JOIN rt r ON r.event_type = cl.event_type
        |  JOIN ct t ON t.bucket = cl.bucket
        |  CROSS JOIN g
        |)
        |SELECT CAST(g.n AS BIGINT) AS n, CAST(g.r AS BIGINT) AS r,
        |       CAST(g.c AS BIGINT) AS c, chi.chi2,
        |       round(sqrt(chi.chi2 /
        |             (CAST(g.n AS DOUBLE) * CAST(least(g.r - 1, g.c - 1) AS DOUBLE))),
        |             6) AS cramers_v
        |FROM g CROSS JOIN chi""".stripMargin,

    "q_stats_cohens_d" ->
      s"""$HalfSql, m AS (
         |  SELECT event_type,
         |         sum(CASE WHEN first_half THEN 1 ELSE 0 END) AS n1,
         |         sum(CASE WHEN first_half THEN c ELSE 0 END) AS t1,
         |         sum(CASE WHEN first_half THEN c * c ELSE 0 END) AS q1,
         |         sum(CASE WHEN first_half THEN 0 ELSE 1 END) AS n2,
         |         sum(CASE WHEN first_half THEN 0 ELSE c END) AS t2,
         |         sum(CASE WHEN first_half THEN 0 ELSE c * c END) AS q2
         |  FROM h GROUP BY 1
         |  HAVING n1 >= 2 AND n2 >= 2
         |), v AS (
         |  SELECT event_type, n1, n2, t1, t2,
         |         (CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE) -
         |          CAST(t1 AS DOUBLE) * CAST(t1 AS DOUBLE)) /
         |         (CAST(n1 AS DOUBLE) * (CAST(n1 AS DOUBLE) - 1)) AS v1,
         |         (CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE) -
         |          CAST(t2 AS DOUBLE) * CAST(t2 AS DOUBLE)) /
         |         (CAST(n2 AS DOUBLE) * (CAST(n2 AS DOUBLE) - 1)) AS v2
         |  FROM m
         |), p AS (
         |  SELECT event_type, n1, n2, t1, t2,
         |         ((CAST(n1 AS DOUBLE) - 1) * v1 + (CAST(n2 AS DOUBLE) - 1) * v2) /
         |         (CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE) - 2) AS sp2
         |  FROM v
         |)
         |SELECT event_type, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         |       round(CAST(t1 AS DOUBLE) / CAST(n1 AS DOUBLE) / 100, 4) AS mean_first,
         |       round(CAST(t2 AS DOUBLE) / CAST(n2 AS DOUBLE) / 100, 4) AS mean_second,
         |       round((CAST(t2 AS DOUBLE) / CAST(n2 AS DOUBLE) -
         |              CAST(t1 AS DOUBLE) / CAST(n1 AS DOUBLE)) / sqrt(sp2),
         |             6) AS cohens_d
         |FROM p WHERE sp2 > 0""".stripMargin,

    "q_stats_friedman" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         sum($CentsSql) AS x
         |  FROM events GROUP BY 1, 2
         |), kk AS (SELECT count(DISTINCT event_type) AS k FROM daily),
         |complete AS (
         |  SELECT day FROM daily GROUP BY 1
         |  HAVING count(*) = (SELECT k FROM kk)
         |), blocks AS (
         |  SELECT d.* FROM daily d JOIN complete c ON c.day = d.day
         |), rank2 AS (
         |  SELECT a.day, a.event_type,
         |         2 * sum(CASE WHEN b.x < a.x THEN 1 ELSE 0 END) +
         |         sum(CASE WHEN b.x = a.x THEN 1 ELSE 0 END) + 1 AS r2
         |  FROM blocks a JOIN blocks b ON b.day = a.day
         |  GROUP BY 1, 2
         |), sums AS (
         |  SELECT event_type, count(*) AS n, sum(r2) AS rj2
         |  FROM rank2 GROUP BY 1
         |), chi AS (
         |  SELECT max(kk.k) AS k, max(s.n) AS n,
         |         round(3.0 * CAST(sum(s.rj2 * s.rj2) AS DOUBLE) /
         |               (CAST(max(s.n) AS DOUBLE) * CAST(max(kk.k) AS DOUBLE) *
         |                (CAST(max(kk.k) AS DOUBLE) + 1)) -
         |               3.0 * CAST(max(s.n) AS DOUBLE) *
         |               (CAST(max(kk.k) AS DOUBLE) + 1), 6) AS chi2
         |  FROM sums s CROSS JOIN kk
         |  HAVING max(s.n) > 0 AND max(kk.k) >= 2
         |)
         |SELECT s.event_type, CAST(s.n AS BIGINT) AS n_blocks,
         |       round(CAST(s.rj2 AS DOUBLE) / (2.0 * CAST(s.n AS DOUBLE)), 6)
         |         AS mean_rank,
         |       CAST(c.k AS BIGINT) AS k, c.chi2
         |FROM sums s CROSS JOIN chi c""".stripMargin,

    "q_stats_esd" -> {
      def roundCtes(i: Int): String = {
        val src = if (i == 1) "daily" else s"r$i"
        val prevRem = if (i == 1) ""
        else
          s"""r$i AS (
             |  SELECT d.* FROM ${if (i == 2) "daily" else s"r${i - 1}"} d
             |  WHERE NOT EXISTS (SELECT 1 FROM t${i - 1} t
             |                    WHERE t.event_type = d.event_type
             |                      AND t.day = d.day)
             |), """.stripMargin
        s"""${prevRem}m$i AS (
           |  SELECT event_type, count(*) AS n, sum(x) AS s1,
           |         sum(CAST(x AS DECIMAL(18,0)) * x) AS s2
           |  FROM $src GROUP BY 1
           |  HAVING count(*) >= 3 AND count(*) * sum(CAST(x AS DECIMAL(18,0)) * x)
           |         - sum(x) * sum(x) > 0
           |), t$i AS (
           |  SELECT d.event_type, m.n, m.s1, m.s2, d.day, d.x,
           |         abs(m.n * d.x - m.s1) AS dev
           |  FROM $src d JOIN m$i m ON m.event_type = d.event_type
           |  QUALIFY row_number() OVER (PARTITION BY d.event_type
           |                             ORDER BY dev DESC, d.day) = 1
           |)""".stripMargin
      }
      def pick(i: Int): String =
        s"""SELECT event_type, $i AS round,
           |       strftime(day, '%Y-%m-%d') AS outlier_day,
           |       round(CAST(x AS DOUBLE) / 100, 2) AS outlier_value,
           |       round(CAST(dev AS DOUBLE) / CAST(n AS DOUBLE) /
           |             sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) -
           |                   CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) /
           |                  (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))),
           |             6) AS r_stat
           |FROM t$i""".stripMargin
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         sum($CentsSql) AS x
         |  FROM events GROUP BY 1, 2
         |), ${(1 to EsdRounds).map(roundCtes).mkString(", ")}
         |${(1 to EsdRounds).map(pick).mkString("\nUNION ALL\n")}""".stripMargin
    },

    "q_ts_chow" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         CAST(sum($CentsSql) AS BIGINT) // 10000 AS v
         |  FROM events GROUP BY 1, 2
         |), shift AS (
         |  SELECT event_type, CAST(sum(v) AS BIGINT) // count(*) AS m0,
         |         min(day) AS d0, max(day) AS d1
         |  FROM daily GROUP BY 1
         |), lagd AS (
         |  SELECT * FROM (
         |    SELECT d.event_type, d.day, d.v - s.m0 AS y,
         |           lag(d.v - s.m0, 1) OVER (PARTITION BY d.event_type
         |                                    ORDER BY d.day) AS y1,
         |           d.day < s.d0 + CAST((s.d1 - s.d0) // 2 AS INTEGER) AS first_half
         |    FROM daily d JOIN shift s ON s.event_type = d.event_type
         |  ) WHERE y1 IS NOT NULL
         |), mp AS (
         |  SELECT event_type, count(*) AS np, sum(y) AS syp, sum(y1) AS sxp,
         |         sum(y * y) AS syyp, sum(y1 * y1) AS sxxp, sum(y * y1) AS sxyp
         |  FROM lagd GROUP BY 1
         |), m1 AS (
         |  SELECT event_type, count(*) AS n1, sum(y) AS sy1, sum(y1) AS sx1,
         |         sum(y * y) AS syy1, sum(y1 * y1) AS sxx1, sum(y * y1) AS sxy1
         |  FROM lagd WHERE first_half GROUP BY 1
         |), m2 AS (
         |  SELECT event_type, count(*) AS n2, sum(y) AS sy2, sum(y1) AS sx2,
         |         sum(y * y) AS syy2, sum(y1 * y1) AS sxx2, sum(y * y1) AS sxy2
         |  FROM lagd WHERE NOT first_half GROUP BY 1
         |), f AS (
         |  SELECT p.event_type,
         |         CAST(p.np AS DOUBLE) AS npd, CAST(p.syp AS DOUBLE) AS sypd,
         |         CAST(p.sxp AS DOUBLE) AS sxpd, CAST(p.syyp AS DOUBLE) AS syypd,
         |         CAST(p.sxxp AS DOUBLE) AS sxxpd, CAST(p.sxyp AS DOUBLE) AS sxypd,
         |         a.n1, CAST(a.n1 AS DOUBLE) AS n1d, CAST(a.sy1 AS DOUBLE) AS sy1d,
         |         CAST(a.sx1 AS DOUBLE) AS sx1d, CAST(a.syy1 AS DOUBLE) AS syy1d,
         |         CAST(a.sxx1 AS DOUBLE) AS sxx1d, CAST(a.sxy1 AS DOUBLE) AS sxy1d,
         |         b.n2, CAST(b.n2 AS DOUBLE) AS n2d, CAST(b.sy2 AS DOUBLE) AS sy2d,
         |         CAST(b.sx2 AS DOUBLE) AS sx2d, CAST(b.syy2 AS DOUBLE) AS syy2d,
         |         CAST(b.sxx2 AS DOUBLE) AS sxx2d, CAST(b.sxy2 AS DOUBLE) AS sxy2d
         |  FROM mp p
         |  JOIN m1 a ON a.event_type = p.event_type
         |  JOIN m2 b ON b.event_type = p.event_type
         |  WHERE a.n1 >= 4 AND b.n2 >= 4
         |), g AS (
         |  SELECT event_type, n1, n2, n1d, n2d,
         |         (syypd - sypd * sypd / npd) -
         |         (sxypd - sypd * sxpd / npd) * (sxypd - sypd * sxpd / npd) /
         |         (sxxpd - sxpd * sxpd / npd) AS sse_p,
         |         -- parenthesized EXACTLY as the Spark side's S1 + S2
         |         -- (float addition is association-sensitive)
         |         ((syy1d - sy1d * sy1d / n1d) -
         |          (sxy1d - sy1d * sx1d / n1d) * (sxy1d - sy1d * sx1d / n1d) /
         |          (sxx1d - sx1d * sx1d / n1d)) +
         |         ((syy2d - sy2d * sy2d / n2d) -
         |          (sxy2d - sy2d * sx2d / n2d) * (sxy2d - sy2d * sx2d / n2d) /
         |          (sxx2d - sx2d * sx2d / n2d)) AS sse_s
         |  FROM f
         |  WHERE sxxpd - sxpd * sxpd / npd > 0
         |    AND sxx1d - sx1d * sx1d / n1d > 0
         |    AND sxx2d - sx2d * sx2d / n2d > 0
         |)
         |SELECT event_type, CAST(n1 AS BIGINT) AS n_first,
         |       CAST(n2 AS BIGINT) AS n_second,
         |       round(((sse_p - sse_s) / 2) / (sse_s / (n1d + n2d - 4)), 6)
         |         AS f_stat
         |FROM g WHERE sse_s > 0""".stripMargin,

    "q_stats_grubbs" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         sum($CentsSql) AS x
         |  FROM events GROUP BY 1, 2
         |), m AS (
         |  SELECT event_type, count(*) AS n, sum(x) AS s1,
         |         sum(CAST(x AS DECIMAL(18,0)) * x) AS s2
         |  FROM daily GROUP BY 1
         |  HAVING count(*) >= 3 AND count(*) * sum(CAST(x AS DECIMAL(18,0)) * x)
         |         - sum(x) * sum(x) > 0
         |), top AS (
         |  SELECT d.event_type, m.n, m.s1, m.s2, d.day, d.x,
         |         abs(m.n * d.x - m.s1) AS dev
         |  FROM daily d JOIN m ON m.event_type = d.event_type
         |  QUALIFY row_number() OVER (PARTITION BY d.event_type
         |                             ORDER BY dev DESC, d.day) = 1
         |)
         |SELECT event_type, CAST(n AS BIGINT) AS n_days,
         |       strftime(day, '%Y-%m-%d') AS outlier_day,
         |       round(CAST(x AS DOUBLE) / 100, 2) AS outlier_value,
         |       round(CAST(dev AS DOUBLE) / CAST(n AS DOUBLE) /
         |             sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE) -
         |                   CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) /
         |                  (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))),
         |             6) AS grubbs_g
         |FROM top""".stripMargin,

    "q_ts_granger" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         CAST(sum($CentsSql) AS BIGINT) // 10000 AS v
         |  FROM events GROUP BY 1, 2
         |), shift AS (
         |  SELECT event_type, CAST(sum(v) AS BIGINT) // count(*) AS m0
         |  FROM daily GROUP BY 1
         |), lagd AS (
         |  SELECT * FROM (
         |    SELECT d.event_type, d.day, d.v - s.m0 AS xc,
         |           lag(d.v - s.m0, 1) OVER (PARTITION BY d.event_type
         |                                    ORDER BY d.day) AS xl
         |    FROM daily d JOIN shift s ON s.event_type = d.event_type
         |  ) WHERE xl IS NOT NULL
         |), m AS (
         |  SELECT x.event_type AS x_type, y.event_type AS y_type,
         |         count(*) AS n,
         |         sum(y.xc) AS sy, sum(y.xl) AS sy1, sum(x.xl) AS sx1,
         |         sum(y.xc * y.xc) AS syy, sum(y.xl * y.xl) AS sy1y1,
         |         sum(x.xl * x.xl) AS sx1x1, sum(y.xc * y.xl) AS syy1,
         |         sum(y.xc * x.xl) AS syx1, sum(y.xl * x.xl) AS sy1x1
         |  FROM lagd y JOIN lagd x ON x.day = y.day
         |  WHERE x.event_type <> y.event_type
         |  GROUP BY 1, 2
         |  HAVING count(*) >= 10
         |), f AS (
         |  SELECT x_type, y_type, n, CAST(n AS DOUBLE) AS nd,
         |         CAST(sy AS DOUBLE) AS syd, CAST(sy1 AS DOUBLE) AS sy1d,
         |         CAST(sx1 AS DOUBLE) AS sx1d, CAST(syy AS DOUBLE) AS syyd,
         |         CAST(sy1y1 AS DOUBLE) AS sy1y1d,
         |         CAST(sx1x1 AS DOUBLE) AS sx1x1d,
         |         CAST(syy1 AS DOUBLE) AS syy1d,
         |         CAST(syx1 AS DOUBLE) AS syx1d,
         |         CAST(sy1x1 AS DOUBLE) AS sy1x1d
         |  FROM m
         |), c0 AS (
         |  SELECT x_type, y_type, n, nd,
         |         syyd - syd * syd / nd AS myy,
         |         sy1y1d - sy1d * sy1d / nd AS a11,
         |         sx1x1d - sx1d * sx1d / nd AS a22,
         |         sy1x1d - sy1d * sx1d / nd AS a12,
         |         syy1d - syd * sy1d / nd AS c1,
         |         syx1d - syd * sx1d / nd AS c2
         |  FROM f
         |), c1x AS (
         |  SELECT x_type, y_type, n, nd, myy, c1, c2,
         |         myy - c1 * c1 / a11 AS sse_r,
         |         (a22 * c1 - a12 * c2) / (a11 * a22 - a12 * a12) AS b1,
         |         (a11 * c2 - a12 * c1) / (a11 * a22 - a12 * a12) AS b2
         |  FROM c0
         |  WHERE a11 > 0 AND a22 > 0 AND a11 * a22 - a12 * a12 > 0
         |), c2x AS (
         |  SELECT x_type, y_type, n, nd, sse_r, b2,
         |         myy - (b1 * c1 + b2 * c2) AS sse_u
         |  FROM c1x
         |)
         |SELECT x_type, y_type, CAST(n AS BIGINT) AS n_days,
         |       round(b2, 6) AS cross_coef,
         |       round((sse_r - sse_u) / (sse_u / (nd - 3)), 6) AS f_stat
         |FROM c2x WHERE sse_u > 0""".stripMargin,

    "q_stats_runs" ->
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         sum($CentsSql) AS x
         |  FROM events GROUP BY 1, 2
         |), m AS (
         |  SELECT event_type, count(*) AS n, sum(x) AS s1 FROM daily GROUP BY 1
         |), signed AS (
         |  SELECT d.event_type, d.day, m.n * d.x > m.s1 AS up
         |  FROM daily d JOIN m ON m.event_type = d.event_type
         |), brk AS (
         |  SELECT event_type, up,
         |         CASE WHEN lag(up, 1) OVER tw IS NULL
         |                OR lag(up, 1) OVER tw <> up THEN 1 ELSE 0 END AS brk
         |  FROM signed
         |  WINDOW tw AS (PARTITION BY event_type ORDER BY day)
         |), agg AS (
         |  SELECT event_type, count(*) AS nd,
         |         sum(CASE WHEN up THEN 1 ELSE 0 END) AS n1,
         |         sum(CASE WHEN up THEN 0 ELSE 1 END) AS n2,
         |         sum(brk) AS runs
         |  FROM brk GROUP BY 1
         |  HAVING n1 > 0 AND n2 > 0 AND nd >= 3
         |), f AS (
         |  SELECT event_type, nd, n1, n2, runs,
         |         CAST(n1 AS DOUBLE) AS n1d, CAST(n2 AS DOUBLE) AS n2d
         |  FROM agg
         |)
         |SELECT event_type, CAST(nd AS BIGINT) AS n_days,
         |       CAST(n1 AS BIGINT) AS n_above, CAST(n2 AS BIGINT) AS n_below,
         |       CAST(runs AS BIGINT) AS runs,
         |       round((CAST(runs AS DOUBLE) -
         |              (2.0 * n1d * n2d / (n1d + n2d) + 1)) /
         |             sqrt(2.0 * n1d * n2d * (2.0 * n1d * n2d - (n1d + n2d)) /
         |                  ((n1d + n2d) * (n1d + n2d) * ((n1d + n2d) - 1))),
         |             6) AS z
         |FROM f
         |WHERE 2.0 * n1d * n2d * (2.0 * n1d * n2d - (n1d + n2d)) /
         |      ((n1d + n2d) * (n1d + n2d) * ((n1d + n2d) - 1)) > 0""".stripMargin,

    "q_stats_two_prop" ->
      s"""$HalfSql, agg AS (
         |  SELECT sum(CASE WHEN first_half THEN 1 ELSE 0 END) AS n1,
         |         sum(CASE WHEN first_half AND event_type = 'error' THEN 1 ELSE 0 END) AS x1,
         |         sum(CASE WHEN first_half THEN 0 ELSE 1 END) AS n2,
         |         sum(CASE WHEN NOT first_half AND event_type = 'error' THEN 1 ELSE 0 END) AS x2
         |  FROM h
         |)
         |SELECT CAST(n1 AS BIGINT) AS n1, CAST(x1 AS BIGINT) AS x1,
         |       CAST(n2 AS BIGINT) AS n2, CAST(x2 AS BIGINT) AS x2,
         |       round(CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS p_first,
         |       round(CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6) AS p_second,
         |       round((CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
         |              CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE)) /
         |             sqrt(CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) *
         |                  (1 - CAST(x1 + x2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)) *
         |                  (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))),
         |             6) AS z
         |FROM agg
         |WHERE n1 > 0 AND n2 > 0 AND x1 + x2 > 0 AND x1 + x2 < n1 + n2""".stripMargin)
}
