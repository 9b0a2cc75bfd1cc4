package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}
import InferenceQueries.{cents, withHalf, CentsSql, HalfSql}

/** Causal-effect estimators — the layer a training-data / experimentation
  * platform runs ABOVE the hypothesis tests in [[InferenceQueries]]: a
  * p-value says "the arms differ"; these say "by how much, after removing
  * the bias the raw difference carries". Assignment is the deterministic
  * user-bucket convention (`user_id % 2 = 0` = treated), the exact shape a
  * hash-bucketed A/B system produces, so both engines agree on every arm
  * label by construction.
  *
  * Determinism discipline (the [[InferenceQueries]] contract): exact
  * integer/DECIMAL moments order and select everything; doubles appear only
  * in final fixed-shape closed forms over identical operands and every
  * released double is round()-pinned. Per-unit derived doubles that must be
  * re-summed (CUPED's per-user means) are pinned FIRST and folded as
  * DECIMAL, so no partial-aggregation order can reorder a float sum
  * (the pin-before-decimal-sum rule, PLANS.md r11/r12).
  *
  * Scale shape: every estimator is one events- or customers-sized
  * aggregation down to a bounded relation (per-arm cells, per-stratum
  * rows, per-user pairs), then constant-size arithmetic. The matching
  * estimator's windows partition by market segment; at 100 TB the scale
  * path is the Wilcoxon RankShards convention (segment × balance-range
  * shards with boundary overlap) — documented at the query.
  */
object CausalQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** RDD local-linear bandwidth: ±$2,000 around the zero-balance cutoff
    * (in cents). Compile-time literal shared with the oracle SQL.
    */
  val RddBandCents = 200000L

  /** Treated arm = even user bucket — shared with every oracle below. */
  private val TreatSql = "user_id % 2 = 0"

  /** Per-customer outcome: lifetime order spend in cents (0 for customers
    * who never ordered — they stay in the panel; dropping them would
    * select on the outcome). One orders-sized aggregation, broadcast-free
    * equi-join on the customer key.
    */
  private def spendPanel(s: SparkSession, d: String): DataFrame = {
    val spend = t(s, d, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("y0"))
    t(s, d, "customer")
      .select(col("c_custkey").as("ck"), col("c_mktsegment").as("seg"),
        cents(col("c_acctbal")).as("x"),
        (col("c_custkey") % 2 === 0).as("treat"))
      .join(spend, col("ck") === col("o_custkey"), "left")
      .select(col("ck"), col("seg"), col("x"), col("treat"),
        coalesce(col("y0"), lit(0L)).as("y"))
  }

  private val SpendPanelSql =
    s"""panel AS (
       |  SELECT c_custkey AS ck, c_mktsegment AS seg,
       |         CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
       |         c_custkey % 2 = 0 AS treat,
       |         COALESCE(sp.y0, 0) AS y
       |  FROM customer LEFT JOIN (
       |    SELECT o_custkey,
       |           sum(CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)) AS y0
       |    FROM orders GROUP BY 1
       |  ) sp ON c_custkey = o_custkey
       |)""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Difference-in-differences: the treated arm's pre→post mean-value
    // shift minus the control arm's — the estimator that survives a
    // platform-wide level shift (seasonality, a pricing change) that
    // would bias the naive post-period arm difference. Period split is
    // the exact epoch-microsecond midpoint (q_dq_drift_psi convention);
    // cell sums are exact cents; the four cell means are int64/int64
    // double divisions on identical operands, and the one combining
    // expression is round()-pinned. Scale: one events-sized conditional
    // aggregation to a single row — no shuffle wider than the agg.
    "q_causal_did" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select((col("user_id") % 2 === 0).as("w"),
          unix_micros(col("ts")).as("us"), cents(col("value")).as("c"))
      val cell = withHalf(ev).select(col("w"), (!col("first_half")).as("post"), col("c"))
        .agg(
          sum(when(col("w") && !col("post"), 1L).otherwise(0L)).as("n_t_pre"),
          sum(when(col("w") && !col("post"), col("c")).otherwise(0L)).as("s_t_pre"),
          sum(when(col("w") && col("post"), 1L).otherwise(0L)).as("n_t_post"),
          sum(when(col("w") && col("post"), col("c")).otherwise(0L)).as("s_t_post"),
          sum(when(!col("w") && !col("post"), 1L).otherwise(0L)).as("n_c_pre"),
          sum(when(!col("w") && !col("post"), col("c")).otherwise(0L)).as("s_c_pre"),
          sum(when(!col("w") && col("post"), 1L).otherwise(0L)).as("n_c_post"),
          sum(when(!col("w") && col("post"), col("c")).otherwise(0L)).as("s_c_post"))
        .filter(col("n_t_pre") > 0 && col("n_t_post") > 0 &&
          col("n_c_pre") > 0 && col("n_c_post") > 0)
      def m(sc: String, nc: String): Column =
        col(sc).cast("double") / col(nc).cast("double") / 100.0
      cell.select(
        col("n_t_pre"), col("n_t_post"), col("n_c_pre"), col("n_c_post"),
        round(m("s_t_pre", "n_t_pre"), 6).as("mean_t_pre"),
        round(m("s_t_post", "n_t_post"), 6).as("mean_t_post"),
        round(m("s_c_pre", "n_c_pre"), 6).as("mean_c_pre"),
        round(m("s_c_post", "n_c_post"), 6).as("mean_c_post"),
        round((m("s_t_post", "n_t_post") - m("s_t_pre", "n_t_pre")) -
          (m("s_c_post", "n_c_post") - m("s_c_pre", "n_c_pre")), 6).as("did"))
    }),

    // Instrumental-variable (Wald) estimator: assignment is only an
    // ENCOURAGEMENT — some bucketed users never take the treatment
    // (here: never fire a purchase event), so the intent-to-treat
    // difference understates the effect on compliers. Wald = ITT on the
    // outcome / ITT on uptake. All four arm moments are exact integers
    // from one aggregation; the non-zero-denominator gate runs on exact
    // cross-multiplied int64s so neither engine ever divides by zero.
    "q_causal_iv" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select((col("user_id") % 2 === 0).as("z"),
          (col("event_type") === "purchase").cast("long").as("tk"),
          cents(col("value")).as("c"))
      val m = ev.agg(
          sum(when(col("z"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("z"), col("c")).otherwise(0L)).as("s1"),
          sum(when(col("z"), col("tk")).otherwise(0L)).as("d1"),
          sum(when(!col("z"), 1L).otherwise(0L)).as("n0"),
          sum(when(!col("z"), col("c")).otherwise(0L)).as("s0"),
          sum(when(!col("z"), col("tk")).otherwise(0L)).as("d0"))
        .filter(col("n1") > 0 && col("n0") > 0 &&
          col("d1") * col("n0") =!= col("d0") * col("n1"))
      val itt = (col("s1").cast("double") / col("n1").cast("double") -
        col("s0").cast("double") / col("n0").cast("double")) / 100.0
      val up = col("d1").cast("double") / col("n1").cast("double") -
        col("d0").cast("double") / col("n0").cast("double")
      m.select(col("n1"), col("n0"),
        round(itt, 6).as("itt_outcome"),
        round(up, 6).as("itt_uptake"),
        round(itt / up, 6).as("wald_late"))
    }),

    // CUPED variance reduction: adjust each user's post-period mean by
    // their PRE-period mean (the covariate a randomized assignment
    // guarantees is balanced), shrinking the effect estimator's variance
    // by the squared correlation — the standard trick that makes small
    // lifts detectable without more traffic. Per-user means are pinned
    // at 6dp and every moment is a DECIMAL fold of pinned terms
    // (pin-before-decimal-sum), so theta and both adjusted means are
    // partition-order-free. Scale: events → per-user agg → one-row
    // conditional moment agg; nothing wider than the user key shuffle.
    "q_causal_cuped" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          cents(col("value")).as("c"))
      val u = withHalf(ev)
        .groupBy(col("user_id"))
        .agg(sum(when(col("first_half"), 1L).otherwise(0L)).as("np"),
          sum(when(col("first_half"), col("c")).otherwise(0L)).as("sp"),
          sum(when(!col("first_half"), 1L).otherwise(0L)).as("nq"),
          sum(when(!col("first_half"), col("c")).otherwise(0L)).as("sq"))
        .filter(col("np") > 0 && col("nq") > 0)
        .select((col("user_id") % 2 === 0).as("w"),
          round(col("sp").cast("double") / col("np").cast("double") / 100.0, 6).as("px"),
          round(col("sq").cast("double") / col("nq").cast("double") / 100.0, 6).as("py"))
      val m = u.agg(
          count(lit(1)).cast(DecimalType(12, 0)).as("n"),
          sum(col("px").cast(DecimalType(18, 6))).cast(DecimalType(19, 6)).as("sx"),
          sum(col("py").cast(DecimalType(18, 6))).cast(DecimalType(19, 6)).as("sy"),
          sum(round(col("px") * col("py"), 6).cast(DecimalType(18, 6)))
            .cast(DecimalType(19, 6)).as("sxy"),
          sum(round(col("px") * col("px"), 6).cast(DecimalType(18, 6)))
            .cast(DecimalType(19, 6)).as("sxx"),
          sum(round(col("py") * col("py"), 6).cast(DecimalType(18, 6)))
            .cast(DecimalType(19, 6)).as("syy"),
          sum(when(col("w"), 1L).otherwise(0L)).as("nt"),
          sum(when(col("w"), col("px").cast(DecimalType(18, 6)))
            .otherwise(lit(BigDecimal(0)).cast(DecimalType(18, 6))))
            .cast(DecimalType(19, 6)).as("sxt"),
          sum(when(col("w"), col("py").cast(DecimalType(18, 6)))
            .otherwise(lit(BigDecimal(0)).cast(DecimalType(18, 6))))
            .cast(DecimalType(19, 6)).as("syt"),
          sum(when(!col("w"), 1L).otherwise(0L)).as("nc"),
          sum(when(!col("w"), col("px").cast(DecimalType(18, 6)))
            .otherwise(lit(BigDecimal(0)).cast(DecimalType(18, 6))))
            .cast(DecimalType(19, 6)).as("sxc"),
          sum(when(!col("w"), col("py").cast(DecimalType(18, 6)))
            .otherwise(lit(BigDecimal(0)).cast(DecimalType(18, 6))))
            .cast(DecimalType(19, 6)).as("syc"))
      // Degeneracy gates on EXACT decimals: both arms populated and both
      // centered second moments strictly positive.
      // (19,6)x(18,6) products are exact at (38,12) in both engines, but
      // the SUBTRACTION n*sxy - sx*sy needs precision 39, which Spark's
      // allowPrecisionLoss rescales to (38,11) while DuckDB's int128
      // keeps (38,12) — a latent 5e-12 asymmetry that can flip a >0 gate
      // or a 6dp round boundary (ADVICE r12). Fix: pin the cross term to
      // scale 6 BEFORE subtracting — round() is HALF_UP away-from-zero
      // on exact decimals in BOTH engines (verified against DuckDB
      // 1.0.0), so (32,6) - (33,6) = (34,6) stays inside precision 38
      // and the two engines see bit-identical centered moments.
      def p(a: String, b: String): Column =
        round(col(a) * col(b).cast(DecimalType(18, 6)), 6)
      val sXX = col("n") * col("sxx") - p("sx", "sx")
      val sXY = col("n") * col("sxy") - p("sx", "sy")
      val sYY = col("n") * col("syy") - p("sy", "sy")
      val theta = sXY.cast("double") / sXX.cast("double")
      val ateRaw = col("syt").cast("double") / col("nt").cast("double") -
        col("syc").cast("double") / col("nc").cast("double")
      val xGap = col("sxt").cast("double") / col("nt").cast("double") -
        col("sxc").cast("double") / col("nc").cast("double")
      m.filter(col("nt") >= 2 && col("nc") >= 2 && sXX > 0 && sYY > 0)
        .select(col("nt").as("n_treat"), col("nc").as("n_control"),
          round(theta, 6).as("theta"),
          round(ateRaw, 6).as("ate_raw"),
          round(ateRaw - theta * xGap, 6).as("ate_cuped"),
          round(sXY.cast("double") * sXY.cast("double") /
            (sXX.cast("double") * sYY.cast("double")), 6).as("rho2"))
    }),

    // Inverse-propensity-weighted ATE with exact within-stratum
    // propensities (stratum = event_type): when arm shares differ by
    // stratum, the raw arm difference confounds stratum mix with the
    // effect; weighting each stratum's arm means by the stratum's
    // population share removes it. e_s and both stratum means are exact
    // rationals; each stratum's contribution is pinned at 9dp and folded
    // as DECIMAL over the bounded stratum relation. Strata with an empty
    // arm are excluded by an exact gate (the overlap/positivity
    // assumption made visible). Scale: one events-sized agg to ≤|types|
    // rows, then constant-size arithmetic.
    "q_causal_ipw" -> ((s, d) => {
      val per = t(s, d, "events")
        .select(col("event_type"), (col("user_id") % 2 === 0).as("w"),
          cents(col("value")).as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("ns"),
          sum(when(col("w"), 1L).otherwise(0L)).as("nt"),
          sum(when(col("w"), col("c")).otherwise(0L)).as("st"),
          sum(when(!col("w"), 1L).otherwise(0L)).as("nc"),
          sum(when(!col("w"), col("c")).otherwise(0L)).as("sc"))
        .filter(col("nt") > 0 && col("nc") > 0)
        .select(col("event_type"), col("ns"), col("nt"), col("nc"),
          round((col("st").cast("double") / col("nt").cast("double") -
            col("sc").cast("double") / col("nc").cast("double")) / 100.0, 9)
            .as("diff_s"))
        .transform(graft.CacheScope.persisted(_))
      val tot = per.agg(
          sum(col("ns")).as("nu"),
          sum(round(col("ns").cast("double") * col("diff_s"), 9)
            .cast(DecimalType(28, 9))).as("tsum"))
        .filter(col("nu") > 0)
      per.crossJoin(broadcast(tot))
        .select(col("event_type"), col("ns").as("n_stratum"),
          round(col("nt").cast("double") / col("ns").cast("double"), 6).as("e_hat"),
          round(col("diff_s"), 6).as("stratum_diff"),
          round(col("tsum").cast("double") / col("nu").cast("double"), 6)
            .as("ate_ipw"))
    }),

    // Nearest-neighbor matching ATT: each treated customer is matched to
    // the control customer in the SAME market segment with the nearest
    // account balance (exact-match × caliper-free 1-NN — the workhorse
    // observational design). The match scan is two segment-partitioned
    // ignore-nulls window walks over the balance-sorted union (prev
    // control / next control), picking the closer side with an exact
    // integer tie-break toward the predecessor — no join explosion, no
    // global sort. ATT is an exact cents sum over matched pairs. Scale:
    // at 100 TB the segment partitions shard further by balance range
    // with one-row boundary overlap (the Wilcoxon RankShards
    // convention); the estimator is unchanged because matches are
    // balance-local.
    "q_causal_matching_att" -> ((s, d) => {
      val p = spendPanel(s, d)
      val w = Window.partitionBy(col("seg"))
        .orderBy(col("x").asc, col("treat").asc, col("ck").asc)
      val prevW = w.rowsBetween(Window.unboundedPreceding, -1)
      val nextW = w.rowsBetween(1, Window.unboundedFollowing)
      val ctrlX = when(!col("treat"), col("x"))
      val ctrlY = when(!col("treat"), col("y"))
      val m = p
        .withColumn("xp", last(ctrlX, ignoreNulls = true).over(prevW))
        .withColumn("yp", last(ctrlY, ignoreNulls = true).over(prevW))
        .withColumn("xn", first(ctrlX, ignoreNulls = true).over(nextW))
        .withColumn("yn", first(ctrlY, ignoreNulls = true).over(nextW))
        .filter(col("treat") && (col("xp").isNotNull || col("xn").isNotNull))
        .select(col("y"),
          when(col("xn").isNull ||
            (col("xp").isNotNull && col("x") - col("xp") <= col("xn") - col("x")),
            col("yp")).otherwise(col("yn")).as("ym"),
          when(col("xn").isNull ||
            (col("xp").isNotNull && col("x") - col("xp") <= col("xn") - col("x")),
            col("x") - col("xp")).otherwise(col("xn") - col("x")).as("dist"))
      m.agg(count(lit(1)).as("n_matched"),
          sum(col("y") - col("ym")).as("dsum"),
          sum(col("dist")).as("distsum"))
        .filter(col("n_matched") > 0)
        .select(col("n_matched"),
          round(col("dsum").cast("double") / col("n_matched").cast("double") / 100.0, 6)
            .as("att"),
          round(col("distsum").cast("double") / col("n_matched").cast("double") / 100.0, 6)
            .as("avg_match_dist"))
    }),

    // Doubly-robust (AIPW) ATE: combine the stratified propensity
    // (event_type strata, exact rationals) with per-arm linear OUTCOME
    // models in hour-of-day — consistent if EITHER model is right, the
    // estimator a production experimentation system actually ships. The
    // key scale/determinism move: rows collapse to (arm, stratum, hour)
    // cells first (<= 2·|types|·24 groups with exact integer n and cents
    // sums), the outcome-model coefficients pin at 9dp, and each CELL's
    // closed-form contribution is pinned and DECIMAL-folded — so the
    // per-row AIPW sum is exact algebra over a bounded relation, never a
    // float sum over N rows. Non-overlap strata are dropped whole (the
    // positivity restriction, applied identically to weights and models).
    "q_causal_dr" -> ((s, d) => {
      val g0 = t(s, d, "events")
        .select((col("user_id") % 2 === 0).as("w"),
          col("event_type").as("st"), hour(col("ts")).as("x"),
          cents(col("value")).as("c"))
        .groupBy(col("w"), col("st"), col("x"))
        .agg(count(lit(1)).as("ng"), sum(col("c")).as("yg"))
        .transform(graft.CacheScope.persisted(_))
      val strata = g0.groupBy(col("st"))
        .agg(sum(col("ng")).as("ns"),
          sum(when(col("w"), col("ng")).otherwise(0L)).as("nt"),
          sum(when(!col("w"), col("ng")).otherwise(0L)).as("nc"))
        .filter(col("nt") > 0 && col("nc") > 0)
        .select(col("st").as("st2"), col("ns"), col("nt"), col("nc"))
      val g = g0.join(broadcast(strata), col("st") === col("st2"))
        .transform(graft.CacheScope.persisted(_))
      // per-arm outcome-model moments over the overlap cells (x <= 23,
      // so every product is int64-safe before the DECIMAL casts)
      def armMoments(flag: Boolean, sfx: String) = Seq(
        sum(when(col("w") === flag, col("ng")).otherwise(0L))
          .cast(DecimalType(12, 0)).as(s"n_$sfx"),
        sum(when(col("w") === flag, col("ng") * col("x")).otherwise(0L))
          .cast(DecimalType(19, 0)).as(s"sx_$sfx"),
        sum(when(col("w") === flag, col("ng") * col("x") * col("x"))
          .otherwise(0L)).cast(DecimalType(19, 0)).as(s"sxx_$sfx"),
        sum(when(col("w") === flag, col("yg")).otherwise(0L))
          .cast(DecimalType(19, 0)).as(s"sy_$sfx"),
        sum(when(col("w") === flag, col("yg") * col("x")).otherwise(0L))
          .cast(DecimalType(20, 0)).as(s"sxy_$sfx"))
      val mAgg = g.agg((armMoments(true, "t") ++ armMoments(false, "c")).head,
        (armMoments(true, "t") ++ armMoments(false, "c")).tail: _*)
      def beta(sfx: String): Column =
        round((col(s"n_$sfx") * col(s"sxy_$sfx") -
          col(s"sx_$sfx") * col(s"sy_$sfx")).cast("double") /
          (col(s"n_$sfx") * col(s"sxx_$sfx") -
            col(s"sx_$sfx") * col(s"sx_$sfx")).cast("double") / 100.0, 9)
      def varOk(sfx: String): Column =
        col(s"n_$sfx") * col(s"sxx_$sfx") - col(s"sx_$sfx") * col(s"sx_$sfx") > 0
      val m = mAgg.filter(col("n_t") >= 2 && col("n_c") >= 2 &&
          varOk("t") && varOk("c"))
        .select(col("n_t"), col("n_c"),
          beta("t").as("b1"), beta("c").as("b0"),
          // alpha in currency from the PINNED beta (identical doubles)
          round((col("sy_t").cast("double") / 100.0 -
            beta("t") * col("sx_t").cast("double")) /
            col("n_t").cast("double"), 9).as("a1"),
          round((col("sy_c").cast("double") / 100.0 -
            beta("c") * col("sx_c").cast("double")) /
            col("n_c").cast("double"), 9).as("a0"))
      // per-cell AIPW contribution from pinned coefficients and exact
      // cell/stratum integers; e_s enters as the exact ratio ns/nt (ns/nc)
      val mu1 = col("a1") + col("b1") * col("x").cast("double")
      val mu0 = col("a0") + col("b0") * col("x").cast("double")
      val yCur = col("yg").cast("double") / 100.0
      val term = when(col("w"),
        (yCur - col("ng").cast("double") * mu1) *
          col("ns").cast("double") / col("nt").cast("double"))
        .otherwise((col("ng").cast("double") * mu0 - yCur) *
          col("ns").cast("double") / col("nc").cast("double")) +
        col("ng").cast("double") * (mu1 - mu0)
      g.crossJoin(broadcast(m))
        .select(col("ng"), round(term, 9).cast(DecimalType(28, 9)).as("tm"),
          (col("b1") - col("b0")).as("bdiff"), (col("a1") - col("a0")).as("adiff"),
          col("x"))
        .agg(sum(col("ng")).as("n_rows"), count(lit(1)).as("n_cells"),
          sum(col("tm")).as("tsum"),
          max(col("adiff")).as("ad"), max(col("bdiff")).as("bd"),
          sum(col("ng") * col("x")).as("sxall"))
        .filter(col("n_rows") > 0)
        .select(col("n_rows"), col("n_cells"),
          round(col("tsum").cast("double") / col("n_rows").cast("double"), 6)
            .as("ate_dr"),
          round(col("ad") + col("bd") *
            (col("sxall").cast("double") / col("n_rows").cast("double")), 6)
            .as("ate_outcome_model"))
    }),

    // Regression discontinuity at the zero-balance cutoff: customers
    // just below vs just above a credit threshold are as-good-as-random,
    // so the jump between the two local-linear intercepts AT the cutoff
    // estimates the effect of crossing it on lifetime spend. Both side
    // regressions use the exact DECIMAL moment discipline of
    // q_stats_linreg (one conditional aggregation for both sides);
    // slopes/intercepts are fixed-shape double expressions over exact
    // decimals, round()-pinned. Scale: one customers-sized filter+agg.
    "q_causal_rdd" -> ((s, d) => {
      val p = spendPanel(s, d)
        .filter(col("x") >= -RddBandCents && col("x") < RddBandCents)
        .select((col("x") >= 0).as("r"),
          col("x").cast(DecimalType(12, 0)).as("xd"),
          col("y").cast(DecimalType(16, 0)).as("yd"))
      // Moment widths are sized so every cross-engine product stays under
      // DuckDB's 38-digit multiply cap: n(8)·sxy(30) = 38, sx(16)·sy(20)
      // = 36, n(8)·sxx(28) = 36, sx(16)² = 32.
      def side(flag: Boolean, e: Column, z: Column): Column =
        sum(when(col("r") === flag, e).otherwise(z))
      val zl = lit(BigDecimal(0)).cast(DecimalType(32, 0))
      val m = p.agg(
          side(false, lit(1L), lit(0L)).cast(DecimalType(8, 0)).as("n_l"),
          side(false, col("xd").cast(DecimalType(32, 0)), zl)
            .cast(DecimalType(16, 0)).as("sx_l"),
          side(false, col("yd").cast(DecimalType(32, 0)), zl)
            .cast(DecimalType(20, 0)).as("sy_l"),
          side(false, (col("xd") * col("yd")).cast(DecimalType(32, 0)), zl)
            .cast(DecimalType(30, 0)).as("sxy_l"),
          side(false, (col("xd") * col("xd")).cast(DecimalType(32, 0)), zl)
            .cast(DecimalType(28, 0)).as("sxx_l"),
          side(true, lit(1L), lit(0L)).cast(DecimalType(8, 0)).as("n_r"),
          side(true, col("xd").cast(DecimalType(32, 0)), zl)
            .cast(DecimalType(16, 0)).as("sx_r"),
          side(true, col("yd").cast(DecimalType(32, 0)), zl)
            .cast(DecimalType(20, 0)).as("sy_r"),
          side(true, (col("xd") * col("yd")).cast(DecimalType(32, 0)), zl)
            .cast(DecimalType(30, 0)).as("sxy_r"),
          side(true, (col("xd") * col("xd")).cast(DecimalType(32, 0)), zl)
            .cast(DecimalType(28, 0)).as("sxx_r"))
      def varOk(sfx: String): Column =
        col(s"n_$sfx") * col(s"sxx_$sfx") - col(s"sx_$sfx") * col(s"sx_$sfx") > 0
      def slope(sfx: String): Column =
        (col(s"n_$sfx") * col(s"sxy_$sfx") - col(s"sx_$sfx") * col(s"sy_$sfx"))
          .cast("double") /
        (col(s"n_$sfx") * col(s"sxx_$sfx") - col(s"sx_$sfx") * col(s"sx_$sfx"))
          .cast("double")
      def icept(sfx: String): Column =
        (col(s"sy_$sfx").cast("double") - slope(sfx) * col(s"sx_$sfx").cast("double")) /
          col(s"n_$sfx").cast("double") / 100.0
      m.filter(col("n_l") >= 2 && col("n_r") >= 2 && varOk("l") && varOk("r"))
        .select(col("n_l").cast("long").as("n_left"),
          col("n_r").cast("long").as("n_right"),
          round(slope("l"), 9).as("slope_left"),
          round(slope("r"), 9).as("slope_right"),
          round(icept("l"), 6).as("icept_left"),
          round(icept("r"), 6).as("icept_right"),
          round(icept("r") - icept("l"), 6).as("rdd_effect"))
    }))

  override val oracles: Map[String, String] = Map(

    "q_causal_dr" ->
      s"""WITH g0 AS (
         |  SELECT user_id % 2 = 0 AS w, event_type AS st,
         |         EXTRACT(hour FROM ts) AS x,
         |         count(*) AS ng, sum($CentsSql) AS yg
         |  FROM events GROUP BY 1, 2, 3
         |), strata AS (
         |  SELECT st AS st2, sum(ng) AS ns,
         |         sum(CASE WHEN w THEN ng ELSE 0 END) AS nt,
         |         sum(CASE WHEN NOT w THEN ng ELSE 0 END) AS nc
         |  FROM g0 GROUP BY 1
         |  HAVING sum(CASE WHEN w THEN ng ELSE 0 END) > 0
         |     AND sum(CASE WHEN NOT w THEN ng ELSE 0 END) > 0
         |), g AS (
         |  SELECT g0.*, ns, nt, nc FROM g0 JOIN strata ON st = st2
         |), mm AS (
         |  SELECT
         |    CAST(sum(CASE WHEN w THEN ng ELSE 0 END) AS DECIMAL(12,0)) AS n_t,
         |    CAST(sum(CASE WHEN w THEN ng * x ELSE 0 END) AS DECIMAL(19,0)) AS sx_t,
         |    CAST(sum(CASE WHEN w THEN ng * x * x ELSE 0 END) AS DECIMAL(19,0)) AS sxx_t,
         |    CAST(sum(CASE WHEN w THEN yg ELSE 0 END) AS DECIMAL(19,0)) AS sy_t,
         |    CAST(sum(CASE WHEN w THEN yg * x ELSE 0 END) AS DECIMAL(20,0)) AS sxy_t,
         |    CAST(sum(CASE WHEN NOT w THEN ng ELSE 0 END) AS DECIMAL(12,0)) AS n_c,
         |    CAST(sum(CASE WHEN NOT w THEN ng * x ELSE 0 END) AS DECIMAL(19,0)) AS sx_c,
         |    CAST(sum(CASE WHEN NOT w THEN ng * x * x ELSE 0 END) AS DECIMAL(19,0)) AS sxx_c,
         |    CAST(sum(CASE WHEN NOT w THEN yg ELSE 0 END) AS DECIMAL(19,0)) AS sy_c,
         |    CAST(sum(CASE WHEN NOT w THEN yg * x ELSE 0 END) AS DECIMAL(20,0)) AS sxy_c
         |  FROM g
         |), coef AS (
         |  SELECT n_t, n_c,
         |    round(CAST(n_t * sxy_t - sx_t * sy_t AS DOUBLE) /
         |          CAST(n_t * sxx_t - sx_t * sx_t AS DOUBLE) / 100.0, 9) AS b1,
         |    round(CAST(n_c * sxy_c - sx_c * sy_c AS DOUBLE) /
         |          CAST(n_c * sxx_c - sx_c * sx_c AS DOUBLE) / 100.0, 9) AS b0,
         |    round((CAST(sy_t AS DOUBLE) / 100.0 -
         |           round(CAST(n_t * sxy_t - sx_t * sy_t AS DOUBLE) /
         |                 CAST(n_t * sxx_t - sx_t * sx_t AS DOUBLE) / 100.0, 9) *
         |           CAST(sx_t AS DOUBLE)) / CAST(n_t AS DOUBLE), 9) AS a1,
         |    round((CAST(sy_c AS DOUBLE) / 100.0 -
         |           round(CAST(n_c * sxy_c - sx_c * sy_c AS DOUBLE) /
         |                 CAST(n_c * sxx_c - sx_c * sx_c AS DOUBLE) / 100.0, 9) *
         |           CAST(sx_c AS DOUBLE)) / CAST(n_c AS DOUBLE), 9) AS a0
         |  FROM mm
         |  WHERE n_t >= 2 AND n_c >= 2
         |    AND n_t * sxx_t - sx_t * sx_t > 0 AND n_c * sxx_c - sx_c * sx_c > 0
         |), cells AS (
         |  SELECT g.ng, g.x,
         |         CAST(round(
         |           CASE WHEN g.w
         |             THEN (CAST(yg AS DOUBLE) / 100.0 -
         |                   CAST(ng AS DOUBLE) * (a1 + b1 * CAST(x AS DOUBLE))) *
         |                  CAST(ns AS DOUBLE) / CAST(nt AS DOUBLE)
         |             ELSE (CAST(ng AS DOUBLE) * (a0 + b0 * CAST(x AS DOUBLE)) -
         |                   CAST(yg AS DOUBLE) / 100.0) *
         |                  CAST(ns AS DOUBLE) / CAST(nc AS DOUBLE)
         |           END +
         |           CAST(ng AS DOUBLE) * ((a1 + b1 * CAST(x AS DOUBLE)) -
         |                                 (a0 + b0 * CAST(x AS DOUBLE))), 9)
         |           AS DECIMAL(28,9)) AS tm,
         |         a1 - a0 AS adiff, b1 - b0 AS bdiff
         |  FROM g CROSS JOIN coef
         |)
         |SELECT CAST(sum(ng) AS BIGINT) AS n_rows,
         |       count(*) AS n_cells,
         |       round(CAST(sum(tm) AS DOUBLE) / CAST(sum(ng) AS DOUBLE), 6) AS ate_dr,
         |       round(max(adiff) + max(bdiff) *
         |             (CAST(sum(ng * x) AS DOUBLE) / CAST(sum(ng) AS DOUBLE)), 6)
         |         AS ate_outcome_model
         |FROM cells
         |HAVING sum(ng) > 0""".stripMargin,

    "q_causal_did" ->
      s"""$HalfSql, cell AS (
         |  SELECT
         |    sum(CASE WHEN user_id % 2 = 0 AND first_half THEN 1 ELSE 0 END) AS n_t_pre,
         |    sum(CASE WHEN user_id % 2 = 0 AND first_half THEN c ELSE 0 END) AS s_t_pre,
         |    sum(CASE WHEN user_id % 2 = 0 AND NOT first_half THEN 1 ELSE 0 END) AS n_t_post,
         |    sum(CASE WHEN user_id % 2 = 0 AND NOT first_half THEN c ELSE 0 END) AS s_t_post,
         |    sum(CASE WHEN user_id % 2 <> 0 AND first_half THEN 1 ELSE 0 END) AS n_c_pre,
         |    sum(CASE WHEN user_id % 2 <> 0 AND first_half THEN c ELSE 0 END) AS s_c_pre,
         |    sum(CASE WHEN user_id % 2 <> 0 AND NOT first_half THEN 1 ELSE 0 END) AS n_c_post,
         |    sum(CASE WHEN user_id % 2 <> 0 AND NOT first_half THEN c ELSE 0 END) AS s_c_post
         |  FROM h
         |)
         |SELECT CAST(n_t_pre AS BIGINT) AS n_t_pre, CAST(n_t_post AS BIGINT) AS n_t_post,
         |       CAST(n_c_pre AS BIGINT) AS n_c_pre, CAST(n_c_post AS BIGINT) AS n_c_post,
         |       round(CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE) / 100.0, 6) AS mean_t_pre,
         |       round(CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE) / 100.0, 6) AS mean_t_post,
         |       round(CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE) / 100.0, 6) AS mean_c_pre,
         |       round(CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE) / 100.0, 6) AS mean_c_post,
         |       round((CAST(s_t_post AS DOUBLE) / CAST(n_t_post AS DOUBLE) / 100.0 -
         |              CAST(s_t_pre AS DOUBLE) / CAST(n_t_pre AS DOUBLE) / 100.0) -
         |             (CAST(s_c_post AS DOUBLE) / CAST(n_c_post AS DOUBLE) / 100.0 -
         |              CAST(s_c_pre AS DOUBLE) / CAST(n_c_pre AS DOUBLE) / 100.0), 6) AS did
         |FROM cell
         |WHERE n_t_pre > 0 AND n_t_post > 0 AND n_c_pre > 0 AND n_c_post > 0""".stripMargin,

    "q_causal_iv" ->
      s"""WITH m AS (
         |  SELECT
         |    sum(CASE WHEN $TreatSql THEN 1 ELSE 0 END) AS n1,
         |    sum(CASE WHEN $TreatSql THEN $CentsSql ELSE 0 END) AS s1,
         |    sum(CASE WHEN $TreatSql AND event_type = 'purchase' THEN 1 ELSE 0 END) AS d1,
         |    sum(CASE WHEN NOT ($TreatSql) THEN 1 ELSE 0 END) AS n0,
         |    sum(CASE WHEN NOT ($TreatSql) THEN $CentsSql ELSE 0 END) AS s0,
         |    sum(CASE WHEN NOT ($TreatSql) AND event_type = 'purchase' THEN 1 ELSE 0 END) AS d0
         |  FROM events
         |)
         |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n0 AS BIGINT) AS n0,
         |       round((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
         |              CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / 100.0, 6) AS itt_outcome,
         |       round(CAST(d1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
         |             CAST(d0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS itt_uptake,
         |       round(((CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
         |               CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)) / 100.0) /
         |             (CAST(d1 AS DOUBLE) / CAST(n1 AS DOUBLE) -
         |              CAST(d0 AS DOUBLE) / CAST(n0 AS DOUBLE)), 6) AS wald_late
         |FROM m
         |WHERE n1 > 0 AND n0 > 0 AND d1 * n0 <> d0 * n1""".stripMargin,

    "q_causal_cuped" ->
      s"""$HalfSql, u AS (
         |  SELECT user_id % 2 = 0 AS w,
         |         round(CAST(sum(CASE WHEN first_half THEN c ELSE 0 END) AS DOUBLE) /
         |               CAST(sum(CASE WHEN first_half THEN 1 ELSE 0 END) AS DOUBLE) / 100.0, 6) AS px,
         |         round(CAST(sum(CASE WHEN NOT first_half THEN c ELSE 0 END) AS DOUBLE) /
         |               CAST(sum(CASE WHEN NOT first_half THEN 1 ELSE 0 END) AS DOUBLE) / 100.0, 6) AS py
         |  FROM h GROUP BY user_id
         |  HAVING sum(CASE WHEN first_half THEN 1 ELSE 0 END) > 0
         |     AND sum(CASE WHEN NOT first_half THEN 1 ELSE 0 END) > 0
         |), m AS (
         |  SELECT CAST(count(*) AS DECIMAL(12,0)) AS n,
         |         CAST(sum(CAST(px AS DECIMAL(18,6))) AS DECIMAL(19,6)) AS sx,
         |         CAST(sum(CAST(py AS DECIMAL(18,6))) AS DECIMAL(19,6)) AS sy,
         |         CAST(sum(CAST(round(px * py, 6) AS DECIMAL(18,6))) AS DECIMAL(19,6)) AS sxy,
         |         CAST(sum(CAST(round(px * px, 6) AS DECIMAL(18,6))) AS DECIMAL(19,6)) AS sxx,
         |         CAST(sum(CAST(round(py * py, 6) AS DECIMAL(18,6))) AS DECIMAL(19,6)) AS syy,
         |         sum(CASE WHEN w THEN 1 ELSE 0 END) AS nt,
         |         CAST(sum(CASE WHEN w THEN CAST(px AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(19,6)) AS sxt,
         |         CAST(sum(CASE WHEN w THEN CAST(py AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(19,6)) AS syt,
         |         sum(CASE WHEN NOT w THEN 1 ELSE 0 END) AS nc,
         |         CAST(sum(CASE WHEN NOT w THEN CAST(px AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(19,6)) AS sxc,
         |         CAST(sum(CASE WHEN NOT w THEN CAST(py AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END) AS DECIMAL(19,6)) AS syc
         |  FROM u
         |)
         |SELECT CAST(nt AS BIGINT) AS n_treat, CAST(nc AS BIGINT) AS n_control,
         |       round(CAST(n * sxy - round(sx * CAST(sy AS DECIMAL(18,6)), 6) AS DOUBLE) /
         |             CAST(n * sxx - round(sx * CAST(sx AS DECIMAL(18,6)), 6) AS DOUBLE), 6) AS theta,
         |       round(CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE) -
         |             CAST(syc AS DOUBLE) / CAST(nc AS DOUBLE), 6) AS ate_raw,
         |       round((CAST(syt AS DOUBLE) / CAST(nt AS DOUBLE) -
         |              CAST(syc AS DOUBLE) / CAST(nc AS DOUBLE)) -
         |             CAST(n * sxy - round(sx * CAST(sy AS DECIMAL(18,6)), 6) AS DOUBLE) /
         |             CAST(n * sxx - round(sx * CAST(sx AS DECIMAL(18,6)), 6) AS DOUBLE) *
         |             (CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE) -
         |              CAST(sxc AS DOUBLE) / CAST(nc AS DOUBLE)), 6) AS ate_cuped,
         |       round(CAST(n * sxy - round(sx * CAST(sy AS DECIMAL(18,6)), 6) AS DOUBLE) * CAST(n * sxy - round(sx * CAST(sy AS DECIMAL(18,6)), 6) AS DOUBLE) /
         |             (CAST(n * sxx - round(sx * CAST(sx AS DECIMAL(18,6)), 6) AS DOUBLE) * CAST(n * syy - round(sy * CAST(sy AS DECIMAL(18,6)), 6) AS DOUBLE)),
         |             6) AS rho2
         |FROM m
         |WHERE nt >= 2 AND nc >= 2 AND n * sxx - round(sx * CAST(sx AS DECIMAL(18,6)), 6) > 0 AND n * syy - round(sy * CAST(sy AS DECIMAL(18,6)), 6) > 0""".stripMargin,

    "q_causal_ipw" ->
      s"""WITH per AS (
         |  SELECT event_type, count(*) AS ns,
         |         sum(CASE WHEN $TreatSql THEN 1 ELSE 0 END) AS nt,
         |         sum(CASE WHEN $TreatSql THEN $CentsSql ELSE 0 END) AS st,
         |         sum(CASE WHEN NOT ($TreatSql) THEN 1 ELSE 0 END) AS nc,
         |         sum(CASE WHEN NOT ($TreatSql) THEN $CentsSql ELSE 0 END) AS sc
         |  FROM events GROUP BY 1
         |  HAVING sum(CASE WHEN $TreatSql THEN 1 ELSE 0 END) > 0
         |     AND sum(CASE WHEN NOT ($TreatSql) THEN 1 ELSE 0 END) > 0
         |), d AS (
         |  SELECT event_type, ns, nt, nc,
         |         round((CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) -
         |                CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)) / 100.0, 9) AS diff_s
         |  FROM per
         |), tot AS (
         |  SELECT sum(ns) AS nu,
         |         sum(CAST(round(CAST(ns AS DOUBLE) * diff_s, 9) AS DECIMAL(28,9))) AS tsum
         |  FROM d
         |)
         |SELECT event_type, ns AS n_stratum,
         |       round(CAST(nt AS DOUBLE) / CAST(ns AS DOUBLE), 6) AS e_hat,
         |       round(diff_s, 6) AS stratum_diff,
         |       round(CAST(tsum AS DOUBLE) / CAST(nu AS DOUBLE), 6) AS ate_ipw
         |FROM d CROSS JOIN tot
         |WHERE nu > 0""".stripMargin,

    "q_causal_matching_att" ->
      s"""WITH $SpendPanelSql, scan AS (
         |  SELECT treat, y,
         |         last_value(CASE WHEN NOT treat THEN x END IGNORE NULLS) OVER (
         |           PARTITION BY seg ORDER BY x, treat, ck
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS xp,
         |         last_value(CASE WHEN NOT treat THEN y END IGNORE NULLS) OVER (
         |           PARTITION BY seg ORDER BY x, treat, ck
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS yp,
         |         first_value(CASE WHEN NOT treat THEN x END IGNORE NULLS) OVER (
         |           PARTITION BY seg ORDER BY x, treat, ck
         |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS xn,
         |         first_value(CASE WHEN NOT treat THEN y END IGNORE NULLS) OVER (
         |           PARTITION BY seg ORDER BY x, treat, ck
         |           ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS yn,
         |         x
         |  FROM panel
         |), m AS (
         |  SELECT y,
         |         CASE WHEN xn IS NULL OR (xp IS NOT NULL AND x - xp <= xn - x)
         |              THEN yp ELSE yn END AS ym,
         |         CASE WHEN xn IS NULL OR (xp IS NOT NULL AND x - xp <= xn - x)
         |              THEN x - xp ELSE xn - x END AS dist
         |  FROM scan
         |  WHERE treat AND (xp IS NOT NULL OR xn IS NOT NULL)
         |)
         |SELECT count(*) AS n_matched,
         |       round(CAST(sum(y - ym) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0, 6) AS att,
         |       round(CAST(sum(dist) AS DOUBLE) / CAST(count(*) AS DOUBLE) / 100.0, 6) AS avg_match_dist
         |FROM m
         |HAVING count(*) > 0""".stripMargin,

    "q_causal_rdd" ->
      s"""WITH $SpendPanelSql, band AS (
         |  SELECT x >= 0 AS r,
         |         CAST(x AS DECIMAL(12,0)) AS xd,
         |         CAST(y AS DECIMAL(16,0)) AS yd
         |  FROM panel
         |  WHERE x >= -$RddBandCents AND x < $RddBandCents
         |), m AS (
         |  SELECT
         |    CAST(sum(CASE WHEN NOT r THEN 1 ELSE 0 END) AS DECIMAL(8,0)) AS n_l,
         |    CAST(sum(CASE WHEN NOT r THEN CAST(xd AS DECIMAL(32,0)) ELSE CAST(0 AS DECIMAL(32,0)) END) AS DECIMAL(16,0)) AS sx_l,
         |    CAST(sum(CASE WHEN NOT r THEN CAST(yd AS DECIMAL(32,0)) ELSE CAST(0 AS DECIMAL(32,0)) END) AS DECIMAL(20,0)) AS sy_l,
         |    CAST(sum(CASE WHEN NOT r THEN CAST(xd * yd AS DECIMAL(32,0)) ELSE CAST(0 AS DECIMAL(32,0)) END) AS DECIMAL(30,0)) AS sxy_l,
         |    CAST(sum(CASE WHEN NOT r THEN CAST(xd * xd AS DECIMAL(32,0)) ELSE CAST(0 AS DECIMAL(32,0)) END) AS DECIMAL(28,0)) AS sxx_l,
         |    CAST(sum(CASE WHEN r THEN 1 ELSE 0 END) AS DECIMAL(8,0)) AS n_r,
         |    CAST(sum(CASE WHEN r THEN CAST(xd AS DECIMAL(32,0)) ELSE CAST(0 AS DECIMAL(32,0)) END) AS DECIMAL(16,0)) AS sx_r,
         |    CAST(sum(CASE WHEN r THEN CAST(yd AS DECIMAL(32,0)) ELSE CAST(0 AS DECIMAL(32,0)) END) AS DECIMAL(20,0)) AS sy_r,
         |    CAST(sum(CASE WHEN r THEN CAST(xd * yd AS DECIMAL(32,0)) ELSE CAST(0 AS DECIMAL(32,0)) END) AS DECIMAL(30,0)) AS sxy_r,
         |    CAST(sum(CASE WHEN r THEN CAST(xd * xd AS DECIMAL(32,0)) ELSE CAST(0 AS DECIMAL(32,0)) END) AS DECIMAL(28,0)) AS sxx_r
         |  FROM band
         |)
         |SELECT CAST(n_l AS BIGINT) AS n_left, CAST(n_r AS BIGINT) AS n_right,
         |       round(CAST(n_l * sxy_l - sx_l * sy_l AS DOUBLE) /
         |             CAST(n_l * sxx_l - sx_l * sx_l AS DOUBLE), 9) AS slope_left,
         |       round(CAST(n_r * sxy_r - sx_r * sy_r AS DOUBLE) /
         |             CAST(n_r * sxx_r - sx_r * sx_r AS DOUBLE), 9) AS slope_right,
         |       round((CAST(sy_l AS DOUBLE) -
         |              CAST(n_l * sxy_l - sx_l * sy_l AS DOUBLE) /
         |              CAST(n_l * sxx_l - sx_l * sx_l AS DOUBLE) * CAST(sx_l AS DOUBLE)) /
         |             CAST(n_l AS DOUBLE) / 100.0, 6) AS icept_left,
         |       round((CAST(sy_r AS DOUBLE) -
         |              CAST(n_r * sxy_r - sx_r * sy_r AS DOUBLE) /
         |              CAST(n_r * sxx_r - sx_r * sx_r AS DOUBLE) * CAST(sx_r AS DOUBLE)) /
         |             CAST(n_r AS DOUBLE) / 100.0, 6) AS icept_right,
         |       round((CAST(sy_r AS DOUBLE) -
         |              CAST(n_r * sxy_r - sx_r * sy_r AS DOUBLE) /
         |              CAST(n_r * sxx_r - sx_r * sx_r AS DOUBLE) * CAST(sx_r AS DOUBLE)) /
         |             CAST(n_r AS DOUBLE) / 100.0 -
         |             (CAST(sy_l AS DOUBLE) -
         |              CAST(n_l * sxy_l - sx_l * sy_l AS DOUBLE) /
         |              CAST(n_l * sxx_l - sx_l * sx_l AS DOUBLE) * CAST(sx_l AS DOUBLE)) /
         |             CAST(n_l AS DOUBLE) / 100.0, 6) AS rdd_effect
         |FROM m
         |WHERE n_l >= 2 AND n_r >= 2
         |  AND n_l * sxx_l - sx_l * sx_l > 0 AND n_r * sxx_r - sx_r * sx_r > 0""".stripMargin)
}
