package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}

/** Statistical-inference operators over `events`: chi-squared independence,
  * least-squares trend from exact moments, population-stability-index
  * distribution drift, and RFM customer segmentation. These are the
  * "is this shift real?" primitives a training-data pipeline runs before
  * acting on a monitoring signal ([[TimeSeriesQueries]] produces the
  * signals; this pack tests them).
  *
  * Same determinism discipline as [[TimeSeriesQueries]]: integer cents /
  * integer counts through exact DECIMAL combination; doubles only in final
  * divisions, logs, and sqrt on identical operands; totals of per-row
  * float contributions go through round-then-DECIMAL-sum so summation
  * order can never flip a hash.
  */
object StatsQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  private def cents(c: Column): Column =
    (c.cast(DecimalType(12, 2)) * 100).cast("long")

  private val CentsSql = "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"

  /** PSI value-histogram bin count. */
  val PsiBins = 10

  /** Gradient-descent passes for q_stats_logreg — a dial like the
    * PageRank/Lloyd iteration counts; the oracle unrolls the same number
    * of CTE rounds.
    */
  val LogRegIters = 5

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Pearson chi-squared test of independence between event_type and
    // 6-hour time-of-day bucket: are event types distributed uniformly
    // over the day, cell by cell? Expected counts e = rt*ct/n come from
    // exact integer margins (rt*ct stays under 2^53 at bench SF — the
    // documented dial: past ~3e7 events/cell-margin, route the product
    // through DECIMAL and accept round()'s 1-ulp absorption); per-cell
    // contribution (o-e)^2/e is identical double arithmetic. The grand
    // chi2 total is the DECIMAL sum of the round(,6)-pinned cell
    // contributions — order-independent by construction. Scale shape:
    // one events-sized agg to a 4x|types| cell relation; margins and the
    // total ride broadcast 1-row/short aggregates.
    "q_stats_chisq" -> ((s, d) => {
      val cells = t(s, d, "events")
        .groupBy(col("event_type"), (hour(col("ts")) / lit(6)).cast("int").as("bucket"))
        .agg(count(lit(1)).as("o"))
        .transform(graft.CacheScope.persisted(_))
      val rt = cells.groupBy("event_type").agg(sum(col("o")).as("rt"))
      val ct = cells.groupBy("bucket").agg(sum(col("o")).as("ct"))
      val n = cells.agg(sum(col("o")).as("n"),
        ((countDistinct(col("event_type")) - 1) *
          (countDistinct(col("bucket")) - 1)).as("dof"))
      val e = (col("rt") * col("ct")).cast("double") / col("n").cast("double")
      val contrib = round((col("o").cast("double") - e) *
        (col("o").cast("double") - e) / e, 6)
      val per = cells.join(rt, "event_type").join(ct, "bucket")
        .crossJoin(broadcast(n))
        .select(col("event_type"), col("bucket"), col("o").as("observed"),
          round(e, 6).as("expected"), contrib.as("contrib"), col("dof"))
        .transform(graft.CacheScope.persisted(_))
      val tot = per.agg(sum(col("contrib").cast(DecimalType(18, 6)))
        .cast("double").as("chi2"))
      per.crossJoin(broadcast(tot))
        .select(col("event_type"), col("bucket"), col("observed"),
          col("expected"), col("contrib"), col("chi2"), col("dof"))
    }),

    // Per-type OLS trend of the daily value series: slope/intercept/R^2
    // from exact integer-cents moment sums (the least-squares twin of
    // q_ts_theilsen's robust slope — divergence between the two flags
    // outlier-driven trends). Decimal downcasts bound every product at
    // DECIMAL(38); numerators cross 2^53 so the final casts carry the
    // same documented 1-ulp/round() absorption as q_ts_acf.
    "q_stats_linreg" -> ((s, d) => {
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(sum(cents(col("value"))).as("c"))
        .select(col("event_type"),
          datediff(col("day"), to_date(lit("1970-01-01")))
            .cast(DecimalType(10, 0)).as("ti"),
          col("c").cast(DecimalType(14, 0)).as("y"))
      val m = daily.groupBy("event_type")
        .agg(count(lit(1)).cast(DecimalType(6, 0)).as("n"),
          sum(col("ti")).cast(DecimalType(16, 0)).as("st"),
          sum(col("y")).cast(DecimalType(16, 0)).as("sy"),
          sum(col("ti") * col("y")).cast(DecimalType(30, 0)).as("sty"),
          sum(col("ti") * col("ti")).cast(DecimalType(30, 0)).as("stt"),
          sum(col("y") * col("y")).cast(DecimalType(30, 0)).as("syy"))
      val sxx = (col("n") * col("stt") - col("st") * col("st")).cast("double")
      val sxy = (col("n") * col("sty") - col("st") * col("sy")).cast("double")
      val syyD = (col("n") * col("syy") - col("sy") * col("sy")).cast("double")
      val slopeC = sxy / sxx // cents per day
      // Degeneracy gates run on the EXACT decimals (n>=2, nonzero x/y
      // variance) so neither engine ever divides by zero — a NaN/Inf in
      // the output would compare engine-specifically.
      m.filter(col("n") >= 2 &&
          col("n") * col("stt") - col("st") * col("st") > 0 &&
          col("n") * col("syy") - col("sy") * col("sy") > 0)
        .select(col("event_type"), col("n").cast("long").as("n_days"),
          round(slopeC / 100.0, 9).as("slope"),
          round((col("sy").cast("double") - slopeC * col("st").cast("double")) /
            (col("n").cast("double") * 100.0), 4).as("intercept"),
          round(sxy * sxy / (sxx * syyD), 6).as("r2"))
    }),

    // Population-stability-index drift: does the value distribution of
    // the SECOND half of the time range differ from the first? The
    // monitoring gate run before retraining on fresh data. Everything
    // that shapes the comparison is exact integer arithmetic: the time
    // midpoint in epoch microseconds, the 10 equal-width value bins over
    // the global cents range, add-one-smoothed bin counts. Per-bin
    // psi = (p-q)*ln(p/q) on identical doubles; the per-type total sums
    // round(,9)-pinned DECIMALs. Scale shape: one 1-row range aggregate
    // broadcast into one events-sized binning agg; everything after runs
    // on the |types|x10 bin relation.
    "q_dq_drift_psi" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"), unix_micros(col("ts")).as("us"),
          cents(col("value")).as("c"))
      val rng = ev.agg(min(col("us")).as("us0"), max(col("us")).as("us1"),
        min(col("c")).as("c0"), max(col("c")).as("c1"))
      // `div` (integer division) everywhere: epoch micros sit far above
      // 2^53, where Spark's `/` (double division) would silently round.
      val binned = ev.crossJoin(broadcast(rng))
        .select(col("event_type"),
          expr(s"CAST(least($PsiBins - 1, " +
            s"(c - c0) * $PsiBins div (c1 - c0 + 1)) AS INT)").as("bin"),
          expr("us < us0 + (us1 - us0) div 2").as("first_half"))
        .groupBy("event_type", "bin")
        .agg(sum(when(col("first_half"), 1L).otherwise(0L)).as("ca"),
          sum(when(col("first_half"), 0L).otherwise(1L)).as("cb"))
        .transform(graft.CacheScope.persisted(_))
      val tots = binned.groupBy("event_type")
        .agg(sum(col("ca")).as("ta"), sum(col("cb")).as("tb"))
      val p = (col("ca") + 1).cast("double") / (col("ta") + PsiBins).cast("double")
      val q = (col("cb") + 1).cast("double") / (col("tb") + PsiBins).cast("double")
      val per = binned.join(tots, "event_type")
        .select(col("event_type"), col("bin"),
          col("ca").as("n_first"), col("cb").as("n_second"),
          round((p - q) * log(p / q), 9).as("psi_bin"))
        .transform(graft.CacheScope.persisted(_))
      val tot = per.groupBy("event_type")
        .agg(sum(col("psi_bin").cast(DecimalType(18, 9)))
          .cast("double").as("psi_total"))
      per.join(tot, "event_type")
        .select(col("event_type"), col("bin"), col("n_first"),
          col("n_second"), col("psi_bin"), round(col("psi_total"), 9).as("psi_total"))
    }),

    // Kaplan–Meier survival curve over user lifetimes: S(t) = Π (1 -
    // d_u/n_u) across lifetime days, with users active in the final week
    // right-CENSORED (they leave the risk set without counting as
    // churn) — the estimator a retention model is benchmarked against,
    // and the reason naive "fraction still active after t days" curves
    // are biased. Scale shape: one events-sized aggregation collapses to
    // per-user lifetimes, then to the bounded per-day (d, c) relation;
    // the risk-set and product accumulations are the constant-size
    // triangular broadcast joins (the q_quantile_sketch discipline — no
    // unpartitioned window, no collect). The product goes through
    // round(,9)-pinned ln terms summed as DECIMAL, so it is
    // order-independent; an all-deaths day (factor 0) short-circuits via
    // an exact flag rather than ln(0).
    "q_events_survival" -> ((s, d) => {
      val u = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(min(date_trunc("day", col("ts")).cast("date")).as("fd"),
          max(date_trunc("day", col("ts")).cast("date")).as("ld"))
        .crossJoin(broadcast(t(s, d, "events")
          .agg(max(date_trunc("day", col("ts")).cast("date")).as("dmax"))))
        .select(datediff(col("ld"), col("fd")).as("lt"),
          (col("ld") <= date_sub(col("dmax"), 7)).as("churned"))
      val lt = u.groupBy(col("lt"))
        .agg(sum(when(col("churned"), 1L).otherwise(0L)).as("dd"),
          sum(when(col("churned"), 0L).otherwise(1L)).as("cc"))
        .transform(graft.CacheScope.persisted(_))
      val nrel = lt
        .join(broadcast(lt.select(col("lt").as("t2"), (col("dd") + col("cc")).as("a2"))),
          col("t2") >= col("lt"))
        .groupBy(col("lt"), col("dd"))
        .agg(sum(col("a2")).as("n"))
        .transform(graft.CacheScope.persisted(_))
      val lf = when(col("d2") > 0 && col("n2") > col("d2"),
        round(log((col("n2") - col("d2")).cast("double") / col("n2").cast("double")), 9)
          .cast(DecimalType(18, 9)))
        .otherwise(lit(BigDecimal(0)).cast(DecimalType(18, 9)))
      nrel
        .join(broadcast(nrel.select(col("lt").as("t2"), col("dd").as("d2"),
          col("n").as("n2"))), col("t2") <= col("lt"))
        .groupBy(col("lt"), col("dd"), col("n"))
        .agg(sum(lf).as("slf"),
          max(when(col("d2") >= col("n2"), 1).otherwise(0)).as("hz"))
        .select(col("lt").as("lifetime_days"), col("n").as("n_risk"),
          col("dd").as("n_churned"),
          when(col("hz") === 1, lit(0.0))
            .otherwise(round(exp(col("slf").cast("double")), 6)).as("survival"))
    }),

    // Spend-inequality audit: exact Gini coefficient and top-10% share
    // of per-user spend — the "is this corpus/revenue dominated by a few
    // heavy hitters" readout that decides sampling and capping policy.
    // The exact global spend rank comes WITHOUT a global sort: 64 value
    // buckets over the broadcast max, constant-size triangular join for
    // bucket base offsets, bucket-partitioned row_number (the
    // text_quality_deciles machinery, generalized to an unbounded metric
    // via the max-scaled bucket key). Gini then reduces to exact integer
    // sums: G = (2·Σ rank·m − (n+1)·Σm) / (n·Σm).
    "q_events_gini" -> ((s, d) => {
      val u = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(sum(cents(col("value"))).as("m"))
        .transform(graft.CacheScope.persisted(_))
      val mx = u.agg(max(col("m")).as("mx"))
      val b = u.crossJoin(broadcast(mx))
        .select(col("user_id"), col("m"),
          expr("m * 64 div (mx + 1)").as("bk"))
        .transform(graft.CacheScope.persisted(_))
      val sizes = b.groupBy(col("bk")).agg(count(lit(1)).as("bn"))
      val base = sizes
        .join(broadcast(sizes.select(col("bk").as("b2"), col("bn").as("n2"))),
          col("b2") < col("bk"), "left")
        .groupBy(col("bk"))
        .agg(coalesce(sum(col("n2")), lit(0L)).as("base"))
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy("bk").orderBy(col("m").asc, col("user_id").asc)
      val ranked = b.join(broadcast(base), "bk")
        .select(col("m"), (col("base") + row_number().over(wb)).as("rk"))
      val dec = DecimalType(38, 0)
      ranked.crossJoin(broadcast(u.agg(count(lit(1)).as("n"))))
        .groupBy(col("n"))
        .agg(
          sum(col("m").cast(DecimalType(18, 0))).cast(DecimalType(24, 0)).as("sm"),
          sum(col("rk").cast(DecimalType(12, 0)) * col("m").cast(DecimalType(18, 0)))
            .cast(DecimalType(34, 0)).as("srm"),
          sum(when(col("rk") * 10 > col("n") * lit(9),
            col("m")).otherwise(lit(0L)).cast(DecimalType(18, 0)))
            .cast(DecimalType(24, 0)).as("stop"))
        .select(col("n").as("n_users"),
          round(col("sm").cast("double") / 100.0, 2).as("total_spend"),
          round((lit(2).cast(dec) * col("srm") -
            (col("n") + 1).cast(dec) * col("sm")).cast("double") /
            (col("n").cast(dec) * col("sm")).cast("double"), 6).as("gini"),
          round(col("stop").cast("double") / col("sm").cast("double"), 6)
            .as("top10_share"))
    }),

    // RFM segmentation: per-user Recency/Frequency/Monetary quintile
    // scores — the classic CRM cut, and the grouping key LTV/churn
    // models stratify on. Quintile boundaries come from ONE exact
    // percentile aggregate over the user relation (its state is bounded
    // by the DISTINCT metric values: recency days are calendar-bounded,
    // frequencies are small ints, monetary is bucketed to whole units —
    // at a cardinality where exactness ever hurt, the documented swap is
    // approx_percentile); scores then broadcast-join back as six scalar
    // comparisons. Exact ints everywhere; the only doubles are the
    // interpolated boundaries, identical in both engines.
    "q_events_rfm" -> ((s, d) => {
      val maxd = t(s, d, "events")
        .agg(max(date_trunc("day", col("ts")).cast("date")).as("dmax"))
      val u = t(s, d, "events")
        .groupBy(col("user_id"))
        .agg(max(date_trunc("day", col("ts")).cast("date")).as("last_day"),
          count(lit(1)).as("frequency"),
          sum(cents(col("value"))).as("mc"))
        .crossJoin(broadcast(maxd))
        .select(col("user_id"),
          datediff(col("dmax"), col("last_day")).as("recency_days"),
          col("frequency"), expr("mc div 100").as("monetary_units"))
        .transform(graft.CacheScope.persisted(_))
      val b = u.agg(
        expr("percentile(recency_days, 0.2)").as("r20"),
        expr("percentile(recency_days, 0.4)").as("r40"),
        expr("percentile(recency_days, 0.6)").as("r60"),
        expr("percentile(recency_days, 0.8)").as("r80"),
        expr("percentile(frequency, 0.2)").as("f20"),
        expr("percentile(frequency, 0.4)").as("f40"),
        expr("percentile(frequency, 0.6)").as("f60"),
        expr("percentile(frequency, 0.8)").as("f80"),
        expr("percentile(monetary_units, 0.2)").as("m20"),
        expr("percentile(monetary_units, 0.4)").as("m40"),
        expr("percentile(monetary_units, 0.6)").as("m60"),
        expr("percentile(monetary_units, 0.8)").as("m80"))
      def up(c: Column, pre: String) =
        lit(1) + (c > col(pre + "20")).cast("int") + (c > col(pre + "40")).cast("int") +
          (c > col(pre + "60")).cast("int") + (c > col(pre + "80")).cast("int")
      u.crossJoin(broadcast(b))
        .select(col("user_id"), col("recency_days"), col("frequency"),
          col("monetary_units"),
          // recency: LOWER is better — invert the quintile walk.
          (lit(6) - up(col("recency_days"), "r")).as("r_score"),
          up(col("frequency"), "f").as("f_score"),
          up(col("monetary_units"), "m").as("m_score"))
    }),

    // Distributed logistic regression (batch gradient descent, LogRegIters
    // full passes, lr=1.0): P(purchase | hour-of-day, spend). The iterative
    // template every gradient-based fit on this engine follows: the
    // feature relation is pinned once; each iteration is ONE events-sized
    // aggregate producing a 1-row gradient that broadcast-joins into the
    // next weight row — weights NEVER visit the driver (no collect; the
    // update is a Catalyst projection on the 1-row relation, exactly the
    // PageRank discipline applied to a dense parameter vector). Per-row
    // gradient contributions are round(,9)-pinned and summed as
    // DECIMAL(28,9), so partition visit order cannot move a weight by a
    // ulp — which would otherwise compound across iterations. Features
    // ride fixed dials (hour/24, cents/50000), not data-dependent scans.
    "q_stats_logreg" -> ((s, d) => {
      val dec = DecimalType(28, 9)
      val ev = t(s, d, "events").select(
          (hour(col("ts")).cast("double") / lit(24.0)).as("x1"),
          (cents(col("value")).cast("double") / lit(50000.0)).as("x2"),
          when(col("event_type") === "purchase", lit(1.0)).otherwise(lit(0.0))
            .as("y"))
        .transform(graft.CacheScope.persisted(_))
      // sigmoid of the CURRENT weight row (w0,w1,w2 ride the join).
      val p = lit(1.0) / (lit(1.0) +
        exp(-(col("w0") + col("w1") * col("x1") + col("w2") * col("x2"))))
      var w: DataFrame = s.range(1).select(
        lit(0.0).as("w0"), lit(0.0).as("w1"), lit(0.0).as("w2"))
      for (_ <- 1 to LogRegIters) {
        val g = ev.crossJoin(broadcast(w))
          .groupBy("w0", "w1", "w2")
          .agg(sum(round(p - col("y"), 9).cast(dec)).as("g0"),
            sum(round((p - col("y")) * col("x1"), 9).cast(dec)).as("g1"),
            sum(round((p - col("y")) * col("x2"), 9).cast(dec)).as("g2"),
            count(lit(1)).as("n"))
        w = g.select(
          (col("w0") - col("g0").cast("double") / col("n").cast("double")).as("w0"),
          (col("w1") - col("g1").cast("double") / col("n").cast("double")).as("w1"),
          (col("w2") - col("g2").cast("double") / col("n").cast("double")).as("w2"))
      }
      ev.crossJoin(broadcast(w))
        .groupBy("w0", "w1", "w2")
        .agg(count(lit(1)).as("n_rows"),
          sum(round(-(col("y") * log(p) +
            (lit(1.0) - col("y")) * log(lit(1.0) - p)), 9).cast(dec)).as("ls"))
        .select(col("n_rows"),
          round(col("w0"), 6).as("w_bias"),
          round(col("w1"), 6).as("w_hour"),
          round(col("w2"), 6).as("w_value"),
          round(col("ls").cast("double") / col("n_rows").cast("double"), 6)
            .as("log_loss"))
    }),

    // Exact two-sample Kolmogorov–Smirnov distance between the spend
    // distributions of every event-type pair — the distribution-shift
    // test PSI approximates with bins, computed here EXACTLY and without
    // a global sort: the jump grid is the distinct-cents relation
    // (bounded by the value domain, not the row count), per-type CDFs
    // come from the two-level prefix sum (constant-size dollar-bucket
    // triangular join for base offsets + a (type, bucket)-partitioned
    // within-bucket window), and sup|F_a - F_b| is taken over the exact
    // integer cross-products cum_a*n_b - cum_b*n_a as DECIMAL(38,0) —
    // doubles appear only in the final division. The KS sup is attained
    // at a sample jump point, so evaluating on the union grid is the
    // exact statistic, not an approximation.
    "q_stats_ks" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type").as("et"), cents(col("value")).as("c"))
      val cnt = ev.groupBy(col("et"), col("c")).agg(count(lit(1)).as("k"))
        .transform(graft.CacheScope.persisted(_))
      val grid = cnt.select(col("c")).distinct()
      val ty = cnt.groupBy(col("et")).agg(sum(col("k")).as("n"))
      val full = grid.crossJoin(broadcast(ty))
        .join(cnt, Seq("et", "c"), "left")
        .select(col("et"), col("c"), col("n"),
          coalesce(col("k"), lit(0L)).as("k"),
          expr("c div 100").as("bk"))
      val btot = full.groupBy(col("et"), col("bk")).agg(sum(col("k")).as("t"))
      val base = btot
        .join(broadcast(btot.select(col("et").as("e2"), col("bk").as("b2"),
          col("t").as("t2"))),
          col("e2") === col("et") && col("b2") < col("bk"), "left")
        .groupBy(col("et"), col("bk"))
        .agg(coalesce(sum(col("t2")), lit(0L)).as("base"))
      val wb = org.apache.spark.sql.expressions.Window
        .partitionBy("et", "bk").orderBy(col("c").asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
      val cdf = full.join(broadcast(base), Seq("et", "bk"))
        .select(col("et"), col("c"), col("n"),
          (col("base") + sum(col("k")).over(wb)).as("cum"))
      val a = cdf.select(col("et").as("type_a"), col("c"),
        col("n").as("n_a"), col("cum").as("cum_a"))
      val b = cdf.select(col("et").as("type_b"), col("c").as("c2"),
        col("n").as("n_b"), col("cum").as("cum_b"))
      a.join(b, col("c") === col("c2") && col("type_a") < col("type_b"))
        .groupBy(col("type_a"), col("type_b"), col("n_a"), col("n_b"))
        .agg(max(abs(col("cum_a").cast(DecimalType(20, 0)) *
          col("n_b").cast(DecimalType(18, 0)) -
          col("cum_b").cast(DecimalType(20, 0)) *
          col("n_a").cast(DecimalType(18, 0)))).as("md"))
        .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
          round(col("md").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double")), 9).as("ks"))
    }),

    // One-way ANOVA across ALL event types at once — the k-group
    // generalization of q_stats_ttest (which tests pairs): F =
    // (SSB/(k-1)) / (SSW/(n-k)) with between/within sums of squares
    // derived from the same exact integer-cents moments (n, Σc, Σc² per
    // type; squares through DECIMAL). One events-sized aggregate to a
    // |types|-row relation, collapsed to a single broadcast row; doubles
    // only in the final F expression, identical in both engines.
    "q_stats_anova" -> ((s, d) => {
      val m = t(s, d, "events")
        .select(col("event_type"), cents(col("value")).as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("c").cast(DecimalType(18, 0))).cast(DecimalType(24, 0)).as("s"),
          sum((col("c") * col("c")).cast(DecimalType(20, 0)))
            .cast(DecimalType(38, 0)).as("ssq"))
      def dd(c: Column) = c.cast("double")
      // per-type Σc²/n rides as a round-pinned DECIMAL so the k-row
      // reduction is order-independent like every other grand total.
      m.select(col("n"), col("s"), col("ssq"),
          round(dd(col("s")) * dd(col("s")) / dd(col("n")), 6)
            .cast(DecimalType(28, 6)).as("gm"))
        .agg(count(lit(1)).as("k"), sum(col("n")).as("n"),
          sum(col("s")).as("ts"), sum(col("ssq")).as("tq"),
          sum(col("gm")).as("tg"))
        .select(col("k"), col("n"),
          round((dd(col("tg")) - dd(col("ts")) * dd(col("ts")) / dd(col("n"))) /
            dd(col("k") - 1), 4).as("ms_between"),
          round((dd(col("tq")) - dd(col("tg"))) / dd(col("n") - col("k")), 4)
            .as("ms_within"),
          round(((dd(col("tg")) - dd(col("ts")) * dd(col("ts")) / dd(col("n"))) /
            dd(col("k") - 1)) /
            ((dd(col("tq")) - dd(col("tg"))) / dd(col("n") - col("k"))), 6)
            .as("f_stat"))
    }),

    // Welch's unequal-variance t-test between every event-type pair's
    // spend means — the mean-shift companion of q_stats_ks (which sees
    // any distribution change) and q_stats_chisq (categorical): t and
    // the Welch–Satterthwaite df from EXACT integer-cents moments
    // (n, Σc, Σc² — the squares routed through DECIMAL so 100 TB row
    // counts can't overflow a bigint sum); doubles only in the final
    // identical-on-both-engines t/df expressions. Scale shape: one
    // events-sized aggregate to a |types|-row moments relation; the
    // pairwise join is over that constant-size relation.
    "q_stats_ttest" -> ((s, d) => {
      val m = t(s, d, "events")
        .select(col("event_type"), cents(col("value")).as("c"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("c").cast(DecimalType(18, 0))).cast(DecimalType(24, 0)).as("s"),
          sum((col("c") * col("c")).cast(DecimalType(20, 0)))
            .cast(DecimalType(38, 0)).as("ssq"))
      def dd(c: Column) = c.cast("double")
      def variance(n: Column, s: Column, ssq: Column) =
        (dd(ssq) - dd(s) * dd(s) / dd(n)) / dd(n - 1)
      val a = m.select(col("event_type").as("type_a"), col("n").as("na"),
        col("s").as("sa"), col("ssq").as("qa"))
      val b = m.select(col("event_type").as("type_b"), col("n").as("nb"),
        col("s").as("sb"), col("ssq").as("qb"))
      val va = variance(col("na"), col("sa"), col("qa"))
      val vb = variance(col("nb"), col("sb"), col("qb"))
      val se2 = va / dd(col("na")) + vb / dd(col("nb"))
      val df = se2 * se2 /
        ((va / dd(col("na"))) * (va / dd(col("na"))) / dd(col("na") - 1) +
         (vb / dd(col("nb"))) * (vb / dd(col("nb"))) / dd(col("nb") - 1))
      a.join(broadcast(b), col("type_a") < col("type_b"))
        .select(col("type_a"), col("type_b"),
          col("na").as("n_a"), col("nb").as("n_b"),
          round(dd(col("sa")) / dd(col("na")) / 100.0, 4).as("mean_a"),
          round(dd(col("sb")) / dd(col("nb")) / 100.0, 4).as("mean_b"),
          round((dd(col("sa")) / dd(col("na")) - dd(col("sb")) / dd(col("nb"))) /
            sqrt(se2), 6).as("t_stat"),
          round(df, 3).as("df_welch"))
    }),

    // Benford leading-digit audit of the spend column, per event type —
    // the forensic data-quality screen for fabricated or clipped value
    // distributions. The leading digit comes from the exact integer
    // cents via string head (locale-free in both engines; no log10
    // whose floor could flip at a power-of-ten boundary); shares and the
    // Benford expectation ln(1+1/d)/ln(10) are the only doubles, rounded
    // on both sides. Scale shape: one events-sized agg to a |types|x9
    // cell relation; everything after is constant-size.
    "q_dq_benford" -> ((s, d) => {
      val cells = t(s, d, "events")
        .select(col("event_type"), cents(col("value")).as("c"))
        .filter(col("c") > 0)
        .select(col("event_type"),
          substring(col("c").cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy(col("event_type"), col("digit"))
        .agg(count(lit(1)).as("n"))
        .transform(graft.CacheScope.persisted(_))
      val tot = cells.groupBy("event_type").agg(sum(col("n")).as("tn"))
      val share = col("n").cast("double") / col("tn").cast("double")
      val benford = log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
        log(lit(10.0))
      cells.join(tot, "event_type")
        .select(col("event_type"), col("digit"), col("n"),
          round(share, 6).as("share"),
          round(benford, 6).as("benford"),
          round(share - benford, 6).as("dev"))
    }),

    // Spearman rank correlation between quantity and price PER SUPPLIER —
    // the monotone-association screen Pearson (q_corr) misses when the
    // relationship is nonlinear. Ranks are average-ranks doubled into
    // exact integers (2·avgrank = 2·rank_min + ties − 1, so ties never
    // introduce a .5 float), then Pearson-on-ranks runs through the same
    // exact DECIMAL moment discipline as q_stats_linreg; doubles only in
    // the final rho division. Scale shape: the rank windows partition by
    // l_suppkey — tens of thousands of small independent groups, the
    // embarrassingly-parallel window shape (no global sort anywhere);
    // at 100 TB a supplier's lineitems still fit one task by orders of
    // magnitude. Degenerate groups (n<10 or zero rank variance, i.e. a
    // column constant within the supplier) are gated out on the exact
    // decimals so neither engine divides by zero.
    "q_stats_spearman" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val li = t(s, d, "lineitem").select(col("l_suppkey").as("sk"),
        cents(col("l_quantity")).as("x"), cents(col("l_extendedprice")).as("y"))
      def rank2(v: String): Column =
        (lit(2) * rank().over(Window.partitionBy("sk").orderBy(col(v).asc)) +
          count(lit(1)).over(Window.partitionBy("sk", v)) - 1)
          .cast(DecimalType(16, 0))
      val m = li.select(col("sk"), rank2("x").as("rx"), rank2("y").as("ry"))
        .groupBy("sk")
        .agg(count(lit(1)).cast(DecimalType(8, 0)).as("n"),
          sum(col("rx")).cast(DecimalType(18, 0)).as("sx"),
          sum(col("ry")).cast(DecimalType(18, 0)).as("sy"),
          sum(col("rx") * col("ry")).cast(DecimalType(30, 0)).as("sxy"),
          sum(col("rx") * col("rx")).cast(DecimalType(30, 0)).as("sxx"),
          sum(col("ry") * col("ry")).cast(DecimalType(30, 0)).as("syy"))
      val vx = col("n") * col("sxx") - col("sx") * col("sx")
      val vy = col("n") * col("syy") - col("sy") * col("sy")
      m.filter(col("n") >= 10 && vx > 0 && vy > 0)
        .select(col("sk").as("suppkey"), col("n").cast("long").as("n_items"),
          round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt(vx.cast("double") * vy.cast("double")), 9).as("rho"))
    }))

  override val oracles: Map[String, String] = Map(

    "q_stats_spearman" ->
      """WITH li AS (
        |  SELECT l_suppkey AS sk,
        |         CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS x,
        |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
        |  FROM lineitem
        |), ranked AS (
        |  SELECT sk,
        |         CAST(2 * rank() OVER (PARTITION BY sk ORDER BY x)
        |              + count(*) OVER (PARTITION BY sk, x) - 1 AS DECIMAL(16,0)) AS rx,
        |         CAST(2 * rank() OVER (PARTITION BY sk ORDER BY y)
        |              + count(*) OVER (PARTITION BY sk, y) - 1 AS DECIMAL(16,0)) AS ry
        |  FROM li
        |), m AS (
        |  SELECT sk, CAST(count(*) AS DECIMAL(8,0)) AS n,
        |         CAST(sum(rx) AS DECIMAL(18,0)) AS sx,
        |         CAST(sum(ry) AS DECIMAL(18,0)) AS sy,
        |         CAST(sum(rx * ry) AS DECIMAL(30,0)) AS sxy,
        |         CAST(sum(rx * rx) AS DECIMAL(30,0)) AS sxx,
        |         CAST(sum(ry * ry) AS DECIMAL(30,0)) AS syy
        |  FROM ranked GROUP BY sk
        |)
        |SELECT sk AS suppkey, CAST(n AS BIGINT) AS n_items,
        |       round(CAST(n * sxy - sx * sy AS DOUBLE) /
        |             sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
        |                  CAST(n * syy - sy * sy AS DOUBLE)), 9) AS rho
        |FROM m
        |WHERE n >= 10 AND n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0""".stripMargin,

    "q_stats_chisq" ->
      """WITH cells AS (
        |  SELECT event_type, CAST(hour(ts) // 6 AS INTEGER) AS bucket,
        |         count(*) AS o
        |  FROM events GROUP BY 1, 2
        |), rt AS (SELECT event_type, sum(o) AS rt FROM cells GROUP BY 1),
        |ct AS (SELECT bucket, sum(o) AS ct FROM cells GROUP BY 1),
        |g AS (
        |  SELECT sum(o) AS n,
        |         (count(DISTINCT event_type) - 1) *
        |         (count(DISTINCT bucket) - 1) AS dof
        |  FROM cells
        |), per AS (
        |  SELECT c.event_type, c.bucket, c.o AS observed,
        |         round(CAST(r.rt * t.ct AS DOUBLE) / CAST(g.n AS DOUBLE), 6) AS expected,
        |         round((CAST(c.o AS DOUBLE) - CAST(r.rt * t.ct AS DOUBLE) / CAST(g.n AS DOUBLE)) *
        |               (CAST(c.o AS DOUBLE) - CAST(r.rt * t.ct AS DOUBLE) / CAST(g.n AS DOUBLE)) /
        |               (CAST(r.rt * t.ct AS DOUBLE) / CAST(g.n AS DOUBLE)), 6) AS contrib,
        |         g.dof AS dof
        |  FROM cells c
        |  JOIN rt r ON r.event_type = c.event_type
        |  JOIN ct t ON t.bucket = c.bucket
        |  CROSS JOIN g
        |)
        |SELECT event_type, bucket, observed, expected, contrib,
        |       (SELECT CAST(sum(CAST(contrib AS DECIMAL(18,6))) AS DOUBLE) FROM per) AS chi2,
        |       dof
        |FROM per""".stripMargin,

    "q_stats_linreg" ->
      s"""WITH daily AS (
         |  SELECT event_type,
         |         CAST(CAST(date_trunc('day', ts) AS DATE) - DATE '1970-01-01' AS DECIMAL(10,0)) AS ti,
         |         CAST(sum($CentsSql) AS DECIMAL(14,0)) AS y
         |  FROM events GROUP BY event_type, date_trunc('day', ts)
         |), m AS (
         |  SELECT event_type,
         |         CAST(count(*) AS DECIMAL(6,0)) AS n,
         |         CAST(sum(ti) AS DECIMAL(16,0)) AS st,
         |         CAST(sum(y) AS DECIMAL(16,0)) AS sy,
         |         CAST(sum(ti * y) AS DECIMAL(30,0)) AS sty,
         |         CAST(sum(ti * ti) AS DECIMAL(30,0)) AS stt,
         |         CAST(sum(y * y) AS DECIMAL(30,0)) AS syy
         |  FROM daily GROUP BY 1
         |)
         |SELECT event_type, CAST(n AS BIGINT) AS n_days,
         |       round(CAST(n * sty - st * sy AS DOUBLE) /
         |             CAST(n * stt - st * st AS DOUBLE) / 100.0, 9) AS slope,
         |       round((CAST(sy AS DOUBLE) -
         |              CAST(n * sty - st * sy AS DOUBLE) /
         |              CAST(n * stt - st * st AS DOUBLE) * CAST(st AS DOUBLE)) /
         |             (CAST(n AS DOUBLE) * 100.0), 4) AS intercept,
         |       round(CAST(n * sty - st * sy AS DOUBLE) * CAST(n * sty - st * sy AS DOUBLE) /
         |             (CAST(n * stt - st * st AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE)),
         |             6) AS r2
         |FROM m
         |WHERE n >= 2 AND n * stt - st * st > 0 AND n * syy - sy * sy > 0""".stripMargin,

    "q_dq_drift_psi" ->
      s"""WITH ev AS (
         |  SELECT event_type, epoch_us(ts) AS us, $CentsSql AS c FROM events
         |), rng AS (
         |  SELECT min(us) AS us0, max(us) AS us1, min(c) AS c0, max(c) AS c1 FROM ev
         |), binned AS (
         |  SELECT event_type,
         |         CAST(least($PsiBins - 1, (c - c0) * $PsiBins // (c1 - c0 + 1)) AS INTEGER) AS bin,
         |         CAST(sum(CASE WHEN us < us0 + (us1 - us0) // 2 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
         |         CAST(sum(CASE WHEN us < us0 + (us1 - us0) // 2 THEN 0 ELSE 1 END) AS BIGINT) AS cb
         |  FROM ev CROSS JOIN rng
         |  GROUP BY 1, 2
         |), tots AS (
         |  SELECT event_type, sum(ca) AS ta, sum(cb) AS tb FROM binned GROUP BY 1
         |), per AS (
         |  SELECT b.event_type, b.bin, b.ca AS n_first, b.cb AS n_second,
         |         round((CAST(b.ca + 1 AS DOUBLE) / CAST(t.ta + $PsiBins AS DOUBLE) -
         |                CAST(b.cb + 1 AS DOUBLE) / CAST(t.tb + $PsiBins AS DOUBLE)) *
         |               ln((CAST(b.ca + 1 AS DOUBLE) / CAST(t.ta + $PsiBins AS DOUBLE)) /
         |                  (CAST(b.cb + 1 AS DOUBLE) / CAST(t.tb + $PsiBins AS DOUBLE))),
         |               9) AS psi_bin
         |  FROM binned b JOIN tots t ON t.event_type = b.event_type
         |)
         |SELECT p.event_type, p.bin, p.n_first, p.n_second, p.psi_bin,
         |       round(s.psi_total, 9) AS psi_total
         |FROM per p JOIN (
         |  SELECT event_type,
         |         CAST(sum(CAST(psi_bin AS DECIMAL(18,9))) AS DOUBLE) AS psi_total
         |  FROM per GROUP BY 1
         |) s ON s.event_type = p.event_type""".stripMargin,

    // Window-cumulative formulation (deliberately different from the
    // Spark side's triangular broadcast joins — the oracle runs on one
    // box and may sort globally).
    "q_events_survival" ->
      """WITH dm AS (
        |  SELECT max(CAST(date_trunc('day', ts) AS DATE)) AS dmax FROM events
        |), u AS (
        |  SELECT user_id,
        |         CAST(max(CAST(date_trunc('day', ts) AS DATE)) -
        |              min(CAST(date_trunc('day', ts) AS DATE)) AS INTEGER) AS lt,
        |         max(CAST(date_trunc('day', ts) AS DATE)) <= (SELECT dmax FROM dm) - 7 AS churned
        |  FROM events GROUP BY user_id
        |), l AS (
        |  SELECT lt,
        |         CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS dd,
        |         CAST(sum(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT) AS cc
        |  FROM u GROUP BY 1
        |), nr AS (
        |  SELECT lt, dd,
        |         CAST(sum(dd + cc) OVER (ORDER BY lt DESC
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n
        |  FROM l
        |), s AS (
        |  SELECT lt, dd, n,
        |         sum(CASE WHEN dd > 0 AND n > dd
        |               THEN CAST(round(ln(CAST(n - dd AS DOUBLE) / CAST(n AS DOUBLE)), 9)
        |                         AS DECIMAL(18,9))
        |               ELSE CAST(0 AS DECIMAL(18,9)) END)
        |           OVER (ORDER BY lt ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS slf,
        |         max(CASE WHEN dd >= n THEN 1 ELSE 0 END)
        |           OVER (ORDER BY lt ASC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hz
        |  FROM nr
        |)
        |SELECT lt AS lifetime_days, n AS n_risk, dd AS n_churned,
        |       CASE WHEN hz = 1 THEN 0.0
        |            ELSE round(exp(CAST(slf AS DOUBLE)), 6) END AS survival
        |FROM s""".stripMargin,

    // Global row_number formulation; the exact-integer Gini reduction is
    // computed through HUGEINT (Spark's exact DECIMAL twin).
    "q_events_gini" ->
      """WITH u AS (
        |  SELECT user_id,
        |         CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) AS BIGINT) AS m
        |  FROM events GROUP BY 1
        |), r AS (
        |  SELECT m, row_number() OVER (ORDER BY m ASC, user_id ASC) AS rk,
        |         count(*) OVER () AS n
        |  FROM u
        |)
        |SELECT any_value(n) AS n_users,
        |       round(CAST(sum(CAST(m AS HUGEINT)) AS DOUBLE) / 100.0, 2) AS total_spend,
        |       round(CAST(2 * sum(CAST(rk AS HUGEINT) * CAST(m AS HUGEINT)) -
        |                  (any_value(n) + 1) * sum(CAST(m AS HUGEINT)) AS DOUBLE) /
        |             CAST(any_value(n) * sum(CAST(m AS HUGEINT)) AS DOUBLE), 6) AS gini,
        |       round(CAST(sum(CASE WHEN rk * 10 > n * 9 THEN m ELSE 0 END) AS DOUBLE) /
        |             CAST(sum(CAST(m AS HUGEINT)) AS DOUBLE), 6) AS top10_share
        |FROM r""".stripMargin,

    "q_events_rfm" ->
      """WITH u AS (
        |  SELECT user_id,
        |         CAST((SELECT max(CAST(date_trunc('day', ts) AS DATE)) FROM events) -
        |              max(CAST(date_trunc('day', ts) AS DATE)) AS INTEGER) AS recency_days,
        |         count(*) AS frequency,
        |         CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)) // 100 AS BIGINT) AS monetary_units
        |  FROM events GROUP BY user_id
        |), b AS (
        |  SELECT quantile_cont(recency_days, 0.2) AS r20, quantile_cont(recency_days, 0.4) AS r40,
        |         quantile_cont(recency_days, 0.6) AS r60, quantile_cont(recency_days, 0.8) AS r80,
        |         quantile_cont(frequency, 0.2) AS f20, quantile_cont(frequency, 0.4) AS f40,
        |         quantile_cont(frequency, 0.6) AS f60, quantile_cont(frequency, 0.8) AS f80,
        |         quantile_cont(monetary_units, 0.2) AS m20, quantile_cont(monetary_units, 0.4) AS m40,
        |         quantile_cont(monetary_units, 0.6) AS m60, quantile_cont(monetary_units, 0.8) AS m80
        |  FROM u
        |)
        |SELECT user_id, recency_days, frequency, monetary_units,
        |       6 - (1 + CAST(recency_days > r20 AS INTEGER) + CAST(recency_days > r40 AS INTEGER)
        |              + CAST(recency_days > r60 AS INTEGER) + CAST(recency_days > r80 AS INTEGER)) AS r_score,
        |       1 + CAST(frequency > f20 AS INTEGER) + CAST(frequency > f40 AS INTEGER)
        |         + CAST(frequency > f60 AS INTEGER) + CAST(frequency > f80 AS INTEGER) AS f_score,
        |       1 + CAST(monetary_units > m20 AS INTEGER) + CAST(monetary_units > m40 AS INTEGER)
        |         + CAST(monetary_units > m60 AS INTEGER) + CAST(monetary_units > m80 AS INTEGER) AS m_score
        |FROM u CROSS JOIN b""".stripMargin,

    // Unrolled gradient-descent CTEs (one w_i per pass), the identical
    // sigmoid expression tree and round-then-DECIMAL gradient sums.
    "q_stats_logreg" -> logregSql,

    // Plain window-cumsum CDF formulation — deliberately different from
    // the Spark side's two-level prefix sum, same exact integers.
    "q_stats_ks" ->
      s"""WITH ev AS (
         |  SELECT event_type AS et, $CentsSql AS c FROM events
         |), cnt AS (
         |  SELECT et, c, count(*) AS k FROM ev GROUP BY et, c
         |), grid AS (
         |  SELECT DISTINCT c FROM cnt
         |), ty AS (
         |  SELECT et, CAST(sum(k) AS BIGINT) AS n FROM cnt GROUP BY et
         |), f AS (
         |  SELECT t.et, g.c, t.n, COALESCE(k.k, 0) AS k
         |  FROM grid g CROSS JOIN ty t
         |  LEFT JOIN cnt k ON k.et = t.et AND k.c = g.c
         |), cdf AS (
         |  SELECT et, c, n,
         |         sum(k) OVER (PARTITION BY et ORDER BY c ASC
         |                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
         |  FROM f
         |)
         |SELECT a.et AS type_a, b.et AS type_b, a.n AS n_a, b.n AS n_b,
         |       round(CAST(max(abs(CAST(a.cum AS DECIMAL(20,0)) * CAST(b.n AS DECIMAL(18,0)) -
         |                          CAST(b.cum AS DECIMAL(20,0)) * CAST(a.n AS DECIMAL(18,0)))) AS DOUBLE) /
         |             (CAST(a.n AS DOUBLE) * CAST(b.n AS DOUBLE)), 9) AS ks
         |FROM cdf a JOIN cdf b ON a.c = b.c AND a.et < b.et
         |GROUP BY a.et, b.et, a.n, b.n""".stripMargin,

    "q_stats_anova" ->
      s"""WITH m AS (
         |  SELECT event_type, count(*) AS n,
         |         CAST(sum(CAST(c AS DECIMAL(18,0))) AS DECIMAL(24,0)) AS s,
         |         CAST(sum(CAST(c * c AS DECIMAL(20,0))) AS DECIMAL(38,0)) AS ssq
         |  FROM (SELECT event_type, $CentsSql AS c FROM events)
         |  GROUP BY event_type
         |), g AS (
         |  SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS n,
         |         CAST(sum(s) AS DECIMAL(24,0)) AS ts,
         |         CAST(sum(ssq) AS DECIMAL(38,0)) AS tq,
         |         sum(CAST(round(CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
         |                        CAST(n AS DOUBLE), 6) AS DECIMAL(28,6))) AS tg
         |  FROM m
         |)
         |SELECT k, n,
         |       round((CAST(tg AS DOUBLE) - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE) /
         |              CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE), 4) AS ms_between,
         |       round((CAST(tq AS DOUBLE) - CAST(tg AS DOUBLE)) /
         |             CAST(n - k AS DOUBLE), 4) AS ms_within,
         |       round(((CAST(tg AS DOUBLE) - CAST(ts AS DOUBLE) * CAST(ts AS DOUBLE) /
         |               CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE)) /
         |             ((CAST(tq AS DOUBLE) - CAST(tg AS DOUBLE)) /
         |              CAST(n - k AS DOUBLE)), 6) AS f_stat
         |FROM g""".stripMargin,

    "q_stats_ttest" ->
      s"""WITH m AS (
         |  SELECT event_type, count(*) AS n,
         |         CAST(sum(CAST(c AS DECIMAL(18,0))) AS DECIMAL(24,0)) AS s,
         |         CAST(sum(CAST(c * c AS DECIMAL(20,0))) AS DECIMAL(38,0)) AS ssq
         |  FROM (SELECT event_type, $CentsSql AS c FROM events)
         |  GROUP BY event_type
         |), v AS (
         |  SELECT event_type, n, s,
         |         ((CAST(ssq AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) /
         |           CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) / CAST(n AS DOUBLE) AS vn
         |  FROM m
         |)
         |SELECT a.event_type AS type_a, b.event_type AS type_b,
         |       a.n AS n_a, b.n AS n_b,
         |       round(CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) / 100.0, 4) AS mean_a,
         |       round(CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE) / 100.0, 4) AS mean_b,
         |       round((CAST(a.s AS DOUBLE) / CAST(a.n AS DOUBLE) -
         |              CAST(b.s AS DOUBLE) / CAST(b.n AS DOUBLE)) /
         |             sqrt(a.vn + b.vn), 6) AS t_stat,
         |       round((a.vn + b.vn) * (a.vn + b.vn) /
         |             (a.vn * a.vn / CAST(a.n - 1 AS DOUBLE) +
         |              b.vn * b.vn / CAST(b.n - 1 AS DOUBLE)), 3) AS df_welch
         |FROM v a JOIN v b ON a.event_type < b.event_type""".stripMargin,

    "q_dq_benford" ->
      s"""WITH cells AS (
         |  SELECT event_type,
         |         CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INTEGER) AS digit,
         |         count(*) AS n
         |  FROM (SELECT event_type, $CentsSql AS c FROM events) WHERE c > 0
         |  GROUP BY 1, 2
         |), tot AS (
         |  SELECT event_type, sum(n) AS tn FROM cells GROUP BY 1
         |)
         |SELECT c.event_type, c.digit, c.n,
         |       round(CAST(c.n AS DOUBLE) / CAST(t.tn AS DOUBLE), 6) AS share,
         |       round(ln(1.0 + 1.0 / CAST(c.digit AS DOUBLE)) / ln(10.0), 6) AS benford,
         |       round(CAST(c.n AS DOUBLE) / CAST(t.tn AS DOUBLE) -
         |             ln(1.0 + 1.0 / CAST(c.digit AS DOUBLE)) / ln(10.0), 6) AS dev
         |FROM cells c JOIN tot t ON t.event_type = c.event_type""".stripMargin)

  /** The logreg oracle: w0 holds the zero init; each g_i/w_i CTE pair is
    * one gradient pass. SIG is the same double expression tree as the
    * Spark side's `p`.
    */
  private def logregSql: String = {
    def sig(w: String) =
      s"1.0 / (1.0 + exp(-($w.w0 + $w.w1 * e.x1 + $w.w2 * e.x2)))"
    val iters = (1 to LogRegIters).map { i =>
      val s0 = sig("w")
      s"""g$i AS (
         |  SELECT sum(CAST(round(($s0 - e.y), 9) AS DECIMAL(28,9))) AS g0,
         |         sum(CAST(round(($s0 - e.y) * e.x1, 9) AS DECIMAL(28,9))) AS g1,
         |         sum(CAST(round(($s0 - e.y) * e.x2, 9) AS DECIMAL(28,9))) AS g2,
         |         count(*) AS n
         |  FROM ev e CROSS JOIN w${i - 1} w
         |), w$i AS (
         |  SELECT w.w0 - CAST(g.g0 AS DOUBLE) / CAST(g.n AS DOUBLE) AS w0,
         |         w.w1 - CAST(g.g1 AS DOUBLE) / CAST(g.n AS DOUBLE) AS w1,
         |         w.w2 - CAST(g.g2 AS DOUBLE) / CAST(g.n AS DOUBLE) AS w2
         |  FROM w${i - 1} w CROSS JOIN g$i g
         |)""".stripMargin
    }.mkString(",\n")
    val sf = sig("w")
    s"""WITH ev AS (
       |  SELECT CAST(hour(ts) AS DOUBLE) / 24.0 AS x1,
       |         CAST($CentsSql AS DOUBLE) / 50000.0 AS x2,
       |         CASE WHEN event_type = 'purchase' THEN 1.0 ELSE 0.0 END AS y
       |  FROM events
       |), w0 AS (SELECT 0.0 AS w0, 0.0 AS w1, 0.0 AS w2),
       |$iters
       |SELECT count(*) AS n_rows,
       |       round(w.w0, 6) AS w_bias,
       |       round(w.w1, 6) AS w_hour,
       |       round(w.w2, 6) AS w_value,
       |       round(CAST(sum(CAST(round(-(e.y * ln($sf) + (1.0 - e.y) * ln(1.0 - $sf)), 9)
       |                          AS DECIMAL(28,9))) AS DOUBLE) /
       |             CAST(count(*) AS DOUBLE), 6) AS log_loss
       |FROM ev e CROSS JOIN w$LogRegIters w
       |GROUP BY w.w0, w.w1, w.w2""".stripMargin
  }
}
