package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}
import InferenceQueries.{cents, CentsSql}

/** Sequential and time-structured inference over `orders`/`events` — the
  * tests whose question is about ORDER, not just distribution: the
  * Cochran-Armitage trend test (monotone in an ordered dial), Grubbs and
  * generalized-ESD outlier rounds (repeated max-deviation picks), the
  * Granger lead/lag F-screen, and the Chow structural-break test.
  * Split from [[InferenceQueries]] (r11 verdict: per-file 1,000-line
  * budget) with unchanged keys; the same determinism discipline applies —
  * exact integer/DECIMAL arithmetic selects rows (|n*x - s1| max-structs,
  * integer-div mean shifts), doubles only in final pinned closed forms
  * computed from identical operands in both engines.
  */
object InferenceSequentialQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Generalized-ESD outlier rounds (unrolled in both engines). */
  val EsdRounds = 3

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

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
        // Per-group (n, s1, s2) as a WINDOW over rem instead of a separate
        // aggregate feeding a broadcast join (r16, guide §1.2): the stats,
        // the eligibility filter, and the max-struct pick now sit in ONE
        // plan, so each round costs one job (the pin) instead of two (the
        // broadcast-build + the pin). Identical expressions on identical
        // types (window sum/count of the same columns), so the pick — and
        // the hash — cannot move; the window is PARTITIONED (event_type),
        // never global.
        val wg = Window.partitionBy("event_type")
        val st = rem
          .select(col("event_type"), col("day"), col("x"),
            count(lit(1)).over(wg).as("n"),
            sum(col("x")).over(wg).as("s1"),
            sum(col("x").cast(DecimalType(18, 0)) * col("x")).over(wg).as("s2"))
          .filter(col("n") >= 3 &&
            col("n") * col("s2") -
              col("s1").cast(DecimalType(18, 0)) * col("s1") > 0)
        val dev = abs(col("n") * col("x") - col("s1"))
        val picked = st
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

    // Entropy rate of the per-user event-type Markov chain — how
    // PREDICTABLE is the next action given the current one? The scalar
    // that summarizes q_markov_transitions' whole matrix: H_rate =
    // -sum_{s,t} (n_st/N) ln(n_st/n_s), with perplexity exp(H) the
    // effective branching factor (H -> 0: sessions are scripted; H ->
    // ln k: the chain adds nothing over the marginal). Transition counts
    // are exact integers from ONE lead() pass (window partitioned by
    // user); the |types|^2 per-cell contributions are pinned at 9dp and
    // summed in DECIMAL, so partition order can't move the 6dp result.
    "q_markov_entropy_rate" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pairs = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w).as("to_type"))
        .filter(col("to_type").isNotNull)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
        .transform(graft.CacheScope.persisted(_))
      val rows = pairs.groupBy("from_type").agg(sum(col("n")).as("rt"))
      val tot = pairs.agg(sum(col("n")).as("nn"),
        countDistinct(col("from_type")).as("k"))
      val p = col("n").cast("double") / col("nn").cast("double")
      val c = col("n").cast("double") / col("rt").cast("double")
      val h = col("hh").cast("double")
      pairs.join(broadcast(rows), "from_type")
        .crossJoin(broadcast(tot))
        .select(col("nn"), col("k"),
          round(-p * log(c), 9).cast(DecimalType(16, 9)).as("e"))
        .groupBy(col("nn"), col("k"))
        .agg(sum(col("e")).as("hh"))
        .select(col("nn").cast("long").as("n_transitions"),
          col("k").cast("long").as("n_states"),
          round(h, 6).as("entropy_rate"),
          round(exp(h), 6).as("perplexity"))
    }))

  override val oracles: Map[String, String] = Map(

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

    "q_markov_entropy_rate" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts ASC, event_id ASC) AS to_type
        |  FROM events
        |), c AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2
        |), r AS (
        |  SELECT from_type, CAST(sum(n) AS BIGINT) AS rt FROM c GROUP BY 1
        |), tot AS (
        |  SELECT CAST(sum(n) AS BIGINT) AS nn,
        |         count(DISTINCT from_type) AS k
        |  FROM c
        |), h AS (
        |  SELECT max(tot.nn) AS nn, max(tot.k) AS k,
        |         CAST(sum(CAST(round(
        |             -(CAST(c.n AS DOUBLE) / CAST(tot.nn AS DOUBLE)) *
        |             ln(CAST(c.n AS DOUBLE) / CAST(r.rt AS DOUBLE)), 9)
        |           AS DECIMAL(16,9))) AS DOUBLE) AS hh
        |  FROM c JOIN r ON r.from_type = c.from_type CROSS JOIN tot
        |)
        |SELECT CAST(nn AS BIGINT) AS n_transitions, CAST(k AS BIGINT) AS n_states,
        |       round(hh, 6) AS entropy_rate,
        |       round(exp(hh), 6) AS perplexity
        |FROM h""".stripMargin)
}
