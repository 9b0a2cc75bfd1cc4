package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.relational.Det._

/** Data-quality, profiling, and warehouse-maintenance surface: the DQ
  * constraint audit, per-column profiling, histogram / exact percentile /
  * mergeable quantile sketch, deterministic Pearson correlation, and the
  * incremental-aggregation + CDC-merge + point-in-time-lookup trio that
  * maintains derived state without rescanning the corpus.
  */
object ProfilingQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Pearson r from exact decimal sums — built-in corr() accumulates
    * doubles order-dependently and would flake the hash compare; this
    * formulation is identical double arithmetic over exact sums.
    */
  private def dcorr(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) = {
    val n = count(lit(1)).cast("double")
    val sx = dsum(x, 2)
    val sy = dsum(y, 4)
    val sxy = dsum(x * y, 4)
    val sxx = dsum(x * x, 4)
    val syy = dsum(y * y, 4)
    round((n * sxy - sx * sy) /
      (sqrt(greatest(lit(0.0), n * sxx - sx * sx)) *
        sqrt(greatest(lit(0.0), n * syy - sy * sy))), 6)
  }

  private def dcorrSql(x: String, y: String): String = {
    val n = "CAST(count(*) AS DOUBLE)"
    val sx = dsumSql(x, 2)
    val sy = dsumSql(y, 4)
    val sxy = dsumSql(s"($x) * ($y)", 4)
    val sxx = dsumSql(s"($x) * ($x)", 4)
    val syy = dsumSql(s"($y) * ($y)", 4)
    s"""round(($n * $sxy - $sx * $sy) /
       |      (sqrt(greatest(0.0, $n * $sxx - $sx * $sx)) *
       |       sqrt(greatest(0.0, $n * $syy - $sy * $sy))), 6)""".stripMargin
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Fixed-width histogram of order totals: the profiling primitive for
    // choosing bucket boundaries / spotting skew before a heavy job. One
    // partial-aggregated shuffle over a constant-size key space; floor of
    // an IEEE division is engine-independent, and the per-bucket revenue
    // goes through the exact decimal sum.
    "q_histogram" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("total"))),

    // Exact interpolated percentiles (Spark percentile == DuckDB
    // quantile_cont, verified bit-identical on this data).
    "q_percentile" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(l_extendedprice, 0.5)").as("p50"),
          expr("percentile(l_extendedprice, 0.9)").as("p90"),
          expr("percentile(l_quantity, 0.25)").as("qty_p25"))),

    // Deterministic Pearson correlation per group.
    "q_corr" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(dcorr(col("l_quantity"), col("l_extendedprice")).as("corr_qty_price"),
          count(lit(1)).as("n"))),

    // First-order partial correlation r_xy·z — quantity↔price with the
    // discount channel removed — from the SAME exact-decimal sum kernel
    // as q_corr: the three pairwise r's are composed UNROUNDED (rounding
    // intermediates would corrupt the composition) into
    // (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)); every step after the
    // exact decimal sums is correctly-rounded IEEE, so both engines
    // produce the identical double before the single final round. One
    // grouped aggregation of nine exact sums — the full profile costs
    // exactly one shuffle of constant-width rows.
    "q_stats_partial_corr" -> ((s, d) => {
      val g = t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast("double").as("n"),
          dsum(col("l_quantity"), 2).as("sx"),
          dsum(col("l_extendedprice"), 4).as("sy"),
          dsum(col("l_discount"), 4).as("sz"),
          dsum(col("l_quantity") * col("l_extendedprice"), 4).as("sxy"),
          dsum(col("l_quantity") * col("l_discount"), 4).as("sxz"),
          dsum(col("l_extendedprice") * col("l_discount"), 4).as("syz"),
          dsum(col("l_quantity") * col("l_quantity"), 4).as("sxx"),
          dsum(col("l_extendedprice") * col("l_extendedprice"), 4).as("syy"),
          dsum(col("l_discount") * col("l_discount"), 4).as("szz"))
      def r(sab: org.apache.spark.sql.Column, sa: org.apache.spark.sql.Column,
          sb: org.apache.spark.sql.Column, saa: org.apache.spark.sql.Column,
          sbb: org.apache.spark.sql.Column) =
        (col("n") * sab - sa * sb) /
          (sqrt(greatest(lit(0.0), col("n") * saa - sa * sa)) *
            sqrt(greatest(lit(0.0), col("n") * sbb - sb * sb)))
      val rxy = r(col("sxy"), col("sx"), col("sy"), col("sxx"), col("syy"))
      val rxz = r(col("sxz"), col("sx"), col("sz"), col("sxx"), col("szz"))
      val ryz = r(col("syz"), col("sy"), col("sz"), col("syy"), col("szz"))
      g.select(col("l_returnflag"), col("n").cast("long").as("n"),
        round(rxy, 6).as("r_xy"), round(rxz, 6).as("r_xz"),
        round(ryz, 6).as("r_yz"),
        round((rxy - rxz * ryz) /
          sqrt((lit(1.0) - rxz * rxz) * (lit(1.0) - ryz * ryz)), 6)
          .as("r_xy_given_z"))
    }),

    // Incremental aggregation (materialized-view maintenance): daily
    // partial states (sum as DECIMAL, count) merge into the monthly
    // rollup. This is the structure an incremental ETL keeps on disk —
    // when a day of data lands, only that day's partial is recomputed and
    // the merge re-run; the corpus is never rescanned. The merge is exact
    // because the partial stays DECIMAL until after the final sum (a
    // double-typed partial would make the merge order-dependent), and avg
    // is carried as the MERGEABLE (sum, count) pair, never as an average
    // of averages. Oracle computes the DIRECT single-level monthly
    // aggregate — equality IS the mergeability proof.
    "q_incremental_agg" -> ((s, d) => {
      val daily = t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(date_trunc("month", col("o_orderdate")).cast("date").as("month"),
          col("o_orderdate").cast("date").as("day"),
          (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast(org.apache.spark.sql.types.DecimalType(18, 4)).as("rev"))
        .groupBy("month", "day")
        .agg(sum(col("rev")).as("s"), count(lit(1)).as("n"))
      daily.groupBy("month")
        .agg(sum(col("s")).as("sd"), sum(col("n")).as("n_items"))
        .select(col("month"), col("sd").cast("double").as("revenue"),
          col("n_items"),
          round(col("sd").cast("double") / col("n_items"), 4).as("avg_rev"))
    }),

    // CDC merge / upsert through [[graft.operators.Upsert]] (MERGE INTO
    // semantics; see that object for the one-shuffle argmax design).
    // Base = orders before 1999; delta = a derived adjustment feed for
    // 1998+ (1998 overlaps base -> updates; 1999+ -> inserts). The
    // oracle is the INDEPENDENT delta-UNION-(base ANTI delta)
    // formulation, so a precedence bug in either shape breaks the match.
    // The delta price is base + 1000.0 exactly (no rounding step —
    // cross-engine double rounding of computed values is the known hash
    // hazard). StreamingSpec replays the same delta through a
    // foreachBatch sink built on the same Upsert.upsert and asserts
    // convergence to this result.
    "q_cdc_merge" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val base = orders
        .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
          lit(0L).as("ver"))
      val delta = orders
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp"))
        .select(col("o_orderkey"),
          (col("o_totalprice") + lit(1000.0)).as("o_totalprice"),
          lit("U").as("o_orderstatus"), lit(1L).as("ver"))
      graft.operators.Upsert.upsert(base, delta, "o_orderkey", "ver")
    }),

    // Point-in-time lookup (the AS-OF warehouse join): recover each
    // purchase's SCD2 state at event time by joining the registered
    // q_scd2_intervals dimension on user + containment in
    // [valid_from, valid_to). Interval containment with a NULL-open tail
    // would be quadratic per user as a raw theta join; per-user event
    // counts bound the pair fan-out exactly as the funnel's joins (the
    // dimension has one CHANGE POINT per state, far fewer rows than
    // events). Query composition is the point: the dimension side IS the
    // registered SCD2 builder, not a re-statement.
    "q_pit_lookup" -> ((s, d) => {
      val dim = WindowQueries.queries("q_scd2_intervals")(s, d)
        .select(col("user_id").as("d_user"), col("event_type").as("state"),
          col("valid_from"), col("valid_to"))
      t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id"), col("ts"))
        .join(dim,
          col("user_id") === col("d_user") &&
            col("ts") >= col("valid_from") &&
            (col("valid_to").isNull || col("ts") < col("valid_to")))
        .select(col("user_id"), col("event_id"), col("ts"), col("state"),
          col("valid_from"))
    }),

    // Data-quality constraint audit (the Deequ/dbt-test shape): one scan
    // computes every column-level check as a conditional aggregate —
    // key uniqueness, non-negativity, a freshness/date-range gate, a
    // categorical domain gate — then ONE unpivot turns the single
    // metrics row into (check_name, violations); the FK check is a
    // left-anti count against the dimension. Two small jobs total, no
    // per-check scans. The date and domain gates are deliberately
    // tighter than the data (orders run to 2001; '5-LOW' is excluded) so
    // the audit FINDS drift here — the shape drift detection takes in a
    // real pipeline ("a new category appeared", "data newer than the
    // contract").
    "q_dq_checks" -> ((s, d) => {
      val o = t(s, d, "orders")
      val m = o.agg(
        (count(lit(1)) - countDistinct(col("o_orderkey"))).as("orderkey_dup"),
        sum(when(col("o_totalprice") < 0, 1L).otherwise(0L))
          .as("price_negative"),
        sum(when(col("o_orderdate") < lit("1995-01-01").cast("timestamp") ||
            col("o_orderdate") >= lit("2000-01-01").cast("timestamp"), 1L)
          .otherwise(0L)).as("date_out_of_contract"),
        sum(when(!col("o_orderpriority").isin(
            "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED"), 1L)
          .otherwise(0L)).as("priority_domain"))
      val fk = o
        .join(t(s, d, "customer").select(col("c_custkey")),
          col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("violations"))
        .select(lit("custkey_fk").as("check_name"), col("violations"))
      m.unpivot(Array.empty, "check_name", "violations")
        .unionByName(fk)
        .select(col("check_name"), col("violations"),
          when(col("violations") === 0, 1L).otherwise(0L).as("pass"))
    }),

    // Mergeable histogram quantile: approximate p50/p90/p99 from
    // fixed-width bucket counts with linear interpolation — the
    // constant-state quantile a 100 TB profiler keeps (bucket counts
    // merge across shards/days by addition, unlike an exact sort-rank;
    // q_percentile is the exact sibling). One partial-agg shuffle over a
    // constant keyspace; the cumulative sum and the per-quantile argmin
    // run on the constant-size bucket relation via broadcast self-join —
    // no global window, no collect. Every interpolated value derives
    // from integer counts and the fixed width, so the double arithmetic
    // is bit-identical across engines.
    "q_quantile_sketch" -> ((s, d) => {
      val W = 50000.0
      val b = t(s, d, "orders")
        .groupBy(floor(col("o_totalprice") / W).cast("long").as("b"))
        .agg(count(lit(1)).as("bn"))
        .transform(graft.CacheScope.persisted(_))
      val tot = b.agg(sum(col("bn")).as("total"))
      val cum = b
        .join(broadcast(b.select(col("b").as("b2"), col("bn").as("bn2"))),
          col("b2") <= col("b"))
        .groupBy(col("b"), col("bn"))
        .agg(sum(col("bn2")).as("cum"))
      val qs = b.sparkSession.range(1)
        .select(explode(array(lit(0.5), lit(0.9), lit(0.99))).as("q"))
      cum.crossJoin(broadcast(tot)).crossJoin(broadcast(qs))
        .withColumn("k", ceil(col("q") * col("total")).cast("long"))
        .filter(col("cum") >= col("k"))
        .groupBy(col("q"), col("k"))
        .agg(min(struct(col("b"), col("bn"), col("cum"))).as("m"))
        .select(col("q"),
          round(lit(W) * col("m.b") +
            lit(W) * (col("k") - (col("m.cum") - col("m.bn"))).cast("double") /
              col("m.bn"), 6).as("value"),
          col("k").as("rank"))
    }),

    // Column-profiling pass over orders — the data-quality summary a
    // pipeline runs BEFORE trusting a new drop: per column, row/non-null/
    // distinct counts and min/max rendered to strings. One aggregate PER
    // COLUMN, unioned — deliberately not the single-pass multi-distinct
    // formulation, whose Expand operator multiplies every row by the
    // column count through one wide shuffle (measured 3.1s vs 0.2s at
    // sf0.1); with a columnar source, six pruned single-column scans
    // each feeding a two-phase distinct aggregate is the plan that
    // survives a 100x scale-up, and the six jobs share nothing.
    // Per-user event-type entropy — the behavioral-diversity profile
    // (a bot replays one action; a human mixes several): H = ln n −
    // (Σ c·ln c)/n over each user's exact per-type counts, the
    // text_char_entropy identity on a grouped relation. Per-(user, type)
    // counts are one aggregation; the ln terms are round(,9)-pinned
    // DECIMALs so the per-user fold is order-independent. Flags the
    // single-type users explicitly (H = 0 is ambiguous between "one
    // event" and "thousands of identical events").
    "q_user_entropy" -> ((s, d) => {
      val c = t(s, d, "events")
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("c"))
      c.select(col("user_id"), col("c"),
          round(col("c").cast("double") * log(col("c").cast("double")), 9)
            .cast(org.apache.spark.sql.types.DecimalType(24, 9)).as("clnc"))
        .groupBy("user_id")
        .agg(sum(col("c")).as("n"), count(lit(1)).as("k"),
          sum(col("clnc")).as("sclnc"))
        .select(col("user_id"), col("n").cast("long").as("n_events"),
          col("k").cast("long").as("n_types"),
          round(log(col("n").cast("double")) -
            col("sclnc").cast("double") / col("n").cast("double"), 6)
            .as("entropy"),
          (col("k") === 1).as("single_type"))
    }),

    "q_profile" -> ((s, d) => {
      val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      val o = t(s, d, "orders")
      cols.map(c => o.agg(
          lit(c).as("column_name"), count(lit(1)).as("n_rows"),
          count(col(c)).as("n_nonnull"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_str"),
          max(col(c)).cast("string").as("max_str")))
        .reduce(_ unionByName _)
    }),

    // Per-column schema/profile drift between the two o_orderdate halves:
    // row and distinct counts per half, NEW values appearing only in the
    // second half (the schema-drift signal a static profile misses —
    // fresh categories, fresh keys), and for the numeric column the exact
    // cross-multiplied mean-shift gate (20·|ΔS| > S ⇔ |mean shift| > 5%,
    // no float in the flag). The monitoring pass a warehouse runs before
    // pointing models at a fresh partition. Scale shape: per column one
    // orders-sized conditional agg + one distinct anti-join (both keyed,
    // bounded output); columns are a compile-time list, so the union is
    // constant-width.
    "q_dq_schema_drift" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val o = t(s, d, "orders")
        .withColumn("us", unix_micros(col("o_orderdate")))
      val rng = o.agg(min(col("us")).as("us0"), max(col("us")).as("us1"))
      val h = o.crossJoin(broadcast(rng))
        .withColumn("fh", expr("us < us0 + (us1 - us0) div 2"))
        .transform(graft.CacheScope.persisted(_))
      val cents = (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
        .cast("long")
      def block(c: String, numeric: Boolean): DataFrame = {
        val m = h.agg(
          sum(when(col("fh"), 1L).otherwise(0L)).as("na"),
          sum(when(!col("fh"), 1L).otherwise(0L)).as("nb"),
          countDistinct(when(col("fh"), col(c).cast("string"))).as("da"),
          countDistinct(when(!col("fh"), col(c).cast("string"))).as("db"),
          sum(when(col("fh"), cents).otherwise(0L))
            .cast(DecimalType(19, 0)).as("sa"),
          sum(when(!col("fh"), cents).otherwise(0L))
            .cast(DecimalType(19, 0)).as("sb"))
        // Null-safe anti join (<=>), mirrored by IS NOT DISTINCT FROM in
        // the oracle's NOT EXISTS: a NULL-bearing audited column gets
        // set-membership semantics with NULL as a first-class value in
        // BOTH engines (a plain `=` anti join would flag a second-half
        // NULL as new even when the first half had NULLs, and the old
        // NOT IN oracle went UNKNOWN on them — ADVICE r12).
        val nv = h.filter(!col("fh")).select(col(c).cast("string").as("v"))
          .distinct()
          .join(h.filter(col("fh")).select(col(c).cast("string").as("v0"))
            .distinct(), col("v") <=> col("v0"), "left_anti")
          .agg(count(lit(1)).as("nv"))
        val dsb = col("sb") * col("na").cast(DecimalType(12, 0))
        val dsa = col("sa") * col("nb").cast(DecimalType(12, 0))
        m.crossJoin(broadcast(nv)).select(
          lit(c).as("column_name"),
          col("na").as("n_first"), col("nb").as("n_second"),
          col("da").as("distinct_first"), col("db").as("distinct_second"),
          col("nv").as("distinct_new"),
          (if (numeric)
            round((dsb - dsa).cast("double") / dsa.cast("double"), 6)
          else lit(0.0)).as("mean_shift_pct"),
          (if (numeric) col("nv") > 0 || abs(dsb - dsa) * 20 > dsa
          else col("nv") > 0).as("drift_flag"))
      }
      DriftCols.map(c => block(c, c == "o_totalprice"))
        .reduce(_ unionByName _)
    }),
  )

  /** Columns q_dq_schema_drift audits (cast to string for a shared
    * distinct-set shape; o_totalprice additionally gets the numeric
    * mean-shift check).
    */
  val DriftCols: Seq[String] =
    Seq("o_orderstatus", "o_orderpriority", "o_custkey", "o_totalprice")

  override val oracles: Map[String, String] = Map(

    "q_dq_schema_drift" -> {
      def block(c: String, numeric: Boolean): String = {
        val meanShift =
          if (numeric)
            """round(CAST(sb * CAST(na AS DECIMAL(12,0)) -
              |             sa * CAST(nb AS DECIMAL(12,0)) AS DOUBLE) /
              |       CAST(sa * CAST(nb AS DECIMAL(12,0)) AS DOUBLE), 6)""".stripMargin
          else "0.0"
        val numFlag =
          if (numeric)
            """ OR 20 * abs(sb * CAST(na AS DECIMAL(12,0)) -
              |            sa * CAST(nb AS DECIMAL(12,0))) >
              |      sa * CAST(nb AS DECIMAL(12,0))""".stripMargin
          else ""
        s"""SELECT '$c' AS column_name,
           |       CAST(na AS BIGINT) AS n_first, CAST(nb AS BIGINT) AS n_second,
           |       CAST(da AS BIGINT) AS distinct_first,
           |       CAST(db AS BIGINT) AS distinct_second,
           |       CAST(nv AS BIGINT) AS distinct_new,
           |       $meanShift AS mean_shift_pct,
           |       nv > 0$numFlag AS drift_flag
           |FROM (
           |  SELECT sum(CASE WHEN fh THEN 1 ELSE 0 END) AS na,
           |         sum(CASE WHEN NOT fh THEN 1 ELSE 0 END) AS nb,
           |         count(DISTINCT CASE WHEN fh THEN CAST($c AS VARCHAR) END) AS da,
           |         count(DISTINCT CASE WHEN NOT fh THEN CAST($c AS VARCHAR) END) AS db,
           |         CAST(sum(CASE WHEN fh THEN
           |           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
           |           ELSE 0 END) AS DECIMAL(19,0)) AS sa,
           |         CAST(sum(CASE WHEN NOT fh THEN
           |           CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)
           |           ELSE 0 END) AS DECIMAL(19,0)) AS sb
           |  FROM h
           |) CROSS JOIN (
           |  -- NOT EXISTS, not NOT IN: a NULL in the audited column must count
           |  -- as a new value like the Spark side's left_anti does; NOT IN
           |  -- goes UNKNOWN on NULLs (and zeroes the whole count if the
           |  -- first half holds one) — ADVICE r12
           |  SELECT count(*) AS nv FROM (
           |    SELECT DISTINCT CAST($c AS VARCHAR) AS v FROM h WHERE NOT fh
           |  ) b WHERE NOT EXISTS (
           |    SELECT 1 FROM h WHERE fh AND CAST($c AS VARCHAR) IS NOT DISTINCT FROM b.v)
           |)""".stripMargin
      }
      s"""WITH rng AS (
         |  SELECT min(epoch_us(o_orderdate)) AS us0,
         |         max(epoch_us(o_orderdate)) AS us1
         |  FROM orders
         |), h AS (
         |  SELECT o.*,
         |         epoch_us(o_orderdate) < us0 + (us1 - us0) // 2 AS fh
         |  FROM orders o CROSS JOIN rng
         |)
         |${DriftCols.map(c => block(c, c == "o_totalprice")).mkString("\nUNION ALL\n")}""".stripMargin
    },

    "q_user_entropy" ->
      """WITH c AS (
        |  SELECT user_id, event_type, count(*) AS c
        |  FROM events GROUP BY 1, 2
        |), p AS (
        |  SELECT user_id, c,
        |         CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 9)
        |              AS DECIMAL(24,9)) AS clnc
        |  FROM c
        |), g AS (
        |  SELECT user_id, sum(c) AS n, count(*) AS k, sum(clnc) AS sclnc
        |  FROM p GROUP BY 1
        |)
        |SELECT user_id, CAST(n AS BIGINT) AS n_events,
        |       CAST(k AS BIGINT) AS n_types,
        |       round(ln(CAST(n AS DOUBLE)) -
        |             CAST(sclnc AS DOUBLE) / CAST(n AS DOUBLE), 6) AS entropy,
        |       k = 1 AS single_type
        |FROM g""".stripMargin,

    // Direct single-level monthly aggregate — the Spark side merges daily
    // partials; equality proves the partial states merge exactly.
    "q_incremental_agg" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items,
        |       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    "q_profile" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .map(c =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
           |       count($c) AS n_nonnull, count(DISTINCT $c) AS n_distinct,
           |       CAST(min($c) AS VARCHAR) AS min_str,
           |       CAST(max($c) AS VARCHAR) AS max_str
           |FROM orders""".stripMargin)
      .mkString("\nUNION ALL\n"),

    // The dimension CTE mirrors the q_scd2_intervals oracle exactly.
    "q_pit_lookup" ->
      """WITH c AS (
        |  SELECT user_id, ts, event_id, event_type,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts ASC, event_id ASC) AS prev
        |  FROM events
        |), ch AS (
        |  SELECT user_id, event_type, ts AS valid_from, event_id
        |  FROM c WHERE prev IS NULL OR prev <> event_type
        |), dim AS (
        |  SELECT user_id AS d_user, event_type AS state, valid_from,
        |         lead(valid_from) OVER (PARTITION BY user_id
        |                                ORDER BY valid_from ASC, event_id ASC) AS valid_to
        |  FROM ch
        |)
        |SELECT e.user_id, e.event_id, e.ts, d.state, d.valid_from
        |FROM events e
        |JOIN dim d ON e.user_id = d.d_user
        |  AND e.ts >= d.valid_from
        |  AND (d.valid_to IS NULL OR e.ts < d.valid_to)
        |WHERE e.event_type = 'purchase'""".stripMargin,

    "q_dq_checks" ->
      """WITH m AS (
        |  SELECT count(*) - count(DISTINCT o_orderkey) AS orderkey_dup,
        |         sum(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS price_negative,
        |         sum(CASE WHEN o_orderdate < TIMESTAMP '1995-01-01 00:00:00'
        |                    OR o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
        |                  THEN 1 ELSE 0 END) AS date_out_of_contract,
        |         sum(CASE WHEN o_orderpriority NOT IN
        |                    ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED')
        |                  THEN 1 ELSE 0 END) AS priority_domain
        |  FROM orders
        |), u AS (
        |  SELECT check_name, violations FROM m
        |  UNPIVOT (violations FOR check_name IN
        |    (orderkey_dup, price_negative, date_out_of_contract, priority_domain))
        |), fk AS (
        |  SELECT 'custkey_fk' AS check_name, count(*) AS violations
        |  FROM orders o
        |  WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                    WHERE c.c_custkey = o.o_custkey)
        |), a AS (
        |  SELECT * FROM u UNION ALL SELECT * FROM fk
        |)
        |SELECT check_name, CAST(violations AS BIGINT) AS violations,
        |       CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS pass
        |FROM a""".stripMargin,

    "q_quantile_sketch" ->
      """WITH b AS (
        |  SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS b, count(*) AS bn
        |  FROM orders GROUP BY 1
        |), c AS (
        |  SELECT b, bn, CAST(sum(bn) OVER (ORDER BY b) AS BIGINT) AS cum FROM b
        |), t AS (
        |  SELECT CAST(sum(bn) AS BIGINT) AS total FROM b
        |), q AS (
        |  SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q
        |), hit AS (
        |  SELECT q.q, CAST(ceil(q.q * t.total) AS BIGINT) AS k,
        |         c.b, c.bn, c.cum,
        |         row_number() OVER (PARTITION BY q.q ORDER BY c.b) AS rn
        |  FROM c, t, q
        |  WHERE c.cum >= CAST(ceil(q.q * t.total) AS BIGINT)
        |)
        |SELECT q,
        |       round(CAST(50000 AS DOUBLE) * b +
        |             CAST(50000 AS DOUBLE) * CAST(k - (cum - bn) AS DOUBLE) / bn,
        |             6) AS value,
        |       k AS rank
        |FROM hit WHERE rn = 1""".stripMargin,

    // Independent formulation: delta wins by construction (anti-join).
    "q_cdc_merge" ->
      """WITH base AS (
        |  SELECT o_orderkey, o_totalprice, o_orderstatus, CAST(0 AS BIGINT) AS ver
        |  FROM orders WHERE o_orderdate < TIMESTAMP '1999-01-01 00:00:00'
        |), delta AS (
        |  SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice,
        |         'U' AS o_orderstatus, CAST(1 AS BIGINT) AS ver
        |  FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
        |)
        |SELECT * FROM delta
        |UNION ALL
        |SELECT b.* FROM base b
        |WHERE NOT EXISTS (SELECT 1 FROM delta d
        |                  WHERE d.o_orderkey = b.o_orderkey)""".stripMargin,

    "q_histogram" ->
      s"""SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
         |       count(*) AS n, ${dsumSql("o_totalprice", 2)} AS total
         |FROM orders GROUP BY 1""".stripMargin,

    "q_percentile" ->
      """SELECT l_returnflag,
        |       quantile_cont(l_extendedprice, 0.5) AS p50,
        |       quantile_cont(l_extendedprice, 0.9) AS p90,
        |       quantile_cont(l_quantity, 0.25) AS qty_p25
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_corr" ->
      s"""SELECT l_returnflag,
         |       ${dcorrSql("l_quantity", "l_extendedprice")} AS corr_qty_price,
         |       count(*) AS n
         |FROM lineitem GROUP BY l_returnflag""".stripMargin,

    "q_stats_partial_corr" -> {
      def rSql(sab: String, sa: String, sb: String, saa: String, sbb: String) =
        s"""(n * $sab - $sa * $sb) /
           |  (sqrt(greatest(0.0, n * $saa - $sa * $sa)) *
           |   sqrt(greatest(0.0, n * $sbb - $sb * $sb)))""".stripMargin
      val rxy = rSql("sxy", "sx", "sy", "sxx", "syy")
      val rxz = rSql("sxz", "sx", "sz", "sxx", "szz")
      val ryz = rSql("syz", "sy", "sz", "syy", "szz")
      s"""WITH g AS (
         |  SELECT l_returnflag, CAST(count(*) AS DOUBLE) AS n,
         |         ${dsumSql("l_quantity", 2)} AS sx,
         |         ${dsumSql("l_extendedprice", 4)} AS sy,
         |         ${dsumSql("l_discount", 4)} AS sz,
         |         ${dsumSql("l_quantity * l_extendedprice", 4)} AS sxy,
         |         ${dsumSql("l_quantity * l_discount", 4)} AS sxz,
         |         ${dsumSql("l_extendedprice * l_discount", 4)} AS syz,
         |         ${dsumSql("l_quantity * l_quantity", 4)} AS sxx,
         |         ${dsumSql("l_extendedprice * l_extendedprice", 4)} AS syy,
         |         ${dsumSql("l_discount * l_discount", 4)} AS szz
         |  FROM lineitem GROUP BY 1
         |)
         |SELECT l_returnflag, CAST(n AS BIGINT) AS n,
         |       round($rxy, 6) AS r_xy,
         |       round($rxz, 6) AS r_xz,
         |       round($ryz, 6) AS r_yz,
         |       round((($rxy) - ($rxz) * ($ryz)) /
         |             sqrt((1.0 - ($rxz) * ($rxz)) * (1.0 - ($ryz) * ($ryz))), 6)
         |         AS r_xy_given_z
         |FROM g""".stripMargin
    }
  )
}
