package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.relational.Det._

/** The TPC-H-shaped SQL surface: the 21 adapted TPC-H queries (Q2-Q22 on
  * this schema), each ONE ANSI SQL text registered as temp views and run
  * by Catalyst — the oracle runs the IDENTICAL text in DuckDB. Per-query
  * scaladocs document the planner feature each exercises (join order,
  * decorrelation, OR-pushdown, CTE reuse) and its 100 TB plan shape.
  */
object TpchQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** TPC-H Q3-shaped "shipping priority": one SQL string, two engines. */
  private val Q3: String =
    """SELECT l_orderkey,
      |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |       o_orderdate
      |FROM customer, orders, lineitem
      |WHERE c_mktsegment = 'BUILDING'
      |  AND c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey ASC
      |LIMIT 10""".stripMargin

  /** TPC-H Q5-shaped "local supplier volume": a 6-way join (customer,
    * orders, lineitem, supplier, nation, region) with the local-supplier
    * residual c_nationkey = s_nationkey — the join-order planning stress
    * test. One SQL text, two engines; exact decimal revenue.
    */
  private val Q5: String =
    """SELECT n_name,
      |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey
      |  AND n_regionkey = r_regionkey
      |  AND r_name = 'AFRICA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name ASC""".stripMargin

  /** TPC-H Q18-shaped "large-volume customers": HAVING-gated IN-subquery
    * over an aggregate + deterministic top-100 (ties broken by orderkey).
    * Quantities are integer-valued doubles, so their sums are exact and
    * the hash compare needs no decimal detour. Catalyst rewrites the IN
    * as a left-semi join and the LIMIT as TakeOrderedAndProject.
    */
  private val Q18: String =
    """SELECT c_name, c_custkey, o_orderkey,
      |       CAST(o_orderdate AS DATE) AS order_date,
      |       o_totalprice, sum(l_quantity) AS total_qty
      |FROM customer, orders, lineitem
      |WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
      |                     GROUP BY l_orderkey HAVING sum(l_quantity) > 300)
      |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 100""".stripMargin

  /** TPC-H Q10-shaped "returned item reporting": revenue lost to returns
    * per customer over a quarter-ish window, top-20. Exercises a 4-way
    * join with two pushed-down filters (date range on orders, returnflag
    * on lineitem — both must reach the scans), a decimal-exact revenue
    * sum, and a deterministic TakeOrderedAndProject (ties by custkey).
    */
  private val Q10: String =
    """SELECT c_custkey, c_name,
      |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |       c_acctbal, n_name
      |FROM customer, orders, lineitem, nation
      |WHERE c_custkey = o_custkey
      |  AND l_orderkey = o_orderkey
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
      |  AND l_returnflag = 'R'
      |  AND c_nationkey = n_nationkey
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** TPC-H Q6-shaped "forecasting revenue change": the canonical
    * scan-dominated query — no join, three pushed-down residuals, one
    * global sum. At 100 TB this is the query where scan pruning and
    * vectorized parquet decode are the whole cost; the plan must be a
    * single WholeStageCodegen over the file scan.
    */
  private val Q6: String =
    """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |       count(*) AS n
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount BETWEEN 0.03 AND 0.07
      |  AND l_quantity < 24""".stripMargin

  /** TPC-H Q7-shaped "volume shipping": bidirectional nation-pair trade
    * volume by ship year. The same dimension table (nation) joins TWICE
    * under different aliases — the self-alias resolution stress — and the
    * nation-pair disjunction can only be applied after both joins; both
    * nation sides must still broadcast. year() is cast to BIGINT in the
    * shared text (Spark year() is INT, DuckDB's is BIGINT).
    */
  private val Q7: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |       CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM supplier, lineitem, orders, customer, nation n1, nation n2
      |WHERE s_suppkey = l_suppkey
      |  AND o_orderkey = l_orderkey
      |  AND c_custkey = o_custkey
      |  AND s_nationkey = n1.n_nationkey
      |  AND c_nationkey = n2.n_nationkey
      |  AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n1.n_name, n2.n_name, year(l_shipdate)""".stripMargin

  /** TPC-H Q14-shaped "promotion effect": conditional-aggregate ratio over
    * one month. The CASE keeps DECIMAL until both sums finish (a
    * double-typed branch would make the ratio order-dependent); the testdata
    * p_type is a single word, so the canonical LIKE 'PROMO%' degenerates to
    * equality.
    */
  private val Q14: String =
    """SELECT round(100.00 * CAST(sum(CASE WHEN p_type = 'PROMO'
      |         THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
      |         ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
      |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE), 6) AS promo_revenue
      |FROM lineitem, part
      |WHERE l_partkey = p_partkey
      |  AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-02-01 00:00:00'""".stripMargin

  /** TPC-H Q19-shaped "discounted revenue": a three-branch disjunction
    * where every branch mixes predicates from BOTH join sides (brand+size
    * from part, quantity from lineitem). The optimizer must extract the
    * per-table implications (p_brand IN (...), size/quantity bounds) and
    * push them below the join while keeping the residual OR on top —
    * the classic OR-pushdown stress. Adapted to this schema: no
    * p_container/l_shipmode columns exist, so brand x size x quantity
    * carry the disjunction.
    */
  private val Q19: String =
    """SELECT CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |       count(*) AS n
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey
      |  AND ((p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
      |          AND l_quantity >= 1 AND l_quantity <= 11)
      |    OR (p_brand = 'Brand#7' AND p_size BETWEEN 1 AND 25
      |          AND l_quantity >= 10 AND l_quantity <= 20)
      |    OR (p_brand = 'Brand#20' AND p_size BETWEEN 1 AND 35
      |          AND l_quantity >= 20 AND l_quantity <= 30))""".stripMargin

  /** TPC-H Q2-shaped "minimum cost supplier": a correlated scalar-min
    * subquery — for each small part, every (supplier, line) achieving that
    * part's minimum price. Catalyst rewrites the correlated min to an
    * aggregate + join (no per-row probe); all ties are returned, so no
    * LIMIT is needed for determinism. Adapted: this schema has no
    * partsupp, so lineitem plays the part-supplier cost relation.
    */
  private val Q2Min: String =
    """SELECT p_partkey, p_name, l_suppkey, l_orderkey, l_linenumber,
      |       l_extendedprice AS min_price
      |FROM part, lineitem
      |WHERE p_partkey = l_partkey
      |  AND p_size <= 5
      |  AND l_extendedprice = (SELECT min(l2.l_extendedprice)
      |                         FROM lineitem l2
      |                         WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** TPC-H Q16-shaped "parts/supplier relationship": count-distinct
    * suppliers per (brand, type, size) with a NOT IN subquery — the
    * null-aware anti-join path (Spark plans a left-anti with the
    * null-check; s_suppkey is non-null so it degenerates safely).
    */
  private val Q16: String =
    """SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM part, lineitem
      |WHERE p_partkey = l_partkey
      |  AND p_brand <> 'Brand#1'
      |  AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type, p_size""".stripMargin

  /** TPC-H Q22-shaped "global sales opportunity": customers above the
    * global positive-balance average with no urgent orders — a scalar
    * subquery threshold AND a correlated NOT EXISTS anti-join feeding one
    * grouped aggregate. Adapted: grouped by nation (this schema has no
    * c_phone country code), and the anti-join condition is "no 1-URGENT
    * order" because every synthetic customer has at least one order.
    */
  private val Q22: String =
    s"""SELECT n_name, count(*) AS numcust,
       |       ${dsumSql("c_acctbal", 2)} AS totacctbal
       |FROM customer, nation
       |WHERE c_nationkey = n_nationkey
       |  AND c_acctbal > (SELECT ${dsumSql("c_acctbal", 2)} / count(*)
       |                   FROM customer WHERE c_acctbal > 0.00)
       |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
       |                  AND o_orderpriority = '1-URGENT')
       |GROUP BY n_name""".stripMargin

  /** TPC-H Q4-shaped "order priority checking": count orders per priority
    * that had at least one late line. Adapted: this schema has no
    * l_commitdate/l_receiptdate, so "late" is shipped > 60 days after the
    * order date — which makes the EXISTS correlate on BOTH the order key
    * (equi) and the order date (non-equi), a stricter decorrelation test
    * than the canonical form. Catalyst must rewrite it to a left-semi join
    * with a mixed equi/range condition; the date window prunes the orders
    * scan first.
    */
  private val Q4: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q8-shaped "national market share": the widest join in the suite
    * (8 relations, nation twice) feeding a conditional-aggregate ratio per
    * order year. The volume stays DECIMAL until both sums finish (same
    * discipline as Q14); at scale every dimension here broadcasts and the
    * single shuffle is the year-grouped aggregate over the fact join.
    */
  private val Q8: String =
    """SELECT o_year,
      |       round(CAST(sum(CASE WHEN nation = 'NATION_3' THEN dvol ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE) /
      |             CAST(sum(dvol) AS DOUBLE), 6) AS mkt_share
      |FROM (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS dvol,
      |             n2.n_name AS nation
      |      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      |      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      |        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
      |        AND r_name = 'EUROPE' AND s_nationkey = n2.n_nationkey
      |        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |        AND p_type = 'PROMO') all_nations
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  /** TPC-H Q9-shaped "product type profit": profit per (supplier nation,
    * order year) over substring-matched parts. Adapted: no partsupp here,
    * so supply cost is proxied as 10% of p_retailprice per unit. The
    * profit expression mixes 2dp, 1dp and integer-valued factors — exact
    * at DECIMAL scale 4 (see [[Det]]); p_name LIKE '%red%' cannot push
    * into parquet stats, so the scan prunes on columns only.
    */
  private val Q9: String =
    """SELECT nation, o_year,
      |       CAST(sum(amount) AS DOUBLE) AS sum_profit
      |FROM (SELECT n_name AS nation,
      |             CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |             CAST(l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity AS DECIMAL(18,4)) AS amount
      |      FROM part, supplier, lineitem, orders, nation
      |      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
      |        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
      |        AND p_name LIKE '%red%') profit
      |GROUP BY nation, o_year
      |ORDER BY nation, o_year DESC""".stripMargin

  /** TPC-H Q11-shaped "important stock identification": per-part value
    * within one nation, kept only when above a fraction of that nation's
    * total — the HAVING-over-scalar-subquery shape where the same
    * three-way join is evaluated once per side. Adapted: no partsupp, so
    * lineitem value (price x quantity) is the stock proxy and the
    * fraction is 0.1% (this corpus has ~2000 parts). Catalyst computes
    * the threshold as a one-row broadcast into the HAVING filter.
    */
  private val Q11: String =
    """SELECT l_partkey,
      |       CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS value
      |FROM lineitem, supplier, nation
      |WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |  AND n_name = 'NATION_3'
      |GROUP BY l_partkey
      |HAVING CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2))) AS DOUBLE) >
      |       (SELECT CAST(sum(CAST(l_extendedprice * l_quantity AS DECIMAL(18,2))) AS DOUBLE) * 0.001
      |        FROM lineitem, supplier, nation
      |        WHERE l_suppkey = s_suppkey AND s_nationkey = n_nationkey
      |          AND n_name = 'NATION_3')
      |ORDER BY value DESC, l_partkey""".stripMargin

  /** TPC-H Q12-shaped "shipping mode / priority": late lines bucketed into
    * high/low priority CASE-counts. Adapted: no l_shipmode or
    * l_commitdate/l_receiptdate — l_linestatus carries the grouping and
    * "late" is shipped > 60 days after order date. count(CASE ...) (not
    * sum of 0/1) keeps the result BIGINT in both engines — DuckDB's
    * sum(INTEGER) widens to HUGEINT and would flake the schema compare.
    */
  private val Q12: String =
    """SELECT l_linestatus,
      |       count(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 END) AS high_line_count,
      |       count(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 END) AS low_line_count
      |FROM orders, lineitem
      |WHERE o_orderkey = l_orderkey
      |  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_linestatus
      |ORDER BY l_linestatus""".stripMargin

  /** TPC-H Q13-shaped "customer order distribution": the
    * distribution-of-a-distribution double aggregate, with the filter in
    * the LEFT JOIN's ON clause (moving it to WHERE would silently drop the
    * zero-order customers — the classic outer-join-filter trap this query
    * exists to catch). Adapted: no o_comment, so non-urgent orders play
    * the "not special" role.
    */
  private val Q13: String =
    """SELECT c_count, count(*) AS custdist
      |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
      |      FROM customer LEFT OUTER JOIN orders
      |        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |      GROUP BY c_custkey) c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q15-shaped "top supplier": a named revenue view consumed twice
    * — once as the join input, once under max() — the classic
    * CTE-reuse-vs-reinline planning case. Revenue is the exact decimal
    * sum cast to double, so the equality against max() compares
    * bit-identical doubles in both engines; all ties are returned (no
    * LIMIT needed for determinism).
    */
  private val Q15: String =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q17-shaped "small-quantity-order revenue": a correlated scalar
    * AVG subquery per part — Catalyst must rewrite the per-row probe into
    * one aggregate over lineitem plus an equi-join (a per-row probe at
    * 100 TB would be quadratic). Quantities are integer-valued doubles, so
    * the inner avg is exact in any summation order; the 0.2 factor and the
    * comparison are identical IEEE arithmetic in both engines. Adapted:
    * no p_container, so the brand filter alone selects the part family.
    */
  private val Q17: String =
    """SELECT round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly,
      |       count(*) AS n
      |FROM lineitem, part
      |WHERE p_partkey = l_partkey
      |  AND p_brand = 'Brand#3'
      |  AND l_quantity < (SELECT 0.2 * avg(l_quantity)
      |                    FROM lineitem l2 WHERE l2.l_partkey = p_partkey)""".stripMargin

  /** TPC-H Q20-shaped "potential part promotion": a two-level nest — an IN
    * over a grouped HAVING subquery (suppliers who moved real volume of
    * the promoted part family), then a nation filter. Adapted: no
    * partsupp, so shipped quantity per (supplier, part) replaces
    * availability; sum(l_quantity) is exact (integer-valued doubles).
    * Catalyst turns the IN into a left-semi join against the aggregate.
    */
  private val Q20: String =
    """SELECT s_suppkey, s_name
      |FROM supplier, nation
      |WHERE s_suppkey IN (
      |        SELECT l_suppkey
      |        FROM lineitem, part
      |        WHERE l_partkey = p_partkey
      |          AND p_name LIKE 'red %'
      |          AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |          AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |        GROUP BY l_suppkey, l_partkey
      |        HAVING sum(l_quantity) > 40)
      |  AND s_nationkey = n_nationkey
      |  AND n_name = 'NATION_3'
      |ORDER BY s_suppkey""".stripMargin

  /** TPC-H Q21-shaped "suppliers who kept orders waiting": the hardest
    * subquery shape in the suite — an EXISTS (another supplier
    * contributed to the order) AND a NOT EXISTS (no OTHER supplier was
    * late) both correlated to the same outer lineitem, the NOT EXISTS
    * additionally referencing a THIRD table's column (o_orderdate) in a
    * non-equi predicate. Both decorrelate to one left-semi and one
    * left-anti hash join on l_orderkey with range residuals — no per-row
    * probes. Adapted: "late" is shipped > 60 days after order date.
    */
  private val Q21: String =
    """SELECT s_name, count(*) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey
      |  AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |  AND s_nationkey = n_nationkey
      |  AND n_name = 'NATION_3'
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The SQL surface: same text as the oracle, run by Catalyst.
    "q_sql_tpch_q3" -> ((s, d) => {
      Seq("customer", "orders", "lineitem").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q3)
    }),

    "q_sql_tpch_q18" -> ((s, d) => {
      Seq("customer", "orders", "lineitem").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q18)
    }),

    "q_sql_tpch_q10" -> ((s, d) => {
      Seq("customer", "orders", "lineitem", "nation").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q10)
    }),

    "q_sql_tpch_q6" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(Q6)
    }),

    "q_sql_tpch_q7" -> ((s, d) => {
      Seq("supplier", "lineitem", "orders", "customer", "nation").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q7)
    }),

    "q_sql_tpch_q14" -> ((s, d) => {
      Seq("lineitem", "part").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q14)
    }),

    "q_sql_tpch_q19" -> ((s, d) => {
      Seq("lineitem", "part").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q19)
    }),

    "q_sql_tpch_q2" -> ((s, d) => {
      Seq("part", "lineitem").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q2Min)
    }),

    "q_sql_tpch_q16" -> ((s, d) => {
      Seq("part", "lineitem", "supplier").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q16)
    }),

    "q_sql_tpch_q22" -> ((s, d) => {
      Seq("customer", "nation", "orders").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q22)
    }),

    "q_sql_tpch_q4" -> ((s, d) => {
      Seq("orders", "lineitem").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q4)
    }),

    "q_sql_tpch_q8" -> ((s, d) => {
      Seq("part", "supplier", "lineitem", "orders", "customer", "nation",
        "region").foreach(n => t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q8)
    }),

    "q_sql_tpch_q9" -> ((s, d) => {
      Seq("part", "supplier", "lineitem", "orders", "nation").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q9)
    }),

    "q_sql_tpch_q11" -> ((s, d) => {
      Seq("lineitem", "supplier", "nation").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q11)
    }),

    "q_sql_tpch_q12" -> ((s, d) => {
      Seq("orders", "lineitem").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q12)
    }),

    "q_sql_tpch_q13" -> ((s, d) => {
      Seq("customer", "orders").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q13)
    }),

    "q_sql_tpch_q15" -> ((s, d) => {
      Seq("supplier", "lineitem").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q15)
    }),

    "q_sql_tpch_q17" -> ((s, d) => {
      Seq("lineitem", "part").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q17)
    }),

    "q_sql_tpch_q20" -> ((s, d) => {
      Seq("supplier", "nation", "lineitem", "part").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q20)
    }),

    "q_sql_tpch_q21" -> ((s, d) => {
      Seq("supplier", "lineitem", "orders", "nation").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q21)
    }),

    "q_sql_tpch_q5" -> ((s, d) => {
      Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
        .foreach(n => t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q5)
    }),
  )

  override val oracles: Map[String, String] = Map(

    "q_sql_tpch_q3" -> Q3,
    "q_sql_tpch_q5" -> Q5,
    "q_sql_tpch_q18" -> Q18,
    "q_sql_tpch_q10" -> Q10,
    "q_sql_tpch_q6" -> Q6,
    "q_sql_tpch_q7" -> Q7,
    "q_sql_tpch_q14" -> Q14,
    "q_sql_tpch_q19" -> Q19,
    "q_sql_tpch_q2" -> Q2Min,
    "q_sql_tpch_q16" -> Q16,
    "q_sql_tpch_q22" -> Q22,
    "q_sql_tpch_q4" -> Q4,
    "q_sql_tpch_q8" -> Q8,
    "q_sql_tpch_q9" -> Q9,
    "q_sql_tpch_q11" -> Q11,
    "q_sql_tpch_q12" -> Q12,
    "q_sql_tpch_q13" -> Q13,
    "q_sql_tpch_q15" -> Q15,
    "q_sql_tpch_q17" -> Q17,
    "q_sql_tpch_q20" -> Q20,
    "q_sql_tpch_q21" -> Q21,
  )
}
