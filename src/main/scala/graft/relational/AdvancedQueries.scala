package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.relational.Det._

/** Advanced relational surface: the SQL entry point itself (spark.sql over
  * registered views, running the IDENTICAL ANSI text DuckDB runs as the
  * oracle), exact interpolated percentiles, and a deterministic Pearson
  * correlation built from exact decimal sums.
  */
object AdvancedQueries extends QueryPack {

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

  /** Scalar subquery: orders above the global average price. The average
    * goes through the exact-decimal formulation so both engines compute
    * the identical threshold.
    */
  private val ScalarSub: String =
    """SELECT o_orderkey, o_totalprice
      |FROM orders
      |WHERE o_totalprice > 1.5 * (
      |  SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*)
      |  FROM orders)""".stripMargin

  /** Correlated EXISTS + NOT EXISTS — one shared SQL text. Catalyst
    * rewrites both to a left-semi + left-anti join on o_custkey
    * (RewritePredicateSubquery), so at scale this is two shuffled hash
    * joins, not a per-row probe.
    */
  /** Recursive CTE (Spark 4's WITH RECURSIVE — SPARK-24497): walk each
    * part key up the implicit binary-tree hierarchy pk -> pk div 2 to
    * the root and histogram the depths. One shared dialect-neutral text
    * (CAST((cur - cur % 2) / 2 ...) instead of div/`//`); recursion
    * depth is log2(max pk) — bounded at any SF, which is exactly the
    * contract a recursive query needs at 100 TB (depth bounded by the
    * HIERARCHY, fan-out handled by the per-iteration join).
    */
  private val RecursiveSql: String =
    """WITH RECURSIVE walk(pk, cur, depth) AS (
      |  SELECT p_partkey, p_partkey, CAST(0 AS INT) FROM part
      |  UNION ALL
      |  SELECT pk, CAST((cur - cur % 2) / 2 AS BIGINT), depth + 1
      |  FROM walk WHERE cur > 1
      |)
      |SELECT depth_to_root, count(*) AS n_parts
      |FROM (SELECT pk, CAST(max(depth) AS INT) AS depth_to_root
      |      FROM walk GROUP BY pk)
      |GROUP BY depth_to_root""".stripMargin

  /** Correlated LATERAL subquery with ORDER BY + LIMIT — the top-N-per-
    * group shape written the way an application developer writes it
    * (both engines decorrelate it; the window-function twin is
    * q_topk_per_group). Shared text, deterministic total order.
    */
  private val LateralSql: String =
    """SELECT c.c_custkey, c.c_mktsegment, t.o_orderkey, t.o_totalprice
      |FROM customer c, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders o
      |  WHERE o.o_custkey = c.c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2
      |) t""".stripMargin

  private val ExistsSub: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey
      |                AND o.o_totalprice > 300000)
      |  AND NOT EXISTS (SELECT 1 FROM orders o
      |                  WHERE o.o_custkey = c.c_custkey
      |                    AND o.o_orderpriority = '1-URGENT')""".stripMargin

  /** NOT IN with a nullable (but null-free) subquery column: parts with
    * no lineitem in recent orders. `nullif(pk, -1)` never fires on real
    * keys, so the answer is non-trivial while the TYPE stays nullable
    * and both planners must use three-valued NOT IN semantics.
    */
  private val NotInSub: String =
    """SELECT p_partkey, p_name
      |FROM part
      |WHERE p_partkey NOT IN (
      |  SELECT nullif(l.l_partkey, -1)
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  WHERE o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')""".stripMargin

  /** Explicit GROUPING SETS (beyond cube/rollup) — one shared SQL text. */
  private val GSets: String =
    """SELECT l_returnflag, l_linestatus,
      |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |       count(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())""".stripMargin

  /** Minimum pair support (co-purchase order count) for q_assoc_rules. */
  val AssocMinSup = 3L

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Association rules (market-basket) over order baskets: for every
    // DIRECTED part pair (a -> b) co-purchased in >= AssocMinSup orders,
    // support, confidence sup(a,b)/sup(a), and lift n·sup(a,b)/(sup(a)·
    // sup(b)) — the A-priori 2-itemset pass, the classic retail
    // cross-sell primitive. Scale shape: baskets collapse to per-order
    // part SETS (collect_set bounds state at <= 7 keys), pairs explode
    // order-locally (<= 42 per order — never a self-join of the
    // lineitem relation), and the support filter prunes BEFORE the
    // singleton-support joins; the n_orders scalar rides a broadcast
    // 1-row aggregate. Exact integers until the two final divisions.
    "q_assoc_rules" -> ((s, d) => {
      val baskets = t(s, d, "lineitem")
        .groupBy(col("l_orderkey")).agg(collect_set(col("l_partkey")).as("pks"))
        .transform(graft.CacheScope.persisted(_))
      val pairSup = baskets
        .select(explode(col("pks")).as("a"), col("pks"))
        .select(col("a"), explode(array_remove(col("pks"), col("a"))).as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("sup_ab"))
        .filter(col("sup_ab") >= AssocMinSup)
      val singleSup = baskets
        .select(explode(col("pks")).as("pk"))
        .groupBy(col("pk")).agg(count(lit(1)).as("sup"))
      val nOrders = baskets.agg(count(lit(1)).as("n_orders"))
      pairSup
        .join(singleSup.select(col("pk").as("a"), col("sup").as("sup_a")), "a")
        .join(singleSup.select(col("pk").as("b"), col("sup").as("sup_b")), "b")
        .crossJoin(broadcast(nOrders))
        .select(col("a").as("antecedent"), col("b").as("consequent"),
          col("sup_ab"),
          round(col("sup_ab").cast("double") / col("sup_a").cast("double"), 6)
            .as("confidence"),
          round((col("n_orders") * col("sup_ab")).cast("double") /
            (col("sup_a") * col("sup_b")).cast("double"), 6).as("lift"))
    }),

    "q_sql_grouping_sets" -> ((s, d) => {
      t(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql(GSets)
    }),

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

    // Fixed-width histogram of order totals: the profiling primitive for
    // choosing bucket boundaries / spotting skew before a heavy job. One
    // partial-aggregated shuffle over a constant-size key space; floor of
    // an IEEE division is engine-independent, and the per-bucket revenue
    // goes through the exact decimal sum.
    "q_histogram" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(floor(col("o_totalprice") / 50000).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"), dsum(col("o_totalprice"), 2).as("total"))),

    "q_sql_scalar_subquery" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(ScalarSub)
    }),

    "q_sql_exists" -> ((s, d) => {
      Seq("customer", "orders").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(ExistsSub)
    }),

    "q_sql_recursive" -> ((s, d) => {
      t(s, d, "part").createOrReplaceTempView("part")
      s.sql(RecursiveSql)
    }),

    "q_sql_lateral" -> ((s, d) => {
      Seq("customer", "orders").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(LateralSql)
    }),

    // NOT IN over a NULLABLE subquery column — the null-aware anti join,
    // the planner shape a plain anti join silently gets WRONG (one NULL
    // in the subquery must empty the result under three-valued logic).
    // The nullif keeps the column nullable so Spark must plan the
    // null-aware variant (isNullAware BroadcastHashJoin — the build side
    // must broadcast, the documented constraint of this operator; at
    // 100 TB a huge NOT IN side gets rewritten to the anti-join +
    // null-check union instead). Same SQL text runs in both engines.
    "q_sql_not_in" -> ((s, d) => {
      Seq("part", "lineitem", "orders").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(NotInSub)
    }),

    "q_sql_tpch_q5" -> ((s, d) => {
      Seq("customer", "orders", "lineitem", "supplier", "nation", "region")
        .foreach(n => t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q5)
    }),

    // Range join: ordered same-user event pairs within 60 seconds. BANDED:
    // joining on (user) alone with a range residual is quadratic per user
    // (measured ~35s at sf0.1); bucketing time into 60s cells and joining
    // the left side's {cell, cell+1} against the right side's cell turns
    // it into an equi-join whose candidates are only same/adjacent-minute
    // events — the standard interval-banding rewrite.
    "q_range_join" -> ((s, d) => {
      val WindowUs = 60000000L
      val e = t(s, d, "events")
        .select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"))
        .withColumn("bkt", floor(col("us") / WindowUs))
      val aSide = e.withColumn("k", explode(array(col("bkt"), col("bkt") + 1)))
      aSide.as("a").join(e.as("b"),
          col("a.user_id") === col("b.user_id") &&
            col("a.k") === col("b.bkt") &&
            col("b.us") - col("a.us") >= 0 &&
            col("b.us") - col("a.us") < WindowUs &&
            (col("b.us") > col("a.us") || col("b.event_id") > col("a.event_id")))
        .select(col("a.event_id").as("event_a"), col("b.event_id").as("event_b"),
          col("a.user_id").as("user_id"),
          (col("b.us") - col("a.us")).as("gap_us"))
    }),

    // Pivot: per-user event-type counts as columns.
    "q_pivot" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)),

    // Unpivot (wide->long), the inverse of q_pivot: Spark's
    // Dataset.unpivot compiles to a single Expand over the aggregated
    // relation — one narrow pass, no extra shuffle beyond the agg's.
    "q_unpivot" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(dsum(col("l_quantity"), 2).as("qty"),
          dsum(col("l_discount"), 2).as("disc"),
          dsum(col("l_tax"), 2).as("tax"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("qty"), col("disc"), col("tax")), "measure", "amount")),

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

    // Skew-resistant salted join on an INDUCED hot key: 70% of events are
    // remapped onto skew_key 0 (the testdata is too uniform to exhibit the
    // 100 TB hazard naturally), then the skewed fact side joins a derived
    // dim through operators.SaltedJoin — the hot key's rows spread over 16
    // salt sub-keys instead of one straggler task. Salt comes from
    // event_id (deterministic); the salt never changes the JOIN RESULT,
    // only its distribution, so the oracle is the plain join. See
    // ARCHITECTURE.md "Skew" for the measured salted-vs-plain comparison.
    "q_join_salted_skew" -> ((s, d) => {
      val e = t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("value"))
        .withColumn("skew_key",
          when(pmod(col("user_id"), lit(10)) < 7, lit(0L))
            .otherwise(col("user_id")))
      val dim = e.select(col("skew_key")).distinct()
        .withColumn("grp",
          concat(lit("g"), pmod(col("skew_key"), lit(7)).cast("string")))
      graft.operators.SaltedJoin
        .inner(e, dim, "skew_key", saltFactor = 16,
          saltBy = Some(col("event_id")))
        .groupBy(col("grp"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 4).as("total"))
    }),

    // Multi-step funnel with LAST-TOUCH attribution: for each purchase,
    // the latest prior click within 24 hours; for that click, the
    // latest prior view within 24 hours (the synthetic events are sparse
    // per user - ~2 per type per day - so a 30-minute funnel is empty) — the 3-step conversion chain.
    // Each step is a user-keyed equi-join with a time-interval residual
    // (the stream-stream-join shape; per-user event counts bound the
    // pair fan-out) followed by ONE max(struct(ts, id, ...)) aggregation
    // per attributed event — argmax without a window, deterministic ties
    // by id. The oracle takes the same argmax as row_number() DESC = 1.
    "q_events_funnel" -> ((s, d) => {
      // one events scan feeds all three type slices
      val ev = t(s, d, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
        .transform(graft.CacheScope.persisted(_))
      def slice(tpe: String, id: String, ts: String, u: String) =
        ev.filter(col("event_type") === tpe)
          .select(col("user_id").as(u), col("event_id").as(id), col("ts").as(ts))
      val v = slice("view", "view_id", "view_ts", "vu")
      val c = slice("click", "click_id", "click_ts", "cu")
      val p = slice("purchase", "buy_id", "buy_ts", "pu")
      val vc = c
        .join(v, col("cu") === col("vu") &&
          col("view_ts") <= col("click_ts") &&
          col("click_ts") <= col("view_ts") + expr("INTERVAL 24 HOURS"))
        .groupBy(col("cu"), col("click_id"), col("click_ts"))
        .agg(max(struct(col("view_ts"), col("view_id"))).as("mv"))
        .select(col("cu"), col("click_id"), col("click_ts"),
          col("mv.view_id").as("view_id"), col("mv.view_ts").as("view_ts"))
      p
        .join(vc, col("pu") === col("cu") &&
          col("click_ts") <= col("buy_ts") &&
          col("buy_ts") <= col("click_ts") + expr("INTERVAL 24 HOURS"))
        .groupBy(col("pu").as("user_id"), col("buy_id"), col("buy_ts"))
        .agg(max(struct(col("click_ts"), col("click_id"),
          col("view_ts"), col("view_id"))).as("mc"))
        .select(col("user_id"), col("mc.view_id").as("view_id"),
          col("mc.click_id").as("click_id"), col("buy_id"),
          col("mc.view_ts").as("view_ts"), col("mc.click_ts").as("click_ts"),
          col("buy_ts"))
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

    // First-order Markov transition matrix over user event sequences:
    // P(next_type | type), the sequence-mining / next-action-model
    // primitive. One user-partitioned lead() window pairs each event
    // with its successor, one aggregation counts transitions, and the
    // row-normalizing denominator comes from a window over the
    // TRANSITION MATRIX itself (|types|^2 rows — constant at any scale),
    // not a second pass over events. Probabilities are exact
    // integer-ratio doubles rounded to 9.
    "q_markov_transitions" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val pairs = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w).as("to_type"))
        .filter(col("to_type").isNotNull)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
      val rowTotal = Window.partitionBy("from_type")
      pairs.select(col("from_type"), col("to_type"), col("n"),
        round(col("n").cast("double") / sum(col("n")).over(rowTotal), 9)
          .as("p"))
    }),

    // Stationary distribution of that Markov chain — where the behavior
    // converges if the observed dynamics persist, the long-run mix a
    // capacity model plans against. Power iteration in INTEGER fixed
    // point (the PageRank discipline on a |types|x|types| matrix): mass
    // m·n div rt per step with the product routed through DECIMAL so a
    // 100 TB transition count cannot overflow, MarkovIters rounds
    // unrolled identically in the oracle. Everything after the one
    // events-sized lead/count pass runs on the constant-size matrix.
    "q_markov_stationary" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val cnts = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type").as("from_type"),
          lead(col("event_type"), 1).over(w).as("to_type"))
        .filter(col("to_type").isNotNull)
        .groupBy("from_type", "to_type").agg(count(lit(1)).as("n"))
        .transform(graft.CacheScope.persisted(_))
      val rt = cnts.groupBy("from_type").agg(sum(col("n")).as("rt"))
      val pm = cnts.join(rt, "from_type")
        .transform(graft.CacheScope.persisted(_))
      var pi = rt.select(col("from_type").as("state"),
        lit(MarkovScale).as("m"))
      for (_ <- 1 to MarkovIters) {
        pi = pm.join(pi, col("from_type") === col("state"))
          .select(col("to_type"),
            expr("CAST((CAST(m AS DECIMAL(20,0)) * n) div rt AS BIGINT)").as("c"))
          .groupBy(col("to_type")).agg(sum(col("c")).as("m"))
          .select(col("to_type").as("state"), col("m"))
      }
      pi.crossJoin(broadcast(pi.agg(sum(col("m")).as("tm"))))
        .select(col("state"), col("m").as("pi_fixed"),
          round(col("m").cast("double") / col("tm").cast("double"), 9).as("pi"))
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

    // Time-series resampling to OHLC bars: per (event_type, day) —
    // open/close via min/max(struct(ts, event_id, value)) argmin/argmax
    // (ties broken by event_id inside the struct order, no window, ONE
    // aggregation), high/low as plain min/max, volume as the exact
    // decimal sum. The finance-bars shape, but it is really "first/last
    // value per resample bucket" — the general downsampling primitive.
    // The oracle takes open/close through row_number windows instead —
    // an independent formulation of the same argmin/argmax.
    "q_ohlc_bars" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(
          min(struct(col("ts"), col("event_id"), col("value"))).as("o"),
          max(struct(col("ts"), col("event_id"), col("value"))).as("c"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          dsum(col("value"), 4).as("volume"),
          count(lit(1)).as("n_events"))
        .select(col("event_type"), col("day"),
          col("o.value").as("open"), col("high"), col("low"),
          col("c.value").as("close"), col("volume"), col("n_events"))),

    // Gap-fill + LOCF (last observation carried forward): the dense
    // hourly series per event_type, missing hours synthesized and filled
    // with the previous hour's total. The per-group hour range comes
    // from ONE tiny min/max agg; sequence+explode generates exactly the
    // missing slots (never a calendar cross join); the carry-forward is
    // last(value, ignoreNulls) over a type-partitioned window. Dense
    // output = |types| x |hours| rows at any scale — resampling cost is
    // output-bounded, not input-bounded.
    "q_gapfill_locf" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val hours = t(s, d, "events")
        .filter(col("event_type").isin("purchase", "signup"))
        .groupBy(col("event_type"),
          date_trunc("hour", col("ts")).as("hour"))
        .agg(dsum(col("value"), 4).as("total"))
      val dense = hours.groupBy("event_type")
        .agg(min(col("hour")).as("lo"), max(col("hour")).as("hi"))
        .select(col("event_type"),
          explode(sequence(col("lo"), col("hi"),
            expr("INTERVAL 1 HOUR"))).as("hour"))
      val w = Window.partitionBy("event_type").orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dense.join(hours, Seq("event_type", "hour"), "left")
        .select(col("event_type"), col("hour").cast("timestamp").as("hour"),
          col("total"),
          last(col("total"), ignoreNulls = true).over(w).as("filled"),
          when(col("total").isNull, 1L).otherwise(0L).as("was_gap"))
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

    // 2D skyline / Pareto frontier over a quarter of orders: the
    // "cheapest and latest" non-dominated set — see
    // [[graft.operators.Skyline]] for the bucketed two-phase design that
    // replaces the quadratic all-pairs check. The oracle IS that
    // quadratic check (NOT EXISTS a dominator), an independent
    // formulation kept tractable by the date window.
    "q_skyline" -> ((s, d) => {
      val pts = t(s, d, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
        .groupBy(col("o_totalprice").as("price"),
          col("o_orderdate").as("odate"))
        .agg(count(lit(1)).as("n"))
      graft.operators.Skyline.skyline2D(pts, "price", "odate", 50000.0)
    }),

    // Weekly cohort retention: users grouped by their FIRST active week;
    // each (cohort_week, week_offset) cell counts how many of that
    // cohort were active that many weeks later — the standard
    // growth-analytics retention triangle. One (user, week) distinct
    // relation feeds both the cohort assignment and the activity matrix;
    // the join and both aggregations key on user_id (co-partitioned),
    // and the output is a constant |weeks|^2/2 cells at any corpus size.
    // date_trunc('week') is Monday-aligned in both engines, so the
    // day-difference divides by 7 exactly.
    "q_events_retention" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"),
          date_trunc("week", col("ts")).cast("date").as("week"))
        .distinct()
        .transform(graft.CacheScope.persisted(_))
      val cohort = ev.groupBy("user_id").agg(min(col("week")).as("cohort_week"))
      ev.join(cohort, "user_id")
        .select(col("cohort_week"),
          expr("datediff(week, cohort_week) div 7").cast("long").as("week_offset"))
        .groupBy("cohort_week", "week_offset")
        .agg(count(lit(1)).as("n_users"))
    }),

    // Bounded-lag EWMA smoothing of the per-type daily value series —
    // the monitoring/trend primitive OHLC bars feed. The classic
    // recursive EWMA is inherently sequential (and its closed form
    // (1-a)^(-i) prefix trick overflows doubles past ~150 steps), so
    // this is the standard K-tap FIR approximation: 8 lags with weights
    // (1-a)^j, re-normalized over the lags that exist at the series
    // head. Weight j decays to (0.8)^7 ~ 0.21 of the current sample;
    // the dropped tail is < 17% of total mass — a dial, not a truth.
    // Determinism: daily totals are exact decimal sums, the weights are
    // round(,9)-pinned decimals, so numerator and denominator are exact
    // decimal dot products and the single final division is identical
    // IEEE. Scale shape: one events-sized aggregation, then a WINDOW
    // over the BOUNDED daily relation (|types| x |days|), partitioned by
    // type — never an unpartitioned window, never a self-join.
    "q_ts_ewma" -> ((s, d) => {
      // weights pinned at scale 6, NOT 9: (18,4)-totals x (18,6)-weights
      // gives num scale 10, whose scaled integer (~3e13) stays under
      // 2^53 — the decimal->double cast is exact in both engines. At
      // scale 9 the num integer (~3e16) is past 2^53 and the lossy casts
      // diverge per engine; downscaling first doesn't help either,
      // because Spark rounds HALF_UP on decimal downscale while DuckDB
      // TRUNCATES (both measured as 1-digit ewma drift).
      val dec6 = org.apache.spark.sql.types.DecimalType(18, 6)
      // the widened sum type (38,4) must come back down to (18,4) before
      // the weight products: (38,4) x (18,9) exceeds decimal-128 and
      // forces engine-SPECIFIC precision loss (measured: 1-ulp ewma
      // drift); (18,4) x (18,9) = (37,13) stays exact in both engines.
      val daily = t(s, d, "events")
        .groupBy(col("event_type"),
          date_trunc("day", col("ts")).cast("date").as("day"))
        .agg(sum(col("value").cast(
          org.apache.spark.sql.types.DecimalType(18, 4))).as("total0"))
        .select(col("event_type"), col("day"),
          col("total0").cast(
            org.apache.spark.sql.types.DecimalType(18, 4)).as("total"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("event_type").orderBy("day")
      val weights = (0 until EwmaTaps).map(j =>
        BigDecimal(math.pow(1.0 - EwmaAlpha, j))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
      // each product comes down from its inferred (37,10) to an exact
      // (28,10) BEFORE the 8-term addition chain: Spark grows addition
      // precision by 1 per step and, past 38, allowPrecisionLoss shaves
      // the SCALE (measured: num silently rounded to 6 decimals, a
      // 1e-10-relative quotient drift vs the oracle's exact scale-10
      // sum). At (28,10) the chain peaks at (35,10) — exact end-to-end.
      val dec2810 = org.apache.spark.sql.types.DecimalType(28, 10)
      val num = weights.zipWithIndex.map { case (wj, j) =>
        (coalesce(lag(col("total"), j).over(w),
          lit(BigDecimal(0)).cast(org.apache.spark.sql.types.DecimalType(18, 4))) *
          lit(wj).cast(dec6)).cast(dec2810)
      }.reduce(_ + _)
      val den = weights.zipWithIndex.map { case (wj, j) =>
        when(lag(col("total"), j).over(w).isNotNull, lit(wj).cast(dec6))
          .otherwise(lit(BigDecimal(0)).cast(dec6))
      }.reduce(_ + _)
      daily.select(col("event_type"), col("day"),
        col("total").cast("double").as("total"),
        round(num.cast("double") / den.cast("double"), 6).as("ewma"))
    }),

    // Per-type 3-sigma anomaly flagging from exact integer-like moments:
    // population mean/variance via decimal sums kept EXACT through
    // var_num = n*ssq - sx^2, so the only float steps are two divisions
    // and one sqrt on identical operands in both engines — z-scores are
    // bit-identical, and the |z| >= 3 gate cannot flip on summation
    // order. Scale shape: one events aggregation to |types| rows of
    // moments, broadcast back into a narrow filter scan — the same
    // two-pass profile a streaming detector would maintain as running
    // state. (n^2 as int64 caps n at ~3e9 per type; past that, lift the
    // moments to DECIMAL(38) — the dial is explicit, and ANSI mode
    // makes the overflow loud, never silent.)
    "q_ts_zscore" -> ((s, d) => {
      val x = col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2))
      val ev = t(s, d, "events")
        .select(col("event_id"), col("event_type"), x.as("x"))
      val st = ev.groupBy("event_type")
        .agg(sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
          count(lit(1)).as("n"))
      val dev = (col("x") * col("n") - col("sx")).cast("double")
      val varD = (col("sxx") * col("n") - col("sx") * col("sx")).cast("double") /
        (col("n") * col("n")).cast("double")
      val z = round(dev / (col("n").cast("double") * sqrt(varD)), 6)
      ev.join(broadcast(st), "event_type")
        .select(col("event_id"), col("event_type"),
          col("x").cast("double").as("value"), z.as("z"))
        .filter(abs(col("z")) >= 3.0)
    }),

    // BATCH sessionization ([[sessionizeBatchOf]]) — the offline twin of
    // stream_session/stream_sessionize_custom: gap-based session ids via
    // the classic lag-flag + running-sum window pair (both user-keyed,
    // never a global sort), then per-session stats in one aggregation.
    // Micro-second integer arithmetic end to end, so the gap predicate
    // and durations are exact in both engines.
    "q_events_sessionize" -> ((s, d) => sessionizeBatchOf(t(s, d, "events"))),

    // Gaps-and-islands: each user's LONGEST run of consecutive active
    // days (the engagement-streak metric), via the classic day − rank
    // grouping key — consecutive days share a constant difference, so
    // the islands fall out of one user-partitioned row_number and a
    // per-(user, island) aggregate; the longest-streak argmax is
    // max(struct) with earliest-start tiebreak, no second window. The
    // q_events_sessionize sibling at day grain: that one cuts on TIME
    // gaps inside a day, this one on calendar holes across days.
    "q_events_streaks" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("day")
      val days = t(s, d, "events")
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      val grp = days
        .withColumn("grp", expr("date_sub(day, row_number() OVER " +
          "(PARTITION BY user_id ORDER BY day))"))
      val islands = grp.groupBy(col("user_id"), col("grp"))
        .agg(count(lit(1)).as("len"), min(col("day")).as("start"))
      islands.groupBy(col("user_id"))
        .agg(sum(col("len")).as("n_active_days"),
          count(lit(1)).as("n_streaks"),
          max(struct(col("len"),
            (-datediff(col("start"), to_date(lit("1970-01-01")))).as("negs")))
            .as("m"))
        .select(col("user_id"), col("n_active_days"), col("n_streaks"),
          col("m.len").as("longest_streak"),
          date_add(to_date(lit("1970-01-01")), -col("m.negs")).as("streak_start"))
    }),

    // U-shaped multi-touch attribution ([[attributionOf]]): every click in
    // the 72h lookback of a purchase gets fractional credit — 40/40 to the
    // first and last touch, the middle 20% split evenly (1.0 and 0.5/0.5
    // for 1- and 2-touch paths). The funnel query answers "which single
    // click converted"; this one distributes the conversion over the whole
    // path — the marketing-credit primitive.
    "q_events_attribution" -> ((s, d) => attributionOf(t(s, d, "events"))),

    // Two-sample (Welch) z-test on mean purchase value with a
    // deterministic 50/50 user split (user_id parity — the hash-keyed
    // assignment a real experiment framework uses, never rand()): exact
    // DECIMAL moment sums per variant in ONE aggregation (the q_ts_zscore
    // discipline — a float mean/variance could never hash-match), pivoted
    // to one row, then the z statistic as the same IEEE double tree in
    // both engines. (A conversion-RATE test is degenerate on this corpus —
    // every synthetic user purchases — so the value metric is also the
    // statistically interesting one.)
    "q_events_abtest" -> ((s, d) => {
      val x = col("value").cast(org.apache.spark.sql.types.DecimalType(12, 2))
      val st = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(pmod(col("user_id"), lit(2)).as("variant"), x.as("x"))
        .groupBy("variant")
        .agg(sum(col("x")).as("sx"), sum(col("x") * col("x")).as("sxx"),
          count(lit(1)).as("n"))
      def side(v: Int, c: String) = max(when(col("variant") === v, col(c)))
      val w = st.agg(
        side(0, "n").as("n0"), side(0, "sx").as("sx0"), side(0, "sxx").as("sxx0"),
        side(1, "n").as("n1"), side(1, "sx").as("sx1"), side(1, "sxx").as("sxx1"))
      def mean(i: Int) =
        col(s"sx$i").cast("double") / col(s"n$i").cast("double")
      def variance(i: Int) =
        (col(s"sxx$i") * col(s"n$i") - col(s"sx$i") * col(s"sx$i")).cast("double") /
          (col(s"n$i") * col(s"n$i")).cast("double")
      w.select(col("n0"), col("n1"),
        round(mean(0), 6).as("mean0"), round(mean(1), 6).as("mean1"),
        round((mean(0) - mean(1)) /
          sqrt(variance(0) / col("n0").cast("double") +
            variance(1) / col("n1").cast("double")), 6).as("z"))
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
    })
  )

  /** Attribution lookback window (hours before the purchase). */
  val AttrWindowHours = 72

  /** Session gap: a pause longer than this starts a new session. */
  val SessionGapMinutes = 30

  /** Gap-based batch sessionization over any events relation — public so
    * specs can plant gap patterns. Both windows are user-partitioned with
    * the same (ts, event_id) total order; the running sum of new-session
    * flags IS the per-user session index (no distinct/join), and the
    * session roll-up is one aggregation on (user, session_idx).
    */
  def sessionizeBatchOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
    val gapUs = SessionGapMinutes.toLong * 60L * 1000000L
    val flagged = events
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn("new_sess",
        when(lag(col("ts"), 1).over(w).isNull ||
          unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)) >
            gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum(col("new_sess"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      .select(col("user_id"), col("session_idx"), col("n_events"),
        col("session_start"), col("session_end"),
        (unix_micros(col("session_end")) - unix_micros(col("session_start")))
          .as("duration_us"))
  }

  /** U-shaped attribution over any events relation — public so specs can
    * plant paths with known credits. Scale shape: the touch relation is a
    * user-keyed equi-join with a time residual (the stream-stream-join
    * shape, fan-out bounded by per-user click density x the window), the
    * per-purchase stats are ONE count/min/max aggregation (no window
    * function), and first/last flags come from struct equality against
    * the argmin/argmax — deterministic ties by event id.
    */
  def attributionOf(events: DataFrame): DataFrame = {
    val ev = events
      .select(col("user_id"), col("event_id"), col("event_type"), col("ts"))
      .transform(graft.CacheScope.persisted(_))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pu"), col("event_id").as("buy_id"),
        col("ts").as("buy_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("cu"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val touches = p.join(c, col("pu") === col("cu") &&
        col("click_ts") <= col("buy_ts") &&
        col("buy_ts") <= col("click_ts") +
          expr(s"INTERVAL $AttrWindowHours HOURS"))
      .select(col("pu").as("user_id"), col("buy_id"), col("click_id"),
        col("click_ts"))
      .transform(graft.CacheScope.persisted(_))
    val st = touches.groupBy("buy_id")
      .agg(count(lit(1)).as("n"),
        min(struct(col("click_ts"), col("click_id"))).as("f"),
        max(struct(col("click_ts"), col("click_id"))).as("l"))
    val cur = struct(col("click_ts"), col("click_id"))
    touches.join(st, Seq("buy_id"))
      .select(col("user_id"), col("buy_id"), col("click_id"),
        when(col("n") === 1, "only")
          .when(cur === col("f"), "first")
          .when(cur === col("l"), "last")
          .otherwise("mid").as("pos"),
        when(col("n") === 1, lit(1.0))
          .when(col("n") === 2, lit(0.5))
          .when(cur === col("f") || cur === col("l"), lit(0.4))
          .otherwise(round(lit(0.2) / (col("n") - 2).cast("double"), 6))
          .as("credit"))
  }

  /** EWMA smoothing factor and FIR tap count (see q_ts_ewma). */
  val EwmaAlpha = 0.2
  val EwmaTaps = 8

  /** q_markov_stationary dials: mass units per state at init, power-
    * iteration rounds (unrolled in the oracle).
    */
  val MarkovScale = 1000000000000L
  val MarkovIters = 8

  /** One unrolled stationary-distribution step (reads pi{i-1}). */
  private def markovIterCte(i: Int): String =
    s"""pi$i AS (
       |  SELECT pm.to_type AS state,
       |         CAST(sum((p.m * pm.n) // pm.rt) AS HUGEINT) AS m
       |  FROM pm JOIN pi${i - 1} p ON p.state = pm.from_type
       |  GROUP BY 1
       |)""".stripMargin

  private lazy val markovStationaryOracle: String =
    s"""WITH pr AS (
       |  SELECT event_type AS from_type,
       |         lead(event_type) OVER (PARTITION BY user_id
       |                                ORDER BY ts ASC, event_id ASC) AS to_type
       |  FROM events
       |), c AS (
       |  SELECT from_type, to_type, count(*) AS n
       |  FROM pr WHERE to_type IS NOT NULL GROUP BY 1, 2
       |), rt AS (
       |  SELECT from_type, CAST(sum(n) AS BIGINT) AS rt FROM c GROUP BY 1
       |), pm AS (
       |  SELECT c.from_type, c.to_type, c.n, r.rt
       |  FROM c JOIN rt r ON r.from_type = c.from_type
       |), pi0 AS (
       |  SELECT from_type AS state, CAST($MarkovScale AS HUGEINT) AS m FROM rt
       |),
       |${(1 to MarkovIters).map(markovIterCte).mkString(",\n")}
       |SELECT state, CAST(m AS BIGINT) AS pi_fixed,
       |       round(CAST(m AS DOUBLE) /
       |             (SELECT CAST(sum(m) AS DOUBLE) FROM pi$MarkovIters), 9) AS pi
       |FROM pi$MarkovIters""".stripMargin

  override val oracles: Map[String, String] = Map(
    // Distinct-pair self-join formulation — deliberately different from
    // the Spark side's basket-local explode.
    "q_assoc_rules" ->
      s"""WITH li AS (
         |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
         |), ps AS (
         |  SELECT a.pk AS a, b.pk AS b, count(*) AS sup_ab
         |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
         |  GROUP BY 1, 2 HAVING count(*) >= $AssocMinSup
         |), ss AS (
         |  SELECT pk, count(*) AS sup FROM li GROUP BY pk
         |), n AS (
         |  SELECT count(DISTINCT ok) AS n_orders FROM li
         |)
         |SELECT p.a AS antecedent, p.b AS consequent, p.sup_ab,
         |       round(CAST(p.sup_ab AS DOUBLE) / CAST(sa.sup AS DOUBLE), 6) AS confidence,
         |       round(CAST(n.n_orders * p.sup_ab AS DOUBLE) /
         |             CAST(sa.sup * sb.sup AS DOUBLE), 6) AS lift
         |FROM ps p
         |JOIN ss sa ON sa.pk = p.a
         |JOIN ss sb ON sb.pk = p.b
         |CROSS JOIN n""".stripMargin,

    "q_events_funnel" ->
      """WITH v AS (
        |  SELECT user_id, event_id AS view_id, ts AS view_ts
        |  FROM events WHERE event_type = 'view'
        |), c AS (
        |  SELECT user_id, event_id AS click_id, ts AS click_ts
        |  FROM events WHERE event_type = 'click'
        |), p AS (
        |  SELECT user_id, event_id AS buy_id, ts AS buy_ts
        |  FROM events WHERE event_type = 'purchase'
        |), vc AS (
        |  SELECT user_id, click_id, click_ts, view_id, view_ts FROM (
        |    SELECT c.user_id, c.click_id, c.click_ts, v.view_id, v.view_ts,
        |           row_number() OVER (PARTITION BY c.click_id
        |             ORDER BY v.view_ts DESC, v.view_id DESC) AS rn
        |    FROM c JOIN v ON v.user_id = c.user_id
        |      AND v.view_ts <= c.click_ts
        |      AND c.click_ts <= v.view_ts + INTERVAL 24 HOUR
        |  ) WHERE rn = 1
        |)
        |SELECT user_id, view_id, click_id, buy_id, view_ts, click_ts, buy_ts
        |FROM (
        |  SELECT p.user_id, vc.view_id, vc.click_id, p.buy_id,
        |         vc.view_ts, vc.click_ts, p.buy_ts,
        |         row_number() OVER (PARTITION BY p.buy_id
        |           ORDER BY vc.click_ts DESC, vc.click_id DESC) AS rn
        |  FROM p JOIN vc ON vc.user_id = p.user_id
        |    AND vc.click_ts <= p.buy_ts
        |    AND p.buy_ts <= vc.click_ts + INTERVAL 24 HOUR
        |) WHERE rn = 1""".stripMargin,

    // Direct single-level monthly aggregate — the Spark side merges daily
    // partials; equality proves the partial states merge exactly.
    "q_incremental_agg" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       count(*) AS n_items,
        |       round(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS avg_rev
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    "q_events_retention" ->
      """WITH ev AS (
        |  SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
        |  FROM events
        |), c AS (
        |  SELECT user_id, min(week) AS cohort_week FROM ev GROUP BY user_id
        |)
        |SELECT c.cohort_week,
        |       CAST((ev.week - c.cohort_week) // 7 AS BIGINT) AS week_offset,
        |       count(*) AS n_users
        |FROM ev JOIN c ON c.user_id = ev.user_id
        |GROUP BY 1, 2""".stripMargin,

    "q_ts_ewma" -> {
      val weights = (0 until EwmaTaps).map(j =>
        BigDecimal(math.pow(1.0 - EwmaAlpha, j))
          .setScale(6, BigDecimal.RoundingMode.HALF_UP))
      val num = weights.zipWithIndex.map { case (wj, j) =>
        s"COALESCE(lag(total, $j) OVER w, CAST(0 AS DECIMAL(18,4))) * CAST('$wj' AS DECIMAL(18,6))"
      }.mkString(" +\n         ")
      val den = weights.zipWithIndex.map { case (wj, j) =>
        s"CASE WHEN lag(total, $j) OVER w IS NOT NULL THEN CAST('$wj' AS DECIMAL(18,6)) ELSE CAST(0 AS DECIMAL(18,6)) END"
      }.mkString(" +\n         ")
      s"""WITH daily AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DECIMAL(18,4)) AS total
         |  FROM events GROUP BY 1, 2
         |)
         |SELECT event_type, day, CAST(total AS DOUBLE) AS total,
         |       round(CAST($num AS DOUBLE) /
         |             CAST($den AS DOUBLE), 6) AS ewma
         |FROM daily
         |WINDOW w AS (PARTITION BY event_type ORDER BY day)""".stripMargin
    },

    "q_ts_zscore" ->
      """WITH ev AS (
        |  SELECT event_id, event_type, CAST(value AS DECIMAL(12,2)) AS x
        |  FROM events
        |), st AS (
        |  SELECT event_type, sum(x) AS sx, sum(x * x) AS sxx, count(*) AS n
        |  FROM ev GROUP BY 1
        |)
        |SELECT * FROM (
        |  SELECT e.event_id, e.event_type, CAST(e.x AS DOUBLE) AS value,
        |         round(CAST(e.x * s.n - s.sx AS DOUBLE) /
        |               (CAST(s.n AS DOUBLE) *
        |                sqrt(CAST(s.sxx * s.n - s.sx * s.sx AS DOUBLE) /
        |                     CAST(s.n * s.n AS DOUBLE))), 6) AS z
        |  FROM ev e JOIN st s USING (event_type)
        |) WHERE abs(z) >= 3""".stripMargin,

    "q_events_streaks" ->
      """WITH days AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
        |), grp AS (
        |  SELECT user_id, day,
        |         day - CAST(row_number() OVER (PARTITION BY user_id
        |                                       ORDER BY day) AS INT) AS grp
        |  FROM days
        |), islands AS (
        |  SELECT user_id, grp, count(*) AS len, min(day) AS start
        |  FROM grp GROUP BY 1, 2
        |)
        |SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
        |       count(*) AS n_streaks,
        |       -- composite scalar key: len dominates, earlier start wins ties
        |       -- (epoch day < 1e6 at any plausible horizon)
        |       CAST(max_by(len, len * 1000000 - (start - DATE '1970-01-01'))
        |            AS BIGINT) AS longest_streak,
        |       max_by(start, len * 1000000 - (start - DATE '1970-01-01'))
        |         AS streak_start
        |FROM islands GROUP BY user_id""".stripMargin,

    "q_events_sessionize" -> {
      val gapUs = SessionGapMinutes.toLong * 60L * 1000000L
      s"""WITH f AS (
         |  SELECT user_id, event_id, ts,
         |         CASE WHEN lag(ts) OVER w IS NULL
         |              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > $gapUs
         |              THEN 1 ELSE 0 END AS new_sess
         |  FROM events
         |  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
         |), g AS (
         |  SELECT user_id, ts,
         |         sum(new_sess) OVER (PARTITION BY user_id
         |                             ORDER BY ts ASC, event_id ASC
         |                             ROWS BETWEEN UNBOUNDED PRECEDING
         |                             AND CURRENT ROW) AS session_idx
         |  FROM f
         |)
         |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
         |       count(*) AS n_events,
         |       min(ts) AS session_start, max(ts) AS session_end,
         |       epoch_us(max(ts)) - epoch_us(min(ts)) AS duration_us
         |FROM g GROUP BY 1, 2""".stripMargin
    },

    // Window-function formulation — deliberately different from the Spark
    // side's single count/min/max aggregation (ra=1 <=> argmin struct).
    "q_events_attribution" ->
      s"""WITH t AS (
         |  SELECT p.user_id, p.event_id AS buy_id, p.ts AS buy_ts,
         |         c.event_id AS click_id, c.ts AS click_ts
         |  FROM events p
         |  JOIN events c ON c.user_id = p.user_id
         |   AND p.event_type = 'purchase' AND c.event_type = 'click'
         |   AND c.ts <= p.ts
         |   AND p.ts <= c.ts + INTERVAL $AttrWindowHours HOURS
         |), r AS (
         |  SELECT user_id, buy_id, click_id,
         |         row_number() OVER (PARTITION BY buy_id
         |                            ORDER BY click_ts ASC, click_id ASC) AS ra,
         |         row_number() OVER (PARTITION BY buy_id
         |                            ORDER BY click_ts DESC, click_id DESC) AS rd,
         |         count(*) OVER (PARTITION BY buy_id) AS n
         |  FROM t
         |)
         |SELECT user_id, buy_id, click_id,
         |       CASE WHEN n = 1 THEN 'only' WHEN ra = 1 THEN 'first'
         |            WHEN rd = 1 THEN 'last' ELSE 'mid' END AS pos,
         |       CASE WHEN n = 1 THEN 1.0 WHEN n = 2 THEN 0.5
         |            WHEN ra = 1 OR rd = 1 THEN 0.4
         |            ELSE round(0.2 / CAST(n - 2 AS DOUBLE), 6) END AS credit
         |FROM r""".stripMargin,

    "q_events_abtest" ->
      """WITH s AS (
        |  SELECT user_id % 2 AS variant,
        |         sum(CAST(value AS DECIMAL(12,2))) AS sx,
        |         sum(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS sxx,
        |         count(*) AS n
        |  FROM events WHERE event_type = 'purchase' GROUP BY 1
        |), w AS (
        |  SELECT max(CASE WHEN variant = 0 THEN n END) AS n0,
        |         max(CASE WHEN variant = 0 THEN sx END) AS sx0,
        |         max(CASE WHEN variant = 0 THEN sxx END) AS sxx0,
        |         max(CASE WHEN variant = 1 THEN n END) AS n1,
        |         max(CASE WHEN variant = 1 THEN sx END) AS sx1,
        |         max(CASE WHEN variant = 1 THEN sxx END) AS sxx1
        |  FROM s
        |)
        |SELECT n0, n1,
        |       round(CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE), 6) AS mean0,
        |       round(CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) AS mean1,
        |       round((CAST(sx0 AS DOUBLE) / CAST(n0 AS DOUBLE) -
        |              CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)) /
        |             sqrt(CAST(sxx0 * n0 - sx0 * sx0 AS DOUBLE) /
        |                  CAST(n0 * n0 AS DOUBLE) / CAST(n0 AS DOUBLE) +
        |                  CAST(sxx1 * n1 - sx1 * sx1 AS DOUBLE) /
        |                  CAST(n1 * n1 AS DOUBLE) / CAST(n1 AS DOUBLE)), 6) AS z
        |FROM w""".stripMargin,

    "q_profile" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .map(c =>
        s"""SELECT '$c' AS column_name, count(*) AS n_rows,
           |       count($c) AS n_nonnull, count(DISTINCT $c) AS n_distinct,
           |       CAST(min($c) AS VARCHAR) AS min_str,
           |       CAST(max($c) AS VARCHAR) AS max_str
           |FROM orders""".stripMargin)
      .mkString("\nUNION ALL\n"),

    "q_markov_stationary" -> markovStationaryOracle,

    "q_markov_transitions" ->
      """WITH p AS (
        |  SELECT event_type AS from_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts ASC, event_id ASC) AS to_type
        |  FROM events
        |), c AS (
        |  SELECT from_type, to_type, count(*) AS n
        |  FROM p WHERE to_type IS NOT NULL GROUP BY 1, 2
        |)
        |SELECT from_type, to_type, n,
        |       round(CAST(n AS DOUBLE) /
        |             sum(n) OVER (PARTITION BY from_type), 9) AS p
        |FROM c""".stripMargin,

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

    // Independent open/close: row_number windows instead of struct argmin.
    "q_ohlc_bars" ->
      s"""WITH e AS (
         |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
         |         ts, event_id, value
         |  FROM events
         |), r AS (
         |  SELECT *,
         |         row_number() OVER (PARTITION BY event_type, day
         |                            ORDER BY ts ASC, event_id ASC) AS rn_a,
         |         row_number() OVER (PARTITION BY event_type, day
         |                            ORDER BY ts DESC, event_id DESC) AS rn_d
         |  FROM e
         |), agg AS (
         |  SELECT event_type, day, max(value) AS high, min(value) AS low,
         |         ${dsumSql("value", 4)} AS volume, count(*) AS n_events
         |  FROM e GROUP BY 1, 2
         |)
         |SELECT a.event_type, a.day, o.value AS open, a.high, a.low,
         |       c.value AS close, a.volume, a.n_events
         |FROM agg a
         |JOIN r o ON o.event_type = a.event_type AND o.day = a.day AND o.rn_a = 1
         |JOIN r c ON c.event_type = a.event_type AND c.day = a.day AND c.rn_d = 1""".stripMargin,

    "q_gapfill_locf" ->
      s"""WITH h AS (
         |  SELECT event_type, date_trunc('hour', ts) AS hour,
         |         ${dsumSql("value", 4)} AS total
         |  FROM events WHERE event_type IN ('purchase', 'signup')
         |  GROUP BY 1, 2
         |), rng AS (
         |  SELECT event_type, min(hour) AS lo, max(hour) AS hi FROM h GROUP BY 1
         |), dense AS (
         |  SELECT event_type,
         |         unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour
         |  FROM rng
         |)
         |SELECT d.event_type, CAST(d.hour AS TIMESTAMP) AS hour, h.total,
         |       last_value(h.total IGNORE NULLS)
         |         OVER (PARTITION BY d.event_type ORDER BY d.hour
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled,
         |       CAST(CASE WHEN h.total IS NULL THEN 1 ELSE 0 END AS BIGINT) AS was_gap
         |FROM dense d
         |LEFT JOIN h ON h.event_type = d.event_type AND h.hour = d.hour""".stripMargin,

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

    // Independent all-pairs dominance check (see q_skyline's comment).
    "q_skyline" ->
      """WITH p AS (
        |  SELECT o_totalprice AS price, o_orderdate AS odate, count(*) AS n
        |  FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        |  GROUP BY 1, 2
        |)
        |SELECT price, odate, n FROM p a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM p b
        |  WHERE b.price <= a.price AND b.odate >= a.odate
        |    AND (b.price < a.price OR b.odate > a.odate))""".stripMargin,

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

    "q_sql_grouping_sets" -> GSets,
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

    "q_histogram" ->
      s"""SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
         |       count(*) AS n, ${dsumSql("o_totalprice", 2)} AS total
         |FROM orders GROUP BY 1""".stripMargin,
    "q_sql_scalar_subquery" -> ScalarSub,
    "q_sql_exists" -> ExistsSub,
    "q_sql_not_in" -> NotInSub,
    "q_sql_recursive" -> RecursiveSql,
    "q_sql_lateral" -> LateralSql,

    "q_range_join" ->
      """SELECT a.event_id AS event_a, b.event_id AS event_b,
        |       a.user_id AS user_id,
        |       epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
        |FROM events a JOIN events b
        |  ON a.user_id = b.user_id
        | AND epoch_us(b.ts) - epoch_us(a.ts) >= 0
        | AND epoch_us(b.ts) - epoch_us(a.ts) < 60000000
        | AND (epoch_us(b.ts) > epoch_us(a.ts) OR b.event_id > a.event_id)""".stripMargin,

    "q_pivot" ->
      """SELECT user_id,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        |FROM events GROUP BY user_id""".stripMargin,

    "q_unpivot" ->
      s"""WITH a AS (
         |  SELECT l_returnflag,
         |         ${dsumSql("l_quantity", 2)} AS qty,
         |         ${dsumSql("l_discount", 2)} AS disc,
         |         ${dsumSql("l_tax", 2)} AS tax
         |  FROM lineitem GROUP BY 1
         |)
         |SELECT l_returnflag, measure, amount
         |FROM a UNPIVOT (amount FOR measure IN (qty, disc, tax))""".stripMargin,

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

    // Salt is distribution-only, so the oracle is the PLAIN join.
    "q_join_salted_skew" ->
      s"""WITH e AS (
         |  SELECT event_id, user_id, value,
         |         CASE WHEN user_id % 10 < 7 THEN 0 ELSE user_id END AS skew_key
         |  FROM events
         |), dim AS (
         |  SELECT DISTINCT skew_key,
         |         'g' || CAST(skew_key % 7 AS VARCHAR) AS grp
         |  FROM e
         |)
         |SELECT dim.grp, count(*) AS n, ${dsumSql("e.value", 4)} AS total
         |FROM e JOIN dim ON e.skew_key = dim.skew_key
         |GROUP BY dim.grp""".stripMargin
  )
}
