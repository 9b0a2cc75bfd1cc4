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

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // The SQL surface: same text as the oracle, run by Catalyst.
    "q_sql_tpch_q3" -> ((s, d) => {
      Seq("customer", "orders", "lineitem").foreach(n =>
        t(s, d, n).createOrReplaceTempView(n))
      s.sql(Q3)
    }),

    "q_sql_scalar_subquery" -> ((s, d) => {
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql(ScalarSub)
    }),

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
          count(lit(1)).as("n")))
  )

  override val oracles: Map[String, String] = Map(
    "q_sql_tpch_q3" -> Q3,
    "q_sql_scalar_subquery" -> ScalarSub,

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
         |FROM lineitem GROUP BY l_returnflag""".stripMargin
  )
}
