package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.QueryPack

/** Structural PROFILE readouts of the co-purchase graph — the one-page
  * gauges a run reads BEFORE committing to the iterative jobs in
  * [[GraphQueries]] (split from there per the per-file 1,000-line
  * budget, r14; keys and oracles byte-identical): the degree
  * distribution (power-law tail => salting/AQE on the rank join) and
  * Newman degree assortativity (hubs-to-hubs vs hub-and-spoke — the
  * scalar that says which skew mitigation applies). Both consume the
  * shared materialized edge relation ([[GraphQueries.edges]]).
  */
object GraphProfileQueries extends QueryPack {

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Degree-distribution profile of the same graph: the skew gauge you
    // read BEFORE running the iterative jobs (a power-law tail here is
    // what motivates salting/AQE on the rank join).
    "q_graph_degree" -> ((s, d) =>
      GraphQueries.edges(s, d).groupBy("src").agg(count(lit(1)).as("outdeg"))
        .groupBy("outdeg").agg(count(lit(1)).as("n_nodes"))),

    // Degree assortativity (Newman): the Pearson correlation of endpoint
    // degrees over every directed edge — one scalar that says whether
    // hubs attach to hubs (r > 0, social-graph shape) or to leaves
    // (r < 0, the hub-and-spoke shape that drives skew mitigation). Two
    // degree joins + exact-DECIMAL moment sums (the q_ts_acf discipline:
    // degrees are bounded ints, products stay inside DECIMAL(38), the
    // single double division is round(,6)-pinned). On the symmetric
    // co-purchase relation this is the undirected coefficient.
    "q_graph_assortativity" -> ((s, d) => {
      val e = GraphQueries.edges(s, d).transform(graft.CacheScope.persisted(_))
      val deg = e.groupBy("src").agg(count(lit(1)).as("dg"))
        .transform(graft.CacheScope.persisted(_))
      // Precision budget (Spark multiply: DECIMAL(p1)*DECIMAL(p2) ->
      // DECIMAL(p1+p2+1), clamped at 38 with silent-null/ANSI-throw past
      // it): n(12)*sxy(25)+1 = 38 and sx(18)*sy(18)+1 = 37, so NO product
      // below is clamped — the exactness invariant genuinely holds for
      // deg <= 1e6, edges < 1e12, deg·edges < 1e18 (ADVICE r10: the old
      // 14/20/26 casts put n*sxy at precision 41, silently clamped).
      val x = col("da").cast(DecimalType(12, 0))
      val y = col("db").cast(DecimalType(12, 0))
      val m = e
        .join(deg.select(col("src"), col("dg").as("da")), "src")
        .join(deg.select(col("src").as("dst"), col("dg").as("db")), "dst")
        .agg(count(lit(1)).cast(DecimalType(12, 0)).as("n"),
          sum(x).cast(DecimalType(18, 0)).as("sx"),
          sum(y).cast(DecimalType(18, 0)).as("sy"),
          sum(x * y).cast(DecimalType(25, 0)).as("sxy"),
          sum(x * x).cast(DecimalType(25, 0)).as("sxx"),
          sum(y * y).cast(DecimalType(25, 0)).as("syy"))
      m.select(col("n").cast("long").as("n_edges"),
        round((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt(greatest(lit(0.0),
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))) *
           sqrt(greatest(lit(0.0),
             (col("n") * col("syy") - col("sy") * col("sy")).cast("double")))),
          6).as("assortativity"))
    })
  )

  override val oracles: Map[String, String] = Map(
    "q_graph_degree" ->
      s"""${GraphQueries.edgesCte}
         |SELECT outdeg, count(*) AS n_nodes FROM deg GROUP BY outdeg""".stripMargin,

    "q_graph_assortativity" ->
      s"""${GraphQueries.edgesCte},
         |m AS (
         |  SELECT CAST(count(*) AS DECIMAL(14,0)) AS n,
         |         CAST(sum(CAST(a.outdeg AS DECIMAL(12,0))) AS DECIMAL(20,0)) AS sx,
         |         CAST(sum(CAST(b.outdeg AS DECIMAL(12,0))) AS DECIMAL(20,0)) AS sy,
         |         CAST(sum(CAST(a.outdeg AS DECIMAL(12,0)) * CAST(b.outdeg AS DECIMAL(12,0))) AS DECIMAL(26,0)) AS sxy,
         |         CAST(sum(CAST(a.outdeg AS DECIMAL(12,0)) * CAST(a.outdeg AS DECIMAL(12,0))) AS DECIMAL(26,0)) AS sxx,
         |         CAST(sum(CAST(b.outdeg AS DECIMAL(12,0)) * CAST(b.outdeg AS DECIMAL(12,0))) AS DECIMAL(26,0)) AS syy
         |  FROM edges e
         |  JOIN deg a ON a.src = e.src
         |  JOIN deg b ON b.src = e.dst
         |)
         |SELECT CAST(n AS BIGINT) AS n_edges,
         |       round(CAST(CAST(n AS HUGEINT) * CAST(sxy AS HUGEINT) -
         |                  CAST(sx AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) /
         |             (sqrt(greatest(0.0, CAST(CAST(n AS HUGEINT) * CAST(sxx AS HUGEINT) -
         |                  CAST(sx AS HUGEINT) * CAST(sx AS HUGEINT) AS DOUBLE))) *
         |              sqrt(greatest(0.0, CAST(CAST(n AS HUGEINT) * CAST(syy AS HUGEINT) -
         |                  CAST(sy AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE)))),
         |             6) AS assortativity
         |FROM m""".stripMargin
  )
}
