package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Directed-graph operators over the purchase-SEQUENCE graph: within an
  * order, the part at line n points at the part at line n+1 (l_linenumber
  * is the reference's insertion order), so edges capture "bought after" —
  * a directed relation where strong connectivity is meaningful, unlike
  * the symmetric co-purchase graph every undirected query rides.
  *
  * Scale shape: the per-order window is bounded (<= 7 lineitems per
  * TPC-H order), so the edge relation is a constant multiple of lineitem;
  * [[Scc.sccOf]] then runs Pregel-shaped join+agg fixpoints with eager
  * checkpoints — see its scaladoc for the peeling/budget discipline.
  */
object SccQueries extends QueryPack {

  /** One month of directed consecutive-line edges (src -> dst), distinct,
    * self-loops dropped. Same window as GraphQueries.windowedEdges so the
    * two graph families describe the same slice of the data.
    */
  private[graft] def seqEdges(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("l_orderkey").orderBy("l_linenumber")
    Tables.load(s, d, "lineitem")
      .join(Tables.load(s, d, "orders")
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-02-01").cast("timestamp"))
          .select(col("o_orderkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey").as("src"),
        lead(col("l_partkey"), 1).over(w).as("dst"))
      .filter(col("dst").isNotNull && col("dst") =!= col("src"))
      .select(col("src"), col("dst"))
      .distinct()
  }

  private val EdgesCte =
    """WITH RECURSIVE li AS (
      |  SELECT l.l_orderkey AS ok, l.l_linenumber AS ln, l.l_partkey AS pk
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o.o_orderdate < TIMESTAMP '1996-02-01 00:00:00'
      |), seq AS (
      |  SELECT pk AS src, lead(pk) OVER (PARTITION BY ok ORDER BY ln) AS dst
      |  FROM li
      |), edges AS (
      |  SELECT DISTINCT src, dst FROM seq
      |  WHERE dst IS NOT NULL AND dst <> src
      |)""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Strongly connected components of the purchase-sequence graph:
    // which parts sit on directed "bought after" cycles? scc_id = max
    // member id (the coloring canonical). The oracle recomputes SCCs by
    // the INDEPENDENT textbook definition — mutual transitive closure —
    // so the peeling/coloring machinery is verified end-to-end against
    // first principles, not against itself.
    "q_graph_scc" -> ((s, d) =>
      Scc.sccOf(seqEdges(s, d)).orderBy("node")),

    // Reciprocity of the purchase-sequence graph: what share of
    // "A bought-after B" edges also run the other way? The 1-hop
    // mutuality summary next to q_graph_scc's full cycle structure (an
    // SCC needs reciprocal paths; this measures reciprocal EDGES). One
    // left-semi self-join on the reversed key — no fan-out, two bounded
    // aggregates.
    "q_graph_reciprocity" -> ((s, d) => {
      val e = seqEdges(s, d).transform(graft.CacheScope.persisted(_))
      val recip = e.join(
        e.select(col("dst").as("rs"), col("src").as("rd")),
        col("src") === col("rs") && col("dst") === col("rd"), "left_semi")
      e.agg(count(lit(1)).as("n_edges"))
        .crossJoin(broadcast(recip.agg(count(lit(1)).as("n_reciprocal"))))
        .select(col("n_edges"), col("n_reciprocal"),
          round(col("n_reciprocal").cast("double") /
            col("n_edges").cast("double"), 6).as("reciprocity"))
    }),

    // Local clustering coefficient over the undirected one-month
    // co-purchase graph: cc(v) = (# ordered adjacent neighbor pairs) /
    // (d(v)(d(v)-1)) — triangle counts ride the degree-ordered oriented
    // wedge join ([[GraphQueries.trianglesOf]]), so hubs cannot blow up
    // the wedge relation; the oracle counts through the independent
    // all-pairs wedge join.
    "q_graph_clustercoef" -> ((s, d) => {
      val e = GraphQueries.windowedEdges(s, d)
        .transform(graft.CacheScope.persisted(_))
      val deg = e.groupBy("src").agg(count(lit(1)).as("deg"))
      val tri = GraphQueries.trianglesOf(e)
      deg.filter(col("deg") >= 2)
        .join(tri, deg("src") === tri("node"), "left")
        .select(deg("src").as("node"), col("deg").cast("long").as("degree"),
          coalesce(col("n_tri"), lit(0L)).cast("long").as("triangles"),
          round(coalesce(col("n_tri"), lit(0L)).cast("double") * 2 /
            (col("deg") * (col("deg") - 1)).cast("double"), 6).as("clustercoef"))
    }))

  override val oracles: Map[String, String] = Map(

    "q_graph_scc" ->
      s"""$EdgesCte, nodes AS (
         |  SELECT src AS node FROM edges UNION SELECT dst FROM edges
         |), reach(node, r) AS (
         |  SELECT node, node FROM nodes
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
         |)
         |SELECT a.node AS node, max(a.r) AS scc_id
         |FROM reach a JOIN reach b ON b.node = a.r AND b.r = a.node
         |GROUP BY a.node
         |ORDER BY node""".stripMargin,

    "q_graph_reciprocity" ->
      s"""$EdgesCte
         |SELECT (SELECT count(*) FROM edges) AS n_edges,
         |       (SELECT count(*) FROM edges e
         |        WHERE EXISTS (SELECT 1 FROM edges r
         |                      WHERE r.src = e.dst AND r.dst = e.src))
         |         AS n_reciprocal,
         |       round(CAST((SELECT count(*) FROM edges e
         |                   WHERE EXISTS (SELECT 1 FROM edges r
         |                                 WHERE r.src = e.dst AND r.dst = e.src))
         |                  AS DOUBLE) /
         |             CAST((SELECT count(*) FROM edges) AS DOUBLE), 6)
         |         AS reciprocity""".stripMargin,

    "q_graph_clustercoef" ->
      """WITH li AS (
        |  SELECT DISTINCT l.l_orderkey AS ok, l.l_partkey AS pk
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
        |  WHERE o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND o.o_orderdate < TIMESTAMP '1996-02-01 00:00:00'
        |), edges AS (
        |  SELECT DISTINCT a.pk AS src, b.pk AS dst
        |  FROM li a JOIN li b ON a.ok = b.ok AND a.pk <> b.pk
        |), deg AS (
        |  SELECT src, count(*) AS deg FROM edges GROUP BY 1
        |), wedge AS (
        |  SELECT x.src AS node, count(*) AS closed2
        |  FROM edges x
        |  JOIN edges y ON y.src = x.src AND y.dst <> x.dst
        |  JOIN edges z ON z.src = x.dst AND z.dst = y.dst
        |  GROUP BY 1
        |)
        |SELECT d.src AS node, CAST(d.deg AS BIGINT) AS degree,
        |       CAST(COALESCE(w.closed2, 0) / 2 AS BIGINT) AS triangles,
        |       round(CAST(COALESCE(w.closed2, 0) AS DOUBLE) /
        |             (CAST(d.deg AS DOUBLE) * (d.deg - 1)), 6) AS clustercoef
        |FROM deg d LEFT JOIN wedge w ON w.node = d.src
        |WHERE d.deg >= 2""".stripMargin)
}
