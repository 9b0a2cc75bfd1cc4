package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.graph.GraphQueries

/** Invariants of the exact-integer HITS iteration that the hash compare
  * can't see: per-side mass conservation up to integer-truncation loss,
  * hub/authority dominance on a planted bipartite graph, exact ties for
  * structurally equivalent nodes, and bit-identical results under
  * different partitionings.
  */
class HitsSpec extends SparkSpec {

  private def edgesDf(pairs: Seq[(Long, Long)], parts: Int): DataFrame = {
    val rows = pairs.map { case (c, p) => Row(c, p) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, parts),
      StructType(Seq(StructField("c", LongType), StructField("p", LongType))))
  }

  private def hits(e: DataFrame): Map[(String, Long), Long] =
    try GraphQueries.hitsOf(e)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    finally CacheScope.releaseAll()

  // c=1 buys parts 101,102,103; c=2 buys only 101 (the shared authority).
  private val planted = Seq((1L, 101L), (1L, 102L), (1L, 103L), (2L, 101L))

  test("dominance and exact ties on a planted bipartite graph") {
    val h = hits(edgesDf(planted, 3))
    assert(h(("hub", 1L)) > h(("hub", 2L)),
      s"the 3-part buyer must out-hub the 1-part buyer: $h")
    assert(h(("auth", 101L)) > h(("auth", 102L)),
      s"the shared part must out-rank the exclusive ones: $h")
    assert(h(("auth", 102L)) == h(("auth", 103L)),
      s"exchangeable parts must tie EXACTLY: $h")
  }

  test("each side's mass is conserved up to truncation loss") {
    val h = hits(edgesDf(planted, 2))
    val hubs = h.collect { case (("hub", _), s) => s }
    val auths = h.collect { case (("auth", _), s) => s }
    // Each renormalization floors once per node: total in
    // (Tot - n_side, Tot].
    assert(hubs.sum <= GraphQueries.HitsTot &&
      hubs.sum > GraphQueries.HitsTot - hubs.size,
      s"hub mass ${hubs.sum} outside tolerance")
    assert(auths.sum <= GraphQueries.HitsTot &&
      auths.sum > GraphQueries.HitsTot - auths.size,
      s"auth mass ${auths.sum} outside tolerance")
  }

  test("bit-identical under repartitioning") {
    assert(hits(edgesDf(planted, 1)) == hits(edgesDf(planted, 5)))
  }
}
