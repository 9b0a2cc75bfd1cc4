package graft

import org.apache.spark.sql.functions._

/** sf0.1 correctness gate for the ITERATIVE dedup family.
  *
  * The driver's DuckDB oracle runs at sf0.01 only; the round-7
  * convergence-margin hazard (`dedup_semantic_clusters` landing on the
  * iteration cap with zero margin) was only visible at sf0.1. This spec
  * closes that harness gap: it runs the fixpoint queries at sf0.1 and
  * checks the labels against an INDEPENDENT algorithm — a driver-side
  * union-find over the collected candidate pairs. Collecting is test-only
  * and safe: the candidate PAIR relation is a few hundred rows at sf0.1
  * (the labels themselves are never collected from the production path).
  *
  * Strictness is implicitly under test too: since round 8 an unconverged
  * fixpoint THROWS, so a green run certifies a confirmed fixpoint at this
  * scale, not a lucky landing on the cap.
  *
  * Cancels (rather than fails) when the sf0.1 testdata is absent.
  */
class ClustersScaleGateSpec extends SparkSpec {

  private val sf01 = "/root/testdata/sf0.1"

  private def requireSf01(): Unit =
    assume(new java.io.File(s"$sf01/documents.parquet").exists(),
      s"sf0.1 testdata not present at $sf01")

  /** Reference components: plain sequential union-find, labels = min
    * member — deliberately nothing in common with the distributed
    * min-label fixpoint under test.
    */
  private def expectedClusters(pairs: Seq[(Long, Long)],
      universe: Seq[Long]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    // Iterative find (stack-safe for long planted chains), with full path
    // compression applied on the way back.
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (c != r) { val n = parent(c); parent(c) = r; c = n }
      r
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(ra) = rb
    }
    val minOfRoot = scala.collection.mutable.Map[Long, Long]()
    val members = pairs.flatMap(p => Seq(p._1, p._2)).toSet
    members.foreach { m =>
      val r = find(m)
      minOfRoot(r) = math.min(minOfRoot.getOrElse(r, m), m)
    }
    universe.map(d => d -> (if (members.contains(d))
      minOfRoot(find(d)) else d)).toMap
  }

  private def gate(pairsQuery: => org.apache.spark.sql.DataFrame,
      clustersQuery: => org.apache.spark.sql.DataFrame,
      universeIds: Seq[Long], aCol: String, bCol: String,
      idCol: String): Unit = {
    val pairs = pairsQuery.select(col(aCol), col(bCol))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    CacheScope.releaseAll()
    assert(pairs.nonEmpty, "gate needs a non-trivial candidate graph")
    val expected = expectedClusters(pairs, universeIds)
    val got = clustersQuery.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    CacheScope.releaseAll()
    assert(got.size == universeIds.size,
      s"label count ${got.size} != universe ${universeIds.size}")
    val diff = expected.collect {
      case (d, c) if got.get(d) != Some(c) => (d, c, got.get(d))
    }
    assert(diff.isEmpty,
      s"${diff.size} labels diverge from the sequential union-find, " +
        s"e.g. ${diff.take(5).toList}")
  }

  test("sf0.1: dedup_clusters matches a sequential union-find exactly") {
    requireSf01()
    val universe = Tables.load(spark, sf01, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    gate(
      SparkEntry.queries("dedup_minhash_lsh")(spark, sf01)
        .filter(col("jaccard") >= 0.3),
      SparkEntry.queries("dedup_clusters")(spark, sf01),
      universe, "doc_a", "doc_b", "doc_id")
  }

  test("sf0.1: dedup_semantic_clusters matches a sequential union-find exactly") {
    requireSf01()
    val universe = Tables.load(spark, sf01, "embeddings")
      .select("vec_id").collect().map(_.getLong(0)).toSeq
    gate(
      SparkEntry.queries("dedup_embedding_cosine")(spark, sf01),
      SparkEntry.queries("dedup_semantic_clusters")(spark, sf01),
      universe, "vec_a", "vec_b", "vec_id")
  }

  /** Reference k-core: naive sequential whole-graph peeling — recompute
    * ALL degrees each round, drop sub-k nodes, repeat. Deliberately
    * nothing in common with the distributed local-seed + semi-join
    * fixpoint (or its mapPartitions cascade) under test.
    */
  private def expectedKCore(edges: Seq[(Long, Long)],
      k: Int): Map[Long, Long] = {
    var alive = edges.flatMap(e => Seq(e._1, e._2)).toSet
    var done = false
    var deg = Map.empty[Long, Long]
    while (!done) {
      deg = edges.filter(e => alive(e._1) && alive(e._2))
        .groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
      val next = deg.collect { case (n, dg) if dg >= k => n }.toSet
      done = next == alive
      alive = next
    }
    deg.filter { case (n, _) => alive(n) }
  }

  test("sf0.1: q_graph_kcore matches a sequential whole-graph peel exactly") {
    requireSf01()
    val edges = graft.graph.GraphQueries.windowedEdges(spark, sf01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    CacheScope.releaseAll()
    assert(edges.nonEmpty, "gate needs a non-trivial windowed graph")
    val expected = expectedKCore(edges, graft.graph.GraphQueries.CoreK)
    val got = SparkEntry.queries("q_graph_kcore")(spark, sf01)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    CacheScope.releaseAll()
    assert(got == expected,
      s"k-core diverges from the sequential peel: " +
        s"missing=${(expected.keySet -- got.keySet).take(5)}, " +
        s"extra=${(got.keySet -- expected.keySet).take(5)}")
  }
}
