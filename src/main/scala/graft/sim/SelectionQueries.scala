package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{CacheScope, QueryPack, Tables}

/** Data-selection operators over the embedding collection — the "which
  * rows are worth training on" step (coreset construction). First entry:
  * greedy k-center (farthest-point traversal), the classic 2-approximation
  * to the k-center objective and the standard diversity-maximizing seed
  * selector for active learning / dataset distillation.
  *
  * Scale shape: the algorithm is inherently k-sequential (k is the dial,
  * not the data), and each round is ONE narrow pass — the running
  * min-distance relation updates against just the newest center, never
  * the whole center set, and the next center is a TakeOrdered(1) argmax.
  * Distances are exact int64 on quantized vectors (d² = a·a + c·c − 2a·c
  * via the codegen'd DotQ), so the argmax tie-break (smallest vec_id) is
  * engine-exact. The per-round center (one 64-dim quantized vector) comes
  * back to the driver and re-enters the next pass as a LITERAL — the
  * BPE-trainer bounded-scalar exception (k × 64 longs, data-size-free);
  * chaining it as a 1-row broadcast relation instead doubles the
  * un-materialized plan per round (2^k re-evaluations — measured 30.3 s
  * vs ~1 s at sf0.1 for the identical algorithm).
  */
object SelectionQueries extends QueryPack {

  import VecMath.quantize

  /** Number of centers the greedy traversal picks. */
  val KCenterK = 8

  /** Triplet-mining anchor sampling: every vec_id divisible by this is an
    * anchor (a 10% deterministic sample; production swaps in the current
    * training batch's ids).
    */
  val TripletEvery = 10

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "sim_kcenter" -> ((s, d) => {
      val e0 = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), quantize(col("embedding")).as("qe"))
        .withColumn("sd", graft.functions.DotQ(col("qe"), col("qe")))
        .transform(CacheScope.persisted(_))
      val seed = e0.orderBy(col("vec_id")).limit(1).collect()(0)
      def centerDist(cqe: List[Long], csd: Long) =
        col("sd") + lit(csd) -
          lit(2L) * graft.functions.DotQ(col("qe"), typedLit(cqe))
      var picks = Vector[(Long, Long)]((seed.getAs[Long]("vec_id"), 0L))
      var md = e0.select(col("vec_id"), col("qe"), col("sd"),
          centerDist(seed.getAs[scala.collection.Seq[Long]]("qe").toList, seed.getAs[Long]("sd")).as("dm"))
        .transform(CacheScope.persisted(_))
      for (_ <- 1 until KCenterK) {
        val c = md.orderBy(col("dm").desc, col("vec_id").asc).limit(1).collect()(0)
        picks = picks :+ ((c.getAs[Long]("vec_id"), c.getAs[Long]("dm")))
        md = md.select(col("vec_id"), col("qe"), col("sd"),
            least(col("dm"),
              centerDist(c.getAs[scala.collection.Seq[Long]]("qe").toList, c.getAs[Long]("sd"))).as("dm"))
          .transform(CacheScope.persisted(_))
      }
      val out = picks.zipWithIndex.map { case ((vid, d2), i) => (i.toLong, vid, d2) }
      s.createDataFrame(out).toDF("sel_order", "vec_id", "d2")
        .select(col("sel_order"), col("vec_id"),
          round(col("d2").cast("double") / 1e6, 6).as("radius2"))
    }),

    // Hard-triplet mining (FaceNet, Schroff et al. 2015): for every 10th
    // vector (the anchor sample), the HARDEST positive (same label,
    // minimum cosine — the pair metric learning must pull together) and
    // the HARDEST negative (different label, maximum cosine — the pair
    // it must push apart), plus the margin and the violation flag
    // (negative closer than positive = the triplet a training batch
    // should contain). Scale shape: anchors broadcast against ONE narrow
    // scan (codegen'd DotQ per pair), windows partitioned by anchor;
    // everything that orders a pick is the exact int64 1e-4 cosine grain
    // with vec_id tie-break (the MMR discipline), so no float argmax can
    // flip a selection.
    "sim_triplet_mining" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), col("label"), quantize(col("embedding")).as("qe"))
        .withColumn("n2", VecMath.norm2Q(col("qe")))
        .transform(CacheScope.persisted(_))
      val anchors = e.filter(col("vec_id") % TripletEvery === 0)
        .select(col("vec_id").as("a_id"), col("label").as("a_label"),
          col("qe").as("a_qe"), col("n2").as("a_n2"))
      val scored = e.join(broadcast(anchors), col("vec_id") =!= col("a_id"))
        .select(col("a_id"), col("a_label"), col("vec_id").as("c_id"),
          col("label").as("c_label"),
          round(VecMath.cosine(VecMath.dotQ(col("a_qe"), col("qe")),
            col("a_n2"), col("n2")) * 10000, 0).cast("long").as("rel"))
        .transform(CacheScope.persisted(_))
      val wp = Window.partitionBy("a_id").orderBy(col("rel").asc, col("c_id").asc)
      val wn = Window.partitionBy("a_id").orderBy(col("rel").desc, col("c_id").asc)
      val pos = scored.filter(col("c_label") === col("a_label"))
        .withColumn("rn", row_number().over(wp)).filter(col("rn") === 1)
        .select(col("a_id"), col("a_label").as("label"),
          col("c_id").as("pos_id"),
          (col("rel").cast("double") / 10000.0).as("pos_cos"))
      val neg = scored.filter(col("c_label") =!= col("a_label"))
        .withColumn("rn", row_number().over(wn)).filter(col("rn") === 1)
        .select(col("a_id").as("a2"), col("c_id").as("neg_id"),
          (col("rel").cast("double") / 10000.0).as("neg_cos"))
      pos.join(neg, col("a_id") === col("a2"))
        .select(col("a_id").as("anchor_id"), col("label"), col("pos_id"),
          col("pos_cos"), col("neg_id"), col("neg_cos"),
          round(col("pos_cos") - col("neg_cos"), 4).as("margin"),
          when(col("neg_cos") >= col("pos_cos"), 1).otherwise(0)
            .as("violation"))
    }))

  /** Unrolled oracle: round r defines dx (distance of every vector to
    * center r) and mdr (running min distance); each center is the argmax
    * of the previous md with the same (d2 DESC, vec_id ASC) tie-break.
    */
  private lazy val kcenterOracle: String = {
    val sb = new StringBuilder
    sb ++= s"""WITH e AS (
              |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
              |         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000, 0) AS BIGINT) AS qx
              |  FROM embeddings
              |), c0 AS (SELECT min(vec_id) AS cid, CAST(0 AS BIGINT) AS cd2 FROM embeddings
              |), md0 AS (
              |  SELECT a.vec_id, sum((a.qx - b.qx) * (a.qx - b.qx)) AS d2
              |  FROM e a JOIN e b ON b.i = a.i AND b.vec_id = (SELECT cid FROM c0)
              |  GROUP BY 1
              |)""".stripMargin
    for (r <- 1 until KCenterK) {
      sb ++= s""", c$r AS (
                |  SELECT vec_id AS cid, d2 AS cd2 FROM md${r - 1}
                |  ORDER BY d2 DESC, vec_id ASC LIMIT 1
                |), dx$r AS (
                |  SELECT a.vec_id, sum((a.qx - b.qx) * (a.qx - b.qx)) AS d2
                |  FROM e a JOIN e b ON b.i = a.i AND b.vec_id = (SELECT cid FROM c$r)
                |  GROUP BY 1
                |), md$r AS (
                |  SELECT m.vec_id, least(m.d2, x.d2) AS d2
                |  FROM md${r - 1} m JOIN dx$r x USING (vec_id)
                |)""".stripMargin
    }
    sb ++= (0 until KCenterK).map { r =>
      s"""SELECT CAST($r AS BIGINT) AS sel_order, cid AS vec_id,
         |       round(CAST(cd2 AS DOUBLE) / 1e6, 6) AS radius2 FROM c$r""".stripMargin
    }.mkString("\n", "\nUNION ALL\n", "")
    sb.toString
  }

  override val oracles: Map[String, String] = Map(
    "sim_kcenter" -> kcenterOracle,

    "sim_triplet_mining" ->
      s"""WITH e AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         |         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000, 0)
         |              AS BIGINT) AS qx
         |  FROM embeddings
         |), norms AS (
         |  SELECT vec_id, CAST(sum(qx * qx) AS DOUBLE) / 1000000.0 AS norm2
         |  FROM e GROUP BY 1
         |), lab AS (SELECT vec_id, label FROM embeddings),
         |dots AS (
         |  SELECT a.vec_id AS a_id, c.vec_id AS c_id,
         |         CAST(sum(a.qx * c.qx) AS DOUBLE) / 1000000.0 AS dot
         |  FROM e a JOIN e c ON c.i = a.i AND a.vec_id % $TripletEvery = 0
         |                   AND c.vec_id <> a.vec_id
         |  GROUP BY 1, 2
         |), scored AS (
         |  SELECT d.a_id, la.label AS a_label, d.c_id, lc.label AS c_label,
         |         CAST(round(d.dot / (sqrt(na.norm2) * sqrt(nc.norm2)) *
         |                    10000, 0) AS BIGINT) AS rel
         |  FROM dots d
         |  JOIN norms na ON na.vec_id = d.a_id
         |  JOIN norms nc ON nc.vec_id = d.c_id
         |  JOIN lab la ON la.vec_id = d.a_id
         |  JOIN lab lc ON lc.vec_id = d.c_id
         |), pos AS (
         |  SELECT a_id, a_label AS label, c_id AS pos_id,
         |         CAST(rel AS DOUBLE) / 10000.0 AS pos_cos
         |  FROM (SELECT *, row_number() OVER (PARTITION BY a_id
         |          ORDER BY rel ASC, c_id ASC) AS rn
         |        FROM scored WHERE c_label = a_label) WHERE rn = 1
         |), neg AS (
         |  SELECT a_id, c_id AS neg_id,
         |         CAST(rel AS DOUBLE) / 10000.0 AS neg_cos
         |  FROM (SELECT *, row_number() OVER (PARTITION BY a_id
         |          ORDER BY rel DESC, c_id ASC) AS rn
         |        FROM scored WHERE c_label <> a_label) WHERE rn = 1
         |)
         |SELECT p.a_id AS anchor_id, p.label, p.pos_id, p.pos_cos,
         |       n.neg_id, n.neg_cos,
         |       round(p.pos_cos - n.neg_cos, 4) AS margin,
         |       CASE WHEN n.neg_cos >= p.pos_cos THEN 1 ELSE 0 END AS violation
         |FROM pos p JOIN neg n ON n.a_id = p.a_id""".stripMargin)
}
