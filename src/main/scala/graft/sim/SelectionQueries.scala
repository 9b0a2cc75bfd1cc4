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
    "sim_kcenter" -> kcenterOracle)
}
