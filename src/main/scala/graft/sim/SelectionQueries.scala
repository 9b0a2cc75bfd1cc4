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
  * min-distance relation updates against just the newest center (a 1-row
  * broadcast), never the whole center set, and the next center is a
  * TakeOrdered(1) argmax. Distances are exact int64 on quantized vectors
  * (d² = a·a + c·c − 2a·c via the codegen'd DotQ), so the argmax
  * tie-break (smallest vec_id) is engine-exact. Per-round relations are
  * persisted through CacheScope so the r-th pick's lineage reuses the
  * materialized (r−1)-th min-distance relation instead of re-deriving the
  * whole chain.
  */
object SelectionQueries extends QueryPack {

  import VecMath.quantize

  /** Number of centers the greedy traversal picks. */
  val KCenterK = 8

  private def d2(qa: org.apache.spark.sql.Column, sda: org.apache.spark.sql.Column,
      qc: org.apache.spark.sql.Column, sdc: org.apache.spark.sql.Column) =
    sda + sdc - lit(2L) * graft.functions.DotQ(qa, qc)

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "sim_kcenter" -> ((s, d) => {
      val e0 = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), quantize(col("embedding")).as("qe"))
        .withColumn("sd", graft.functions.DotQ(col("qe"), col("qe")))
        .transform(CacheScope.persisted(_))
      val seed = e0.orderBy(col("vec_id")).limit(1)
        .select(col("vec_id").as("cid"), col("qe").as("cqe"),
          col("sd").as("csd"), lit(0L).as("cd2"))
        .transform(CacheScope.persisted(_))
      var md = e0.crossJoin(broadcast(seed))
        .select(col("vec_id"), col("qe"), col("sd"),
          d2(col("qe"), col("sd"), col("cqe"), col("csd")).as("dm"))
        .transform(CacheScope.persisted(_))
      var picks = Vector(seed)
      for (_ <- 1 until KCenterK) {
        val c = md.orderBy(col("dm").desc, col("vec_id").asc).limit(1)
          .select(col("vec_id").as("cid"), col("qe").as("cqe"),
            col("sd").as("csd"), col("dm").as("cd2"))
          .transform(CacheScope.persisted(_))
        picks = picks :+ c
        md = md.crossJoin(broadcast(c))
          .select(col("vec_id"), col("qe"), col("sd"),
            least(col("dm"),
              d2(col("qe"), col("sd"), col("cqe"), col("csd"))).as("dm"))
          .transform(CacheScope.persisted(_))
      }
      picks.zipWithIndex.map { case (c, i) =>
        c.select(lit(i.toLong).as("sel_order"), col("cid").as("vec_id"),
          round(col("cd2").cast("double") / 1e6, 6).as("radius2"))
      }.reduce(_ unionByName _)
    }))

  /** Unrolled oracle: round r defines dr (distance of every vector to
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
