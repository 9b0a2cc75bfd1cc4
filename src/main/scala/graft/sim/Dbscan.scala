package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.CacheScope.persisted

/** Grid-blocked DBSCAN (Ester/Kriegel/Sander/Xu, KDD 1996) over a 2-D
  * slice of the embedding space — the density clustering that finds
  * arbitrarily-shaped groups and labels sparse points as noise, where
  * k-means-style methods force every point into a ball.
  *
  * Distributed shape: the classic all-pairs eps-neighborhood is replaced
  * by the GRID equi-join — quantize both coordinates, key each point by
  * its (eps-sized) cell, explode the LEFT side to its 3x3 neighbor cells,
  * and equi-join on the cell key; a pair within eps ALWAYS lands in
  * adjacent cells, so the join is exact, and its fan-out is bounded by
  * local density (9 cells x eps-ball occupancy), never by n². This is the
  * same blocking discipline as the dedup candidate generators (LSH bands,
  * simhash blocks): candidates come from an equi-join on a bucketing key,
  * verification touches candidates only. A pathologically dense cell is
  * the skew knob (salt the cell key or cap per-cell occupancy — the
  * standard fix, not needed at bench SF).
  *
  * Core/border/noise and determinism:
  *   - core:   >= minPts-1 neighbors within eps (minPts counts the point
  *             itself, the textbook convention).
  *   - labels: connected components of the core-core eps-graph via
  *             [[graft.dedup.DedupClusters]] (cluster_id = component-min
  *             vec_id — canonical, not traversal-order-dependent like the
  *             original sequential algorithm).
  *   - border: non-core with >= 1 core neighbor, assigned min(cluster_id)
  *             over its core neighbors — the one place textbook DBSCAN is
  *             visit-order-dependent, pinned here to the deterministic
  *             minimum.
  *   - noise:  everything else; excluded from the output.
  *
  * All geometry is exact integer math on quantized coordinates (round to
  * [[Params.scale]] units once, then integer squares), so both engines
  * compare identical values; the positive OFFSET before cell division
  * makes Spark's truncating `div` agree with floor division on negative
  * coordinates.
  */
object Dbscan {

  /** @param dimA/dimB 0-based embedding dims forming the plane
    * @param scale     quantization units per 1.0 of embedding value
    * @param eps       neighborhood radius in QUANTIZED units
    * @param minPts    minimum eps-ball occupancy (incl. the point itself)
    *                  for core status
    */
  final case class Params(dimA: Int, dimB: Int, scale: Long, eps: Long, minPts: Int)

  val Default: Params = Params(dimA = 0, dimB = 1, scale = 1000L, eps = 30L, minPts = 5)

  /** Keeps every quantized coordinate positive before the cell division
    * (embedding values are normalized, so |q| << OFF at any real scale).
    */
  val Off = 1L << 40

  /** (vec_id, embedding) -> (vec_id, role, cluster_id); noise dropped. */
  def cluster(emb: DataFrame, p: Params): DataFrame = {
    val q = (i: Int) => round(element_at(col("embedding"), i + 1).cast("double") *
      p.scale, 0).cast("long")
    val pts = emb.select(col("vec_id").as("id"),
        q(p.dimA).as("qx"), q(p.dimB).as("qy"))
      .select(col("id"), col("qx"), col("qy"),
        expr(s"(qx + ${Off}L) div ${p.eps}").as("cx"),
        expr(s"(qy + ${Off}L) div ${p.eps}").as("cy"))
      .transform(persisted(_))
    val offsets = array((for (dx <- -1 to 1; dy <- -1 to 1)
      yield struct(lit(dx).as("dx"), lit(dy).as("dy"))): _*)
    val probes = pts.select(col("id").as("ia"), col("qx").as("ax"),
        col("qy").as("ay"), explode(offsets).as("o"),
        col("cx"), col("cy"))
      .select(col("ia"), col("ax"), col("ay"),
        (col("cx") + col("o.dx")).as("pcx"), (col("cy") + col("o.dy")).as("pcy"))
    val prs = probes.join(pts,
        col("pcx") === col("cx") && col("pcy") === col("cy") &&
          col("ia") =!= col("id"))
      .filter((col("ax") - col("qx")) * (col("ax") - col("qx")) +
        (col("ay") - col("qy")) * (col("ay") - col("qy")) <= p.eps * p.eps)
      .select(col("ia"), col("id").as("ib"))
      .transform(persisted(_))
    val core = prs.groupBy(col("ia")).agg(count(lit(1)).as("nn"))
      .filter(col("nn") >= p.minPts - 1)
      .select(col("ia").as("id"))
      .transform(persisted(_))
    val corePairs = prs
      .join(core.select(col("id").as("ca")), col("ia") === col("ca"), "left_semi")
      .join(core.select(col("id").as("cb")), col("ib") === col("cb"), "left_semi")
      .filter(col("ia") < col("ib"))
      .select(col("ia").as("doc_a"), col("ib").as("doc_b"))
    val lbl = graft.dedup.DedupClusters
      .clusters(corePairs, core.select(col("id").as("doc_id")))
      .select(col("doc_id").as("id"), col("cluster_id"))
      .transform(persisted(_))
    val border = prs
      .join(core.select(col("id").as("nc")), col("ia") === col("nc"), "left_anti")
      .join(lbl.select(col("id").as("ib"), col("cluster_id")), "ib")
      .groupBy(col("ia")).agg(min(col("cluster_id")).as("cluster_id"))
      .select(col("ia").as("id"), col("cluster_id"))
    lbl.select(col("id").as("vec_id"), lit("core").as("role"), col("cluster_id"))
      .unionByName(border.select(col("id").as("vec_id"),
        lit("border").as("role"), col("cluster_id")))
  }

  /** DuckDB twin: BETWEEN-join on cells (range join — DuckDB-local
    * convenience; the Spark side's 9-offset explode is the distributed
    * formulation), recursive reachability for the core components.
    */
  def oracleSql(p: Params): String =
    s"""WITH RECURSIVE pts AS (
       |  SELECT vec_id AS id,
       |         CAST(round(CAST(embedding[${p.dimA + 1}] AS DOUBLE) * ${p.scale}, 0) AS BIGINT) AS qx,
       |         CAST(round(CAST(embedding[${p.dimB + 1}] AS DOUBLE) * ${p.scale}, 0) AS BIGINT) AS qy
       |  FROM embeddings
       |), cells AS (
       |  SELECT id, qx, qy, (qx + ${Off}) // ${p.eps} AS cx, (qy + ${Off}) // ${p.eps} AS cy
       |  FROM pts
       |), prs AS (
       |  SELECT a.id AS ia, b.id AS ib
       |  FROM cells a JOIN cells b
       |    ON b.cx BETWEEN a.cx - 1 AND a.cx + 1
       |   AND b.cy BETWEEN a.cy - 1 AND a.cy + 1
       |   AND a.id <> b.id
       |  WHERE (a.qx - b.qx) * (a.qx - b.qx) +
       |        (a.qy - b.qy) * (a.qy - b.qy) <= ${p.eps * p.eps}
       |), core AS (
       |  SELECT ia AS id FROM prs GROUP BY ia HAVING count(*) >= ${p.minPts - 1}
       |), ce AS (
       |  SELECT p.ia AS src, p.ib AS dst
       |  FROM prs p
       |  JOIN core a ON a.id = p.ia
       |  JOIN core b ON b.id = p.ib
       |), reach(id, r) AS (
       |  SELECT src, src FROM ce
       |  UNION
       |  SELECT e.src, reach.r FROM ce e JOIN reach ON reach.id = e.dst
       |), lbl AS (
       |  SELECT c.id, COALESCE(m.cid, c.id) AS cluster_id
       |  FROM core c
       |  LEFT JOIN (SELECT id, min(r) AS cid FROM reach GROUP BY id) m
       |    ON m.id = c.id
       |), bord AS (
       |  SELECT p.ia AS id, min(l.cluster_id) AS cluster_id
       |  FROM prs p
       |  JOIN lbl l ON l.id = p.ib
       |  LEFT JOIN core c ON c.id = p.ia
       |  WHERE c.id IS NULL
       |  GROUP BY p.ia
       |)
       |SELECT id AS vec_id, 'core' AS role, cluster_id FROM lbl
       |UNION ALL
       |SELECT id AS vec_id, 'border' AS role, cluster_id FROM bord""".stripMargin
}
