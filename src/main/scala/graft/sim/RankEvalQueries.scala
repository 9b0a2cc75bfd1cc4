package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}
import VecMath.{cosine, dotQ, norm2Q, quantize}

/** Retrieval-quality metrics over the exact-cosine ranking — the IR eval
  * suite next to [[graft.text.EvalQueries]]'s classifier metrics: NDCG@k
  * (graded position-discounted gain), MRR (how deep is the first hit),
  * and precision@k. Relevance is label agreement between query and
  * neighbor — the sim_ann_recall convention, so the same ranking that
  * the ANN family approximates is what gets scored here.
  *
  * Determinism: ranks come from the (cos-grain desc, id asc) row_number
  * the knn family already pins; position weights 1/log2(i+1) are
  * round(,9)-pinned identical-operand doubles decimal-summed per query;
  * every count is exact. Scale shape: one broadcast-query scan (the
  * sim_knn_bruteforce plan) then |queries|-bounded window + aggregation.
  */
object RankEvalQueries extends QueryPack {

  /** Ranking depth scored by all three metrics. */
  val RankK = 10

  private def ranked(s: SparkSession, d: String): DataFrame = {
    val e = Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("label"), quantize(col("embedding")).as("qe"))
      .withColumn("norm2", norm2Q(col("qe")))
    val q = e.filter(col("vec_id") < 10)
      .select(col("vec_id").as("q_id"), col("label").as("q_label"),
        col("qe").as("q_qe"), col("norm2").as("q_norm2"))
    val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .select(col("q_id"), col("vec_id").as("n_id"),
        round(cosine(dotQ(col("q_qe"), col("qe")),
          col("q_norm2"), col("norm2")), 4).as("cos"),
        when(col("label") === col("q_label"), 1L).otherwise(0L).as("rel"))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("cos").desc, col("n_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= RankK)
  }

  /** The shared ranked-top-k CTE (the knnOracle construction + label
    * relevance), closed by a `ranked` relation of
    * (q_id, n_id, cos, rel, rnk).
    */
  private val RankedCte: String =
    s"""WITH e AS (
       |  SELECT vec_id, label,
       |         list_transform(embedding,
       |           x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qe
       |  FROM embeddings
       |), ex AS (
       |  SELECT vec_id, label, unnest(qe) AS qx,
       |         unnest(generate_series(1, len(qe))) AS i
       |  FROM e
       |), norms AS (
       |  SELECT vec_id, CAST(sum(qx * qx) AS DOUBLE) / 1000000.0 AS norm2
       |  FROM ex GROUP BY 1
       |), dots AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |         CAST(sum(q.qx * c.qx) AS DOUBLE) / 1000000.0 AS dot
       |  FROM ex q JOIN ex c ON q.i = c.i AND q.vec_id < 10
       |                     AND c.vec_id <> q.vec_id
       |  GROUP BY 1, 2
       |), lab AS (SELECT vec_id, label FROM e),
       |scored AS (
       |  SELECT d.q_id, d.n_id,
       |         round(d.dot / (sqrt(nq.norm2) * sqrt(nc.norm2)), 4) AS cos,
       |         CASE WHEN lc.label = lq.label THEN 1 ELSE 0 END AS rel
       |  FROM dots d
       |  JOIN norms nq ON nq.vec_id = d.q_id
       |  JOIN norms nc ON nc.vec_id = d.n_id
       |  JOIN lab lq ON lq.vec_id = d.q_id
       |  JOIN lab lc ON lc.vec_id = d.n_id
       |), ranked AS (
       |  SELECT q_id, n_id, cos, rel, rnk FROM (
       |    SELECT q_id, n_id, cos, rel,
       |           row_number() OVER (PARTITION BY q_id
       |                              ORDER BY cos DESC, n_id ASC) AS rnk
       |    FROM scored
       |  ) WHERE rnk <= $RankK
       |)""".stripMargin

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // NDCG@10 with binary label relevance: DCG = Σ rel_i/log2(i+1); the
    // ideal DCG re-ranks the RETRIEVED set (the self-contained
    // convention), i.e. the first R positions with R = relevant-in-top-k.
    // Position weights are pinned to 9dp before the decimal fold so a
    // log2 ulp can never flip the hash; queries with no relevant
    // neighbor score 0, not null, so row counts stay stable.
    "q_rank_ndcg" -> ((s, d) => {
      val wi = round(lit(1.0) / log2(col("rnk") + 1), 9)
      val per = ranked(s, d)
        .withColumn("w", wi.cast(DecimalType(12, 9)))
        .groupBy(col("q_id"))
        .agg(sum(col("rel")).as("n_rel"),
          sum(col("w") * col("rel")).cast("double").as("dcg0"))
      val ideal = ranked(s, d)
        .withColumn("w", wi.cast(DecimalType(12, 9)))
        .join(per.select(col("q_id").as("q2"), col("n_rel")),
          col("q_id") === col("q2"))
        .filter(col("rnk") <= col("n_rel"))
        .groupBy(col("q_id"))
        .agg(sum(col("w")).cast("double").as("idcg0"))
      per.join(ideal, Seq("q_id"), "left")
        .select(col("q_id"), col("n_rel"),
          round(col("dcg0"), 6).as("dcg"),
          round(coalesce(col("idcg0"), lit(0.0)), 6).as("idcg"),
          when(col("n_rel") > 0, round(col("dcg0") / col("idcg0"), 6))
            .otherwise(lit(0.0)).as("ndcg"))
    }),

    // Mean reciprocal rank: 1/rank of the first relevant neighbor (0 if
    // none in the top k). Exact integer rank selection, one division.
    "q_rank_mrr" -> ((s, d) =>
      ranked(s, d)
        .groupBy(col("q_id"))
        .agg(min(when(col("rel") === 1, col("rnk"))).as("first_rel"),
          sum(col("rel")).as("n_rel"))
        .select(col("q_id"), col("n_rel"),
          coalesce(col("first_rel"), lit(0)).as("first_rel"),
          when(col("first_rel").isNotNull,
            round(lit(1.0) / col("first_rel"), 6)).otherwise(lit(0.0))
            .as("rr"))),

    // Precision at 5 and 10 — the blunt coverage metric next to NDCG's
    // graded one. Exact counts, two divisions.
    "q_rank_precision" -> ((s, d) =>
      ranked(s, d)
        .groupBy(col("q_id"))
        .agg(sum(when(col("rnk") <= 5, col("rel")).otherwise(0L)).as("rel5"),
          sum(col("rel")).as("rel10"))
        .select(col("q_id"), col("rel5"), col("rel10"),
          round(col("rel5").cast("double") / 5.0, 6).as("p_at_5"),
          round(col("rel10").cast("double") / RankK.toDouble, 6).as("p_at_10"))),

    // Reciprocal rank fusion of two retrieval signals — the hybrid-search
    // combiner: the normalized cosine ranking and the raw dot-product
    // ranking (they disagree exactly where vector norms differ, the same
    // tension as lexical-vs-semantic lists) fuse as Σ 1/(K + rank_r),
    // K=[[RrfKConst]]. Rank 0 encodes "absent from that list" so the
    // output carries no NULLs; fusion terms are round(,9)-pinned decimal
    // adds, and the fused ordering ties-break on n_id — fully
    // deterministic. Scale: the same one broadcast-query scan as the
    // rest of the family, then three windows over per-query bounded
    // candidate lists.
    "q_rank_rrf" -> ((s, d) => {
      val e = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), quantize(col("embedding")).as("qe"))
        .withColumn("norm2", norm2Q(col("qe")))
      val q = e.filter(col("vec_id") < 10)
        .select(col("vec_id").as("q_id"), col("qe").as("q_qe"),
          col("norm2").as("q_norm2"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          dotQ(col("q_qe"), col("qe")).as("doti"),
          round(cosine(dotQ(col("q_qe"), col("qe")),
            col("q_norm2"), col("norm2")), 4).as("cos"))
      val wc = Window.partitionBy("q_id").orderBy(col("cos").desc, col("n_id").asc)
      val wd = Window.partitionBy("q_id").orderBy(col("doti").desc, col("n_id").asc)
      val both = scored
        .withColumn("rc", row_number().over(wc))
        .withColumn("rd", row_number().over(wd))
        .filter(col("rc") <= RankK || col("rd") <= RankK)
        .select(col("q_id"), col("n_id"),
          when(col("rc") <= RankK, col("rc")).otherwise(lit(0)).as("rank_cos"),
          when(col("rd") <= RankK, col("rd")).otherwise(lit(0)).as("rank_dot"))
      val fused = both.withColumn("rrf0",
        when(col("rank_cos") > 0,
          round(lit(1.0) / (lit(RrfKConst) + col("rank_cos")), 9))
          .otherwise(lit(0.0)).cast(DecimalType(12, 9)) +
        when(col("rank_dot") > 0,
          round(lit(1.0) / (lit(RrfKConst) + col("rank_dot")), 9))
          .otherwise(lit(0.0)).cast(DecimalType(12, 9)))
      val wf = Window.partitionBy("q_id").orderBy(col("rrf0").desc, col("n_id").asc)
      fused.withColumn("fused_rank", row_number().over(wf))
        .filter(col("fused_rank") <= 5)
        .select(col("q_id"), col("fused_rank"), col("n_id"),
          col("rrf0").cast("double").as("rrf"),
          col("rank_cos"), col("rank_dot"))
    }),

    // Matryoshka truncation eval (Kusupati et al. 2022 "Matryoshka
    // Representation Learning"): how much top-5 recall survives when the
    // index stores only the first 8 / 16 of 64 dimensions? THE sizing
    // question for an MRL-trained embedding deployment — prefix dims cut
    // index bytes linearly, this measures what they cost. Each prefix
    // ranking is the same broadcast-query narrow scan on SLICED quantized
    // vectors (prefix dots and norms are exact int64 like the full ones;
    // the 1e-4 cosine grain + n_id tie-break pins every rank), compared
    // against the full-dimension exact top-5 by a set join.
    "sim_mrl_recall" -> ((s, d) => {
      val e = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), quantize(col("embedding")).as("qe"))
        .transform(graft.CacheScope.persisted(_))
      def topk(p: Int): DataFrame = {
        val ep = e.select(col("vec_id"),
          (if (p == 0) col("qe") else slice(col("qe"), 1, p)).as("qp"))
          .withColumn("n2", norm2Q(col("qp")))
        val q = ep.filter(col("vec_id") < 10)
          .select(col("vec_id").as("q_id"), col("qp").as("q_qp"),
            col("n2").as("q_n2"))
        val w = Window.partitionBy("q_id")
          .orderBy(col("rel").desc, col("n_id").asc)
        ep.join(broadcast(q), col("vec_id") =!= col("q_id"))
          .select(col("q_id"), col("vec_id").as("n_id"),
            round(cosine(dotQ(col("q_qp"), col("qp")),
              col("q_n2"), col("n2")) * 10000, 0).cast("long").as("rel"))
          .withColumn("rnk", row_number().over(w))
          .filter(col("rnk") <= MrlK)
          .select(col("q_id"), col("n_id"))
      }
      val exact = topk(0).transform(graft.CacheScope.persisted(_))
      def recallOf(p: Int): DataFrame = {
        val hits = exact.join(topk(p), Seq("q_id", "n_id"), "left_semi")
          .agg(count(lit(1)).as("n_hits"))
        exact.agg(count(lit(1)).as("n_exact"))
          .crossJoin(broadcast(hits))
          .select(lit(p.toLong).as("prefix_dims"), col("n_exact"),
            col("n_hits"),
            round(col("n_hits").cast("double") /
              col("n_exact").cast("double"), 6).as("recall"))
      }
      MrlPrefixes.map(recallOf).reduce(_.unionByName(_))
        .orderBy("prefix_dims")
    }))

  /** RRF smoothing constant (the standard 60 from the original paper). */
  val RrfKConst = 60

  /** Matryoshka eval dials: prefix widths scored and the top-k depth. */
  val MrlPrefixes: Seq[Int] = Seq(8, 16)
  val MrlK = 5

  /** One prefix-truncated top-[[MrlK]] ranking as a CTE pair
    * (`nrm_T`/`top_T` with tag T), p = 0 meaning all dimensions — the
    * SQL twin of the Spark `topk` closure.
    */
  private def mrlTopCte(tag: String, p: Int): String = {
    val dimFilter = if (p == 0) "" else s" WHERE i <= $p"
    val dimJoin = if (p == 0) "" else s" AND q.i <= $p"
    s"""nrm_$tag AS (
       |  SELECT vec_id, CAST(sum(qx * qx) AS DOUBLE) / 1000000.0 AS n2
       |  FROM ex$dimFilter GROUP BY 1
       |), dot_$tag AS (
       |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
       |         CAST(sum(q.qx * c.qx) AS DOUBLE) / 1000000.0 AS dot
       |  FROM ex q JOIN ex c ON q.i = c.i AND q.vec_id < 10
       |                     AND c.vec_id <> q.vec_id$dimJoin
       |  GROUP BY 1, 2
       |), top_$tag AS (
       |  SELECT q_id, n_id FROM (
       |    SELECT d.q_id, d.n_id,
       |           row_number() OVER (PARTITION BY d.q_id ORDER BY
       |             CAST(round(d.dot / (sqrt(nq.n2) * sqrt(nc.n2)) * 10000,
       |                        0) AS BIGINT) DESC, d.n_id ASC) AS rnk
       |    FROM dot_$tag d
       |    JOIN nrm_$tag nq ON nq.vec_id = d.q_id
       |    JOIN nrm_$tag nc ON nc.vec_id = d.n_id
       |  ) WHERE rnk <= $MrlK
       |)""".stripMargin
  }

  private lazy val mrlOracle: String = {
    val pref = MrlPrefixes.map(p => mrlTopCte(s"p$p", p)).mkString(",\n")
    val rows = MrlPrefixes.map { p =>
      s"""SELECT CAST($p AS BIGINT) AS prefix_dims,
         |       (SELECT count(*) FROM top_full) AS n_exact,
         |       (SELECT count(*) FROM top_p$p t
         |        WHERE EXISTS (SELECT 1 FROM top_full f
         |                      WHERE f.q_id = t.q_id AND f.n_id = t.n_id))
         |         AS n_hits""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH e AS (
       |  SELECT vec_id,
       |         list_transform(embedding,
       |           x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qe
       |  FROM embeddings
       |), ex AS (
       |  SELECT vec_id, unnest(qe) AS qx,
       |         unnest(generate_series(1, len(qe))) AS i
       |  FROM e
       |), ${mrlTopCte("full", 0)},
       |$pref
       |SELECT prefix_dims, n_exact, n_hits,
       |       round(CAST(n_hits AS DOUBLE) / CAST(n_exact AS DOUBLE), 6)
       |         AS recall
       |FROM ($rows)
       |ORDER BY prefix_dims""".stripMargin
  }

  override val oracles: Map[String, String] = Map(

    "sim_mrl_recall" -> mrlOracle,

    "q_rank_rrf" ->
      s"""WITH e AS (
         |  SELECT vec_id,
         |         list_transform(embedding,
         |           x -> CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qe
         |  FROM embeddings
         |), ex AS (
         |  SELECT vec_id, unnest(qe) AS qx,
         |         unnest(generate_series(1, len(qe))) AS i
         |  FROM e
         |), norms AS (
         |  SELECT vec_id, CAST(sum(qx * qx) AS DOUBLE) / 1000000.0 AS norm2
         |  FROM ex GROUP BY 1
         |), dots AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         CAST(sum(q.qx * c.qx) AS DOUBLE) / 1000000.0 AS dot
         |  FROM ex q JOIN ex c ON q.i = c.i AND q.vec_id < 10
         |                     AND c.vec_id <> q.vec_id
         |  GROUP BY 1, 2
         |), sc AS (
         |  SELECT d.q_id, d.n_id, d.dot,
         |         round(d.dot / (sqrt(nq.norm2) * sqrt(nc.norm2)), 4) AS cos
         |  FROM dots d
         |  JOIN norms nq ON nq.vec_id = d.q_id
         |  JOIN norms nc ON nc.vec_id = d.n_id
         |), rk AS (
         |  SELECT q_id, n_id,
         |         row_number() OVER (PARTITION BY q_id
         |                            ORDER BY cos DESC, n_id ASC) AS rc,
         |         row_number() OVER (PARTITION BY q_id
         |                            ORDER BY dot DESC, n_id ASC) AS rd
         |  FROM sc
         |), bothr AS (
         |  SELECT q_id, n_id,
         |         CAST(CASE WHEN rc <= $RankK THEN rc ELSE 0 END AS INT) AS rank_cos,
         |         CAST(CASE WHEN rd <= $RankK THEN rd ELSE 0 END AS INT) AS rank_dot
         |  FROM rk WHERE rc <= $RankK OR rd <= $RankK
         |), fused AS (
         |  SELECT q_id, n_id, rank_cos, rank_dot,
         |         CAST(CASE WHEN rank_cos > 0
         |              THEN round(1.0 / ($RrfKConst + rank_cos), 9) ELSE 0.0 END
         |              AS DECIMAL(12,9)) +
         |         CAST(CASE WHEN rank_dot > 0
         |              THEN round(1.0 / ($RrfKConst + rank_dot), 9) ELSE 0.0 END
         |              AS DECIMAL(12,9)) AS rrf0
         |  FROM bothr
         |), fr AS (
         |  SELECT q_id, n_id, rank_cos, rank_dot, rrf0,
         |         row_number() OVER (PARTITION BY q_id
         |                            ORDER BY rrf0 DESC, n_id ASC) AS fused_rank
         |  FROM fused
         |)
         |SELECT q_id, CAST(fused_rank AS INT) AS fused_rank, n_id,
         |       CAST(rrf0 AS DOUBLE) AS rrf, rank_cos, rank_dot
         |FROM fr WHERE fused_rank <= 5""".stripMargin,

    "q_rank_ndcg" ->
      s"""$RankedCte,
         |per AS (
         |  SELECT q_id, CAST(sum(rel) AS BIGINT) AS n_rel,
         |         CAST(sum(CAST(round(1.0 / log2(rnk + 1), 9) AS DECIMAL(12,9)) * rel) AS DOUBLE) AS dcg0
         |  FROM ranked GROUP BY 1
         |), ideal AS (
         |  SELECT r.q_id,
         |         CAST(sum(CAST(round(1.0 / log2(r.rnk + 1), 9) AS DECIMAL(12,9))) AS DOUBLE) AS idcg0
         |  FROM ranked r JOIN per p ON p.q_id = r.q_id
         |  WHERE r.rnk <= p.n_rel GROUP BY 1
         |)
         |SELECT p.q_id, p.n_rel,
         |       round(p.dcg0, 6) AS dcg,
         |       round(coalesce(i.idcg0, 0.0), 6) AS idcg,
         |       CASE WHEN p.n_rel > 0 THEN round(p.dcg0 / i.idcg0, 6)
         |            ELSE 0.0 END AS ndcg
         |FROM per p LEFT JOIN ideal i ON i.q_id = p.q_id""".stripMargin,

    "q_rank_mrr" ->
      s"""$RankedCte
         |SELECT q_id, CAST(sum(rel) AS BIGINT) AS n_rel,
         |       CAST(coalesce(min(CASE WHEN rel = 1 THEN rnk END), 0) AS INT) AS first_rel,
         |       CASE WHEN min(CASE WHEN rel = 1 THEN rnk END) IS NOT NULL
         |            THEN round(1.0 / min(CASE WHEN rel = 1 THEN rnk END), 6)
         |            ELSE 0.0 END AS rr
         |FROM ranked GROUP BY q_id""".stripMargin,

    "q_rank_precision" ->
      s"""$RankedCte
         |SELECT q_id,
         |       CAST(sum(CASE WHEN rnk <= 5 THEN rel ELSE 0 END) AS BIGINT) AS rel5,
         |       CAST(sum(rel) AS BIGINT) AS rel10,
         |       round(CAST(sum(CASE WHEN rnk <= 5 THEN rel ELSE 0 END) AS DOUBLE) / 5.0, 6) AS p_at_5,
         |       round(CAST(sum(rel) AS DOUBLE) / ${RankK.toDouble}, 6) AS p_at_10
         |FROM ranked GROUP BY q_id""".stripMargin)
}
