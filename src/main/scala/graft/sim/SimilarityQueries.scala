package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Similarity search over `embeddings.embedding` (BASELINE.json north star):
  *
  *   sim_knn_bruteforce — exact cosine top-k: broadcast the (small) query
  *       set against the full collection; the dot product is array-local
  *       (VecMath), so the physical plan is broadcast-join -> narrow map ->
  *       per-query top-k (window over q_id). At 100 TB this is the exact
  *       baseline: one scan, no wide shuffle except the final tiny top-k.
  *
  *   sim_ann_lsh — the scale path: an 8-bit sign-pattern (hyperplane LSH)
  *       bucket computed per vector; candidates are only same-bucket rows
  *       (expected 1/256 of the collection per query), then exact re-rank.
  *       On a cluster the bucket is the shuffle/bucketing key, turning ANN
  *       into an equi-join — the same join machinery as everything else.
  */
object SimilarityQueries extends QueryPack {

  import VecMath._

  private def emb(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding"),
        quantize(col("embedding")).as("qe"))
      .select(col("vec_id"), col("label"), col("embedding"), col("qe"),
        norm2Q(col("qe")).as("norm2"))

  private val TopK = 5
  private val NQueries = 10 // vec_id < 10 are the query vectors

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "sim_knn_bruteforce" -> ((s, d) => {
      val e = emb(s, d)
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("qe").as("q_qe"),
          col("norm2").as("q_norm2"))
      val scored = e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          round(cosine(dotQ(col("q_qe"), col("qe")),
            col("q_norm2"), col("norm2")), 4).as("cos"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("n_id").asc)
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= TopK)
    }),

    "sim_ann_lsh" -> ((s, d) => {
      val e = emb(s, d).withColumn("bucket", signBucket(col("embedding")))
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("qe").as("q_qe"),
          col("norm2").as("q_norm2"), col("bucket").as("q_bucket"))
      val scored = e
        .join(broadcast(q),
          col("bucket") === col("q_bucket") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          round(cosine(dotQ(col("q_qe"), col("qe")),
            col("q_norm2"), col("norm2")), 4).as("cos"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("n_id").asc)
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
    }),

    // IVF (inverted-file) ANN — the full train/assign/probe structure:
    //   train:  K coarse centroids = per-label mean vectors, kept as EXACT
    //           integer (sum, count) pairs in long format (label, i, s) so
    //           both engines compute identical distances;
    //   assign: every vector goes to its NEAREST centroid (argmin of
    //           -2·v·s/n + ss/n², the rank-equivalent expansion of
    //           ||v - s/n||²; ties break by label) — a real quantizer
    //           assignment, NOT the vector's own label;
    //   probe:  queries search their nprobe=2 nearest cells; candidates
    //           are an equi-join on cell id; exact cosine re-rank, top-3.
    // Scale: assignment is the textbook O(n·d·K) pass as two shuffled
    // aggregations + a broadcast of the K·d centroid table; candidates per
    // query are ~2/K of the collection. At cluster scale the cell id is
    // the bucketing key, same as every other family here.
    "sim_ann_ivf" -> ((s, d) => {
      val e = emb(s, d)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ex = e.select(col("vec_id"), col("label"),
        posexplode(col("qe")).as(Seq("i", "qx")))
      val cent = ex.groupBy(col("label"), col("i"))
        .agg(sum(col("qx")).as("s"))
      val cm = cent.groupBy("label").agg(sum(col("s") * col("s")).as("ss"))
        .join(e.groupBy("label").agg(count(lit(1)).as("n")), Seq("label"))
        .select(col("label").as("clabel"), col("ss"), col("n"))
      val vs = ex.as("v")
        .join(broadcast(cent.select(col("label").as("clabel"), col("i"), col("s"))),
          Seq("i"))
        .groupBy(col("vec_id").as("vid"), col("clabel"))
        .agg(sum(col("qx") * col("s")).as("vs"))
      val dist = vs.join(broadcast(cm), Seq("clabel"))
        .select(col("vid"), col("clabel"),
          ((lit(-2.0) * col("vs")) / col("n") +
            col("ss").cast("double") / (col("n") * col("n"))).as("dd"))
      val w0 = Window.partitionBy("vid").orderBy(col("dd").asc, col("clabel").asc)
      val ranked = dist.withColumn("rn", row_number().over(w0))
      val cellAll = ranked.filter(col("rn") === 1)
        .select(col("vid"), col("clabel").as("cell"))
      val cellQ = ranked.filter(col("rn") <= 2 && col("vid") < NQueries)
        .select(col("vid").as("q_vid"), col("clabel").as("q_cell"))
      val q = e.filter(col("vec_id") < NQueries)
        .select(col("vec_id").as("q_id"), col("qe").as("q_qe"),
          col("norm2").as("q_norm2"))
        .join(cellQ, col("q_id") === col("q_vid"))
        .select(col("q_id"), col("q_qe"), col("q_norm2"), col("q_cell"))
      val scored = e.join(cellAll, e("vec_id") === cellAll("vid"))
        .join(broadcast(q),
          col("cell") === col("q_cell") && col("vec_id") =!= col("q_id"))
        .select(col("q_id"), col("vec_id").as("n_id"),
          round(cosine(dotQ(col("q_qe"), col("qe")),
            col("q_norm2"), col("norm2")), 4).as("cos"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("cos").desc, col("n_id").asc)
      scored.withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 3)
    })
  )

  /** Shared oracle CTEs: integer-quantized elements + norms (exact sums). */
  private val eCte: String =
    """WITH e AS (
      |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
      |         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000, 0) AS BIGINT) AS qx
      |  FROM embeddings
      |), norms AS (
      |  SELECT vec_id, CAST(sum(qx * qx) AS DOUBLE) / 1000000.0 AS norm2
      |  FROM e GROUP BY vec_id
      |)""".stripMargin

  override val oracles: Map[String, String] = Map(
    "sim_knn_bruteforce" ->
      s"""$eCte, dots AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         CAST(sum(q.qx * c.qx) AS DOUBLE) / 1000000.0 AS dot
         |  FROM e q JOIN e c ON q.i = c.i AND q.vec_id < $NQueries
         |                   AND c.vec_id <> q.vec_id
         |  GROUP BY 1, 2
         |), scored AS (
         |  SELECT d.q_id, d.n_id,
         |         round(d.dot / (sqrt(nq.norm2) * sqrt(nc.norm2)), 4) AS cos
         |  FROM dots d
         |  JOIN norms nq ON nq.vec_id = d.q_id
         |  JOIN norms nc ON nc.vec_id = d.n_id
         |)
         |SELECT q_id, n_id, cos, rnk FROM (
         |  SELECT q_id, n_id, cos,
         |         row_number() OVER (PARTITION BY q_id
         |                            ORDER BY cos DESC, n_id ASC) AS rnk
         |  FROM scored
         |) WHERE rnk <= $TopK""".stripMargin,

    "sim_ann_lsh" ->
      s"""$eCte, bkt AS (
         |  SELECT vec_id, ${VecMath.signBucketSql("embedding")} AS bucket
         |  FROM embeddings
         |), dots AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         CAST(sum(q.qx * c.qx) AS DOUBLE) / 1000000.0 AS dot
         |  FROM e q
         |  JOIN bkt bq ON bq.vec_id = q.vec_id
         |  JOIN bkt bc ON bc.bucket = bq.bucket
         |  JOIN e c ON c.vec_id = bc.vec_id AND c.i = q.i
         |  WHERE q.vec_id < $NQueries AND c.vec_id <> q.vec_id
         |  GROUP BY 1, 2
         |), scored AS (
         |  SELECT d.q_id, d.n_id,
         |         round(d.dot / (sqrt(nq.norm2) * sqrt(nc.norm2)), 4) AS cos
         |  FROM dots d
         |  JOIN norms nq ON nq.vec_id = d.q_id
         |  JOIN norms nc ON nc.vec_id = d.n_id
         |)
         |SELECT q_id, n_id, cos, rnk FROM (
         |  SELECT q_id, n_id, cos,
         |         row_number() OVER (PARTITION BY q_id
         |                            ORDER BY cos DESC, n_id ASC) AS rnk
         |  FROM scored
         |) WHERE rnk <= 3""".stripMargin,

    "sim_ann_ivf" ->
      s"""$eCte, cent AS (
         |  SELECT label, i, sum(qx) AS s FROM e GROUP BY label, i
         |), cm AS (
         |  SELECT c.label AS clabel, sum(c.s * c.s) AS ss, any_value(n.n) AS n
         |  FROM cent c
         |  JOIN (SELECT label, count(DISTINCT vec_id) AS n FROM e GROUP BY label) n
         |    ON n.label = c.label
         |  GROUP BY c.label
         |), vs AS (
         |  SELECT e.vec_id AS vid, c.label AS clabel, sum(e.qx * c.s) AS vs
         |  FROM e JOIN cent c ON c.i = e.i
         |  GROUP BY 1, 2
         |), dist AS (
         |  SELECT vs.vid, vs.clabel,
         |         (-2.0 * vs.vs) / cm.n + CAST(cm.ss AS DOUBLE) / (cm.n * cm.n) AS dd
         |  FROM vs JOIN cm ON cm.clabel = vs.clabel
         |), ranked AS (
         |  SELECT vid, clabel,
         |         row_number() OVER (PARTITION BY vid
         |                            ORDER BY dd ASC, clabel ASC) AS rn
         |  FROM dist
         |), cellall AS (
         |  SELECT vid, clabel AS cell FROM ranked WHERE rn = 1
         |), cellq AS (
         |  SELECT vid AS q_vid, clabel AS cell FROM ranked
         |  WHERE rn <= 2 AND vid < $NQueries
         |), dots AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         CAST(sum(q.qx * c.qx) AS DOUBLE) / 1000000.0 AS dot
         |  FROM e q
         |  JOIN cellq ON cellq.q_vid = q.vec_id
         |  JOIN cellall ON cellall.cell = cellq.cell
         |  JOIN e c ON c.vec_id = cellall.vid AND c.i = q.i
         |  WHERE c.vec_id <> q.vec_id
         |  GROUP BY 1, 2
         |), scored AS (
         |  SELECT d.q_id, d.n_id,
         |         round(d.dot / (sqrt(nq.norm2) * sqrt(nc.norm2)), 4) AS cos
         |  FROM dots d
         |  JOIN norms nq ON nq.vec_id = d.q_id
         |  JOIN norms nc ON nc.vec_id = d.n_id
         |)
         |SELECT q_id, n_id, cos, rnk FROM (
         |  SELECT q_id, n_id, cos,
         |         row_number() OVER (PARTITION BY q_id
         |                            ORDER BY cos DESC, n_id ASC) AS rnk
         |  FROM scored
         |) WHERE rnk <= 3""".stripMargin
  )
}
