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

    // IVF (inverted-file) ANN — the full train/assign/probe structure,
    // with a REAL Lloyd iteration for training:
    //   init:    K coarse centroids = per-label mean vectors, kept as
    //            EXACT integer (sum, count) pairs in long format
    //            (cell, i, s) so both engines compute identical distances;
    //   train:   assign every vector to its nearest centroid (argmin of
    //            -2·v·s/n + ss/n², the rank-equivalent expansion of
    //            ||v - s/n||²; ties by cell id), then RECOMPUTE centroids
    //            as the exact means of the assigned cells — one full
    //            k-means step, data-driven, not the vector's own label;
    //   assign:  final argmin against the refined centroids;
    //   probe:   queries search their nprobe=2 nearest cells; candidates
    //            are an equi-join on cell id; exact cosine re-rank, top-3.
    // Scale: each assignment is the textbook O(n·d·K) pass as two shuffled
    // aggregations + a broadcast of the K·d centroid table; candidates per
    // query are ~2/K of the collection. At cluster scale the cell id is
    // the bucketing key, same as every other family here. Exactness bound:
    // the double conversions stay exact while n·d·(1000·|x|max)² < 2^53.
    "sim_ann_ivf" -> ((s, d) => {
      import graft.CacheScope.persisted
      val e = persisted(emb(s, d))
      // the n×d training relation feeds every centroid/assignment pass
      val ex = persisted(e.select(col("vec_id"), col("label"),
        posexplode(col("qe")).as(Seq("i", "qx"))))

      /** Rank-equivalent squared distance of every vector to every
        * centroid. cent: (cell, i, s) exact sums; cnt: (cell, n).
        */
      def distances(cent: DataFrame, cnt: DataFrame): DataFrame = {
        val cm = cent.groupBy("cell").agg(sum(col("s") * col("s")).as("ss"))
          .join(cnt, Seq("cell"))
        val vs = ex.join(broadcast(cent), Seq("i"))
          .groupBy(col("vec_id").as("vid"), col("cell"))
          .agg(sum(col("qx") * col("s")).as("vs"))
        vs.join(broadcast(cm), Seq("cell"))
          .select(col("vid"), col("cell"),
            ((lit(-2.0) * col("vs")) / col("n") +
              col("ss").cast("double") / (col("n") * col("n"))).as("dd"))
      }
      def ranked(dist: DataFrame, k: Int): DataFrame = {
        val w = Window.partitionBy("vid").orderBy(col("dd").asc, col("cell").asc)
        dist.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      }

      // init: label means
      val cent0 = ex.groupBy(col("label").as("cell"), col("i")).agg(sum("qx").as("s"))
      val cnt0 = e.groupBy(col("label").as("cell")).agg(count(lit(1)).as("n"))
      // Lloyd step: assign, then exact means of the assigned cells
      val assign0 = persisted(ranked(distances(cent0, cnt0), 1)
        .select(col("vid"), col("cell")))
      val cent1 = ex.join(assign0, ex("vec_id") === assign0("vid"))
        .groupBy(col("cell"), col("i")).agg(sum("qx").as("s"))
      val cnt1 = assign0.groupBy("cell").agg(count(lit(1)).as("n"))
      // final assignment against refined centroids; one window serves both
      // the collection cells (rn=1) and the query probes (rn<=2)
      val r1 = persisted(ranked(distances(cent1, cnt1), 2))
      val cellAll = r1.filter(col("rn") === 1).select(col("vid"), col("cell"))
      val cellQ = r1.filter(col("vid") < NQueries)
        .select(col("vid").as("q_vid"), col("cell").as("q_cell"))
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
      s"""$eCte, cent0 AS (
         |  SELECT label AS cell, i, sum(qx) AS s FROM e GROUP BY 1, 2
         |), cnt0 AS (
         |  SELECT label AS cell, count(DISTINCT vec_id) AS n FROM e GROUP BY 1
         |), cm0 AS (
         |  SELECT c.cell, sum(c.s * c.s) AS ss, any_value(n.n) AS n
         |  FROM cent0 c JOIN cnt0 n ON n.cell = c.cell GROUP BY c.cell
         |), vs0 AS (
         |  SELECT e.vec_id AS vid, c.cell, sum(e.qx * c.s) AS vs
         |  FROM e JOIN cent0 c ON c.i = e.i GROUP BY 1, 2
         |), dist0 AS (
         |  SELECT vs0.vid, vs0.cell,
         |         (-2.0 * vs0.vs) / cm0.n + CAST(cm0.ss AS DOUBLE) / (cm0.n * cm0.n) AS dd
         |  FROM vs0 JOIN cm0 ON cm0.cell = vs0.cell
         |), assign0 AS (
         |  SELECT vid, cell FROM (
         |    SELECT vid, cell,
         |           row_number() OVER (PARTITION BY vid
         |                              ORDER BY dd ASC, cell ASC) AS rn
         |    FROM dist0
         |  ) WHERE rn = 1
         |), cent1 AS (
         |  SELECT a.cell, e.i, sum(e.qx) AS s
         |  FROM e JOIN assign0 a ON a.vid = e.vec_id GROUP BY 1, 2
         |), cnt1 AS (
         |  SELECT cell, count(*) AS n FROM assign0 GROUP BY cell
         |), cm1 AS (
         |  SELECT c.cell, sum(c.s * c.s) AS ss, any_value(n.n) AS n
         |  FROM cent1 c JOIN cnt1 n ON n.cell = c.cell GROUP BY c.cell
         |), vs1 AS (
         |  SELECT e.vec_id AS vid, c.cell, sum(e.qx * c.s) AS vs
         |  FROM e JOIN cent1 c ON c.i = e.i GROUP BY 1, 2
         |), dist1 AS (
         |  SELECT vs1.vid, vs1.cell,
         |         (-2.0 * vs1.vs) / cm1.n + CAST(cm1.ss AS DOUBLE) / (cm1.n * cm1.n) AS dd
         |  FROM vs1 JOIN cm1 ON cm1.cell = vs1.cell
         |), ranked1 AS (
         |  SELECT vid, cell,
         |         row_number() OVER (PARTITION BY vid
         |                            ORDER BY dd ASC, cell ASC) AS rn
         |  FROM dist1
         |), cellall AS (
         |  SELECT vid, cell FROM ranked1 WHERE rn = 1
         |), cellq AS (
         |  SELECT vid AS q_vid, cell FROM ranked1
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
