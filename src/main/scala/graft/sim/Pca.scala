package graft.sim

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.CacheScope.persisted

/** Top-principal-component projection by POWER ITERATION over the exact
  * integer scatter matrix — the embedding-hygiene operator downstream of
  * `sim_embed_covariance` (whitening, anisotropy correction, curriculum
  * ordering by the dominant semantic axis).
  *
  * Method: with q = the int64-quantized embeddings (VecMath contract,
  * scale 1000) and n = row count, the centered scatter matrix
  *
  *   A[i][j] = n·Σ q_i q_j − (Σ q_i)(Σ q_j)   ( = n² · cov · 10⁶ )
  *
  * is EXACT INTEGER and only d×d large, so the whole eigen-iteration runs
  * on a broadcast-sized relation. Two power steps b = A·(A·1) from the
  * all-ones start vector keep every coordinate an exact integer — no
  * normalization round-off to diverge cross-engine — and every sum a
  * DECIMAL(38,0) (Spark) / HUGEINT (DuckDB) fold, which is
  * order-independent, so the oracle reproduces b bit-for-bit. The only
  * floating point is the final scale-invariant output
  * pc1 = proj / max|proj| (both operands exact, conversion and division
  * IEEE-deterministic in both engines).
  *
  * Iteration depth is bounded by exact-arithmetic headroom, not cost:
  * with |q| ≤ 10³·|x|max and n rows, |A| ≤ n²·(10³·|x|max)², and two
  * steps push |b| toward d²·|A|³ — at the testdata's n≈10³..10⁴, d=64
  * that is ~10²⁷, well inside DECIMAL(38,0); at n≈10⁶ it reaches the
  * 10³⁸ ceiling, where the production path inserts an exact integer
  * RESCALE (divide b by a power of ten between steps — still
  * deterministic) rather than switching to floats.
  *
  * Scale shape (100 TB): one narrow map emits each row's d(d+1)/2
  * quantized products; partial aggregation collapses every map task to
  * ≤ d(d+1)/2 groups before the only data-sized shuffle; everything
  * after (A, b₁, b₂) is constant-size and broadcast; the projection pass
  * is a second narrow map + per-row aggregation. No collect, no window,
  * no global sort.
  */
object Pca {

  /** (vec_id, pc1) with pc1 ∈ [−1, 1]: each vector's projection onto the
    * (unnormalized) dominant eigenvector estimate, scaled by the corpus
    * max absolute projection.
    */
  def project(emb0: DataFrame): DataFrame = {
    // ONE corpus scan (r16, guide §6/§1.2): the quantized vectors are
    // pinned, and BOTH the first moments and the upper-triangle products
    // ride the SAME generator — first moments travel as sentinel entries
    // (i, -1, qx) beside the products, so moments + products cost one
    // aggregation over one pass instead of two separate corpus scans.
    // The projection pass re-reads the pinned q (narrow posexplode), not
    // the parquet. The cached relation is n×d quantized ints — strictly
    // smaller than the exploded (vec_id, i, qx) relation r15 cached.
    val q = persisted(emb0
      .select(col("vec_id"), VecMath.quantize(col("embedding")).as("qe")))
    val ex = q.select(col("vec_id"), posexplode(col("qe")).as(Seq("i", "qx")))
    val ents = q.select(explode(concat(
      flatten(transform(col("qe"), (xi, i) =>
        transform(slice(col("qe"), i + 1, size(col("qe")) - i), (xj, jj) =>
          struct(i.as("i"), (i + jj).as("j"), (xi * xj).as("p"))))),
      transform(col("qe"), (x, i) =>
        struct(i.as("i"), lit(-1).as("j"), x.as("p")))))
      .as("e"))
      .select(col("e.i").as("i"), col("e.j").as("j"), col("e.p").as("p"))
      .groupBy("i", "j").agg(sum(col("p")).as("sp"))
      .transform(persisted(_))
    val m1 = ents.filter(col("j") === -1)
      .select(col("i"), col("sp").as("s1"))
    // countDistinct, matching the oracle's COUNT(DISTINCT vec_id): a
    // row-count-derived n would diverge on duplicated vec_ids or ragged
    // vector lengths. Over the EXPLODED rows (an empty embedding must not
    // count, exactly as in the oracle's `e` CTE) — ex is a narrow
    // posexplode of the pinned q, not a corpus re-scan.
    val stats = ex.agg(countDistinct(col("vec_id")).as("n"))
    val s2u = ents.filter(col("j") >= 0)
    val s2f = s2u.unionByName(s2u.filter(col("i") =!= col("j"))
      .select(col("j").as("i"), col("i").as("j"), col("sp")))
    // A = n·sp − s1_i·s1_j, with every operand cast to DECIMAL(38,0)
    // BEFORE the multiplies (the oracle casts to HUGEINT the same way):
    // at n ~ 1e7 all-positive vectors, s1_i·s1_j passes 2^63 while the
    // VecMath 2^53 contract still holds, so an int64 product would wrap
    // silently where the decimal stays exact.
    val dec = (c: org.apache.spark.sql.Column) => c.cast(DecimalType(38, 0))
    val aMat = persisted(s2f
      .join(broadcast(m1.select(col("i").as("ia"), col("s1").as("s1a"))),
        col("i") === col("ia"))
      .join(broadcast(m1.select(col("i").as("ib"), col("s1").as("s1b"))),
        col("j") === col("ib"))
      .crossJoin(broadcast(stats))
      .select(col("i"), col("j"),
        (dec(col("n")) * dec(col("sp")) - dec(col("s1a")) * dec(col("s1b")))
          .as("a")))
    val b1 = aMat.groupBy(col("i")).agg(sum(col("a")).as("b1"))
    val b2 = aMat
      .join(broadcast(b1.select(col("i").as("j2"), col("b1"))),
        col("j") === col("j2"))
      .groupBy(col("i")).agg(sum(col("a") * col("b1")).as("b2"))
    // persisted: proj feeds BOTH the max aggregate and the final select —
    // without the pin the n×d projection pass would execute twice.
    val proj = persisted(ex
      .join(broadcast(b2.select(col("i").as("ip"), col("b2"))),
        col("i") === col("ip"))
      .groupBy("vec_id")
      .agg(sum(col("qx").cast(DecimalType(38, 0)) * col("b2")).as("proj")))
    val mx = proj.agg(max(abs(col("proj"))).as("mx"))
    proj.crossJoin(broadcast(mx))
      .select(col("vec_id"),
        round(col("proj").cast("double") / col("mx").cast("double"), 6)
          .as("pc1"))
  }

  /** DuckDB twin: the identical chain with HUGEINT folds (order-independent
    * exact sums) — appended after an `e` CTE of (vec_id, i, qx). DuckDB's
    * `i` is 1-based where Spark's transform index is 0-based; indices are
    * only join keys here, so the offset never surfaces.
    */
  val oracleSql: String =
    """WITH e AS (
      |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
      |         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000, 0) AS BIGINT) AS qx
      |  FROM embeddings
      |), m1 AS (
      |  SELECT i, sum(qx) AS s1 FROM e GROUP BY i
      |), stats AS (
      |  SELECT count(DISTINCT vec_id) AS n FROM e
      |), s2u AS (
      |  SELECT a.i AS i, b.i AS j, sum(a.qx * b.qx) AS sp
      |  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY 1, 2
      |), s2f AS (
      |  SELECT i, j, sp FROM s2u
      |  UNION ALL
      |  SELECT j AS i, i AS j, sp FROM s2u WHERE i <> j
      |), amat AS (
      |  SELECT s2f.i, s2f.j,
      |         CAST(st.n AS HUGEINT) * sp - CAST(a.s1 AS HUGEINT) * b.s1 AS a
      |  FROM s2f
      |  JOIN m1 a ON a.i = s2f.i
      |  JOIN m1 b ON b.i = s2f.j
      |  CROSS JOIN stats st
      |), b1 AS (
      |  SELECT i, sum(a) AS b1 FROM amat GROUP BY i
      |), b2 AS (
      |  SELECT amat.i, sum(amat.a * b1.b1) AS b2
      |  FROM amat JOIN b1 ON b1.i = amat.j
      |  GROUP BY 1
      |), prj AS (
      |  SELECT e.vec_id, sum(CAST(e.qx AS HUGEINT) * b2.b2) AS proj
      |  FROM e JOIN b2 ON b2.i = e.i
      |  GROUP BY 1
      |), mx AS (
      |  SELECT max(abs(proj)) AS mx FROM prj
      |)
      |SELECT vec_id, round(CAST(proj AS DOUBLE) / CAST(mx AS DOUBLE), 6) AS pc1
      |FROM prj CROSS JOIN mx""".stripMargin
}
