package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Array-local vector arithmetic over `embedding: array<float>` columns.
  *
  * Everything stays inside the row (zip_with/aggregate higher-order
  * functions) — no posexplode, no per-element shuffle — which is the scale
  * path: a brute-force scan is one narrow map stage.
  *
  * Cross-engine determinism AND speed come from integer quantization:
  * elements are scaled to round(x*1000) as int64 (exact: float->double is
  * exact, and both engines round doubles half-away-from-zero), dot products
  * are exact int64 sums, and only the final /1e6 + divide/sqrt run in
  * double — bit-identical in Spark and DuckDB. Long folds are also ~10x
  * cheaper than the DECIMAL folds they replaced.
  *
  * SQL twins (kept in the query oracles):
  *   quantize:  CAST(round(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)
  *   dot:       CAST(sum(qa * qb) AS DOUBLE) / 1000000.0
  */
object VecMath {

  /** Quantized copy of the vector — compute ONCE per row before any join. */
  def quantize(a: Column): Column =
    transform(a, x => round(x.cast("double") * 1000, 0).cast("long"))

  /** Exact dot product of two quantized (int64) vectors, as double.
    * Uses the codegen'd DotQ expression — a primitive loop, not an
    * interpreted higher-order fold.
    */
  def dotQ(qa: Column, qb: Column): Column =
    graft.functions.DotQ(qa, qb).cast("double") / 1e6

  /** Squared L2 norm of a quantized vector, as double. */
  def norm2Q(qa: Column): Column = dotQ(qa, qa)

  /** cosine(a, b) given precomputed squared norms. */
  def cosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot / (sqrt(n2a) * sqrt(n2b))

  /** Identity pass-through marked non-deterministic: an optimizer barrier
    * that stops PushDownPredicates from folding an expensive derived-value
    * filter INTO a join condition, where it would be re-evaluated for every
    * hash-bucket probe (measured 100x slowdown on the cosine threshold
    * query). Semantically a no-op; the value is already deterministic.
    */
  val barrier: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((x: Double) => x).asNondeterministic()

  /** 8-bit sign-pattern bucket of the first 8 dimensions — a deterministic
    * stand-in for random-hyperplane LSH (with synthetic ~isotropic data the
    * coordinate planes ARE valid hyperplanes). SQL twin in queries.
    */
  def signBucket(a: Column): Column =
    (0 until 8).map { i =>
      when(element_at(a, i + 1) >= 0, lit(1 << i)).otherwise(lit(0))
    }.reduce(_ + _)

  def signBucketSql(arr: String): String =
    (0 until 8)
      .map(i => s"(CASE WHEN $arr[${i + 1}] >= 0 THEN ${1 << i} ELSE 0 END)")
      .mkString("(", " + ", ")")
}
