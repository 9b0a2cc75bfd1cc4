package graft.sim

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Array-local vector arithmetic over `embedding: array<float>` columns.
  *
  * Everything stays inside the row (zip_with/aggregate higher-order
  * functions) — no posexplode, no per-element shuffle — which is the scale
  * path: a brute-force scan is one narrow map stage.
  *
  * Cross-engine determinism: elements are quantized to 3dp (exact after
  * float->double), products are exact 6dp values, and the fold accumulates
  * in DECIMAL — bit-identical to the oracle's SUM(CAST(.. AS DECIMAL)).
  */
object VecMath {

  private val dec = DecimalType(18, 8)
  private val acc = DecimalType(28, 8)

  /** 3dp quantization of one element (float -> double exact, then round). */
  def q3(x: Column): Column = round(x.cast("double"), 3)

  /** Exact decimal dot product of two quantized vectors, as double. */
  def dotDec(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => q3(x) * q3(y)),
      lit(0).cast(acc),
      (s, p) => (s + p.cast(dec)).cast(acc)).cast("double")

  /** Squared L2 norm of the quantized vector, as double. */
  def norm2Dec(a: Column): Column = dotDec(a, a)

  /** cosine(a, b) given precomputed squared norms. */
  def cosine(dot: Column, n2a: Column, n2b: Column): Column =
    dot / (sqrt(n2a) * sqrt(n2b))

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
