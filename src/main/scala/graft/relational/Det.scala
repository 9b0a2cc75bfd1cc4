package graft.relational

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic cross-engine double aggregation.
  *
  * Summing doubles is order-dependent, and Spark's partial/final aggregation
  * order differs run-to-run and engine-to-engine — a hash compare against
  * DuckDB over ~1e5 rows can flip even under rounding. The testdata's money
  * columns are exact 2-decimal values (verified: every double column at
  * sf0.01 equals round(x, 2)), so summing through a sufficiently-scaled
  * DECIMAL is EXACT and order-independent; casting the exact decimal back to
  * double yields bit-identical results in Spark and DuckDB.
  *
  * Scale guidance: 2dp inputs need scale >= 2; products of two 2dp values
  * have <= 4 decimals and need scale >= 4. Additionally the SCALED sum must
  * stay under 2^53 for the final decimal->double cast to be exactly
  * representable (both engines then agree trivially): with scale 4 that is
  * sums up to ~9e11 — comfortable for sf0.1 (~3e10) and another 30x beyond.
  * Past that, keep the result as DECIMAL end-to-end instead of casting.
  * At 100 TB the exactness of the decimal sum itself still holds (Spark
  * widens sum(DECIMAL(18,s)) to DECIMAL(28,s) — overflow needs ~1e19 rows).
  */
object Det {

  /** Exact sum of a double column with <=`scale`-2 decimal digits. */
  def dsum(c: Column, scale: Int = 4): Column =
    sum(c.cast(DecimalType(18, scale))).cast("double")

  /** Matching DuckDB SQL fragment. */
  def dsumSql(expr: String, scale: Int = 4): String =
    s"CAST(sum(CAST($expr AS DECIMAL(18,$scale))) AS DOUBLE)"

  /** Exact-sum-based average (null-free columns, as the testdata is). */
  def davg(c: Column, scale: Int = 4): Column =
    dsum(c, scale) / count(lit(1))

  def davgSql(expr: String, scale: Int = 4): String =
    s"${dsumSql(expr, scale)} / count(*)"

  /** Sample stddev via exact decimal sums of x and x^2, rounded to 4dp.
    *
    * The decimal sums themselves are exact, but sum(x^2) scaled by 10^4
    * exceeds 2^53 at these magnitudes, and decimal->double conversion of a
    * value that big is correctly-rounded in the JVM (BigDecimal) but
    * double-rounded in DuckDB (int128->double, then /10^scale) — a 1-ulp
    * divergence. Rounding the ~1e4-magnitude stddev to 4dp absorbs it
    * (flip probability ~1e-8); plain stddev_samp would diverge at the 1e-10
    * level on every group.
    */
  def dstddev(c: Column): Column = {
    val n = count(lit(1)).cast("double")
    val s1 = dsum(c, 4)
    val s2 = dsum(c * c, 4)
    round(sqrt(greatest(lit(0.0), (s2 - s1 * s1 / n) / (n - lit(1.0)))), 4)
  }

  def dstddevSql(expr: String): String = {
    val n = "CAST(count(*) AS DOUBLE)"
    val s1 = dsumSql(expr, 4)
    val s2 = dsumSql(s"($expr) * ($expr)", 4)
    s"round(sqrt(greatest(0.0, ($s2 - $s1 * $s1 / $n) / ($n - 1.0))), 4)"
  }
}
