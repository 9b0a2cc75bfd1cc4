package graft

/** One source of truth for constant tables that must appear as LITERALS in
  * BOTH engines — the Spark expression and the DuckDB oracle SQL (the
  * EwmaTaps / DctCosTab pattern: compute the values once in Scala, embed
  * the same rendering in each, so no libm call, no literal-parsing
  * divergence, and no hand-maintained second copy can drift).
  *
  * Every query family with an unrolled numeric table (DCT cos basis,
  * Hurst window sizes, Allan variance taus, rich-club degree cutoffs, EWMA
  * taps) routes its two renderings through these helpers; a new family
  * gets cross-engine agreement by construction instead of by review.
  */
object ConstTab {

  /** Spark SQL array literal: `array(a, b, c)`. */
  def sparkArray(xs: Iterable[Any]): String =
    xs.mkString("array(", ", ", ")")

  /** DuckDB list literal of the SAME values: `[a, b, c]`. */
  def duckList(xs: Iterable[Any]): String =
    xs.mkString("[", ", ", "]")

  /** DuckDB typed array literal: `ARRAY[a, b, c]` (unnest-friendly). */
  def duckArray(xs: Iterable[Any]): String =
    "ARRAY" + duckList(xs)

  /** SQL VALUES row list: `(a), (b), (c)` — for `(VALUES ...) t(col)`
    * derived tables in either engine.
    */
  def valuesRows(xs: Iterable[Any]): String =
    xs.map(x => s"($x)").mkString(", ")
}
