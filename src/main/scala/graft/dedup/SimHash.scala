package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** 32-bit SimHash (Charikar 2002, as applied to near-dup detection in
  * Manku/Jain/Sarma, WWW'07) over whitespace tokens, built ONLY from
  * engine-portable primitives (md5 hex + string position) so the DuckDB
  * oracle reproduces it bit-for-bit.
  *
  * Per token, bit b of md5(token) contributes +1/-1 to lane b; the final
  * hash sets bit b iff lane b's sum >= 0. Token multiplicity counts
  * (standard frequency weighting).
  */
object SimHash {

  val Bits = 32

  /** Value of hex nibble `idx` (0-based) of md5(token), via strpos — the
    * same expression works verbatim in DuckDB:
    * strpos('0123456789abcdef', substring(md5(tok), idx+1, 1)) - 1
    */
  private def nibble(tok: Column, idx: Int): Column =
    instr(lit("0123456789abcdef"), substring(md5(tok), idx + 1, 1)) - 1

  /** +1/-1 contribution of bit b (0 = most-significant bit of nibble 0). */
  def lane(tok: Column, b: Int): Column = {
    val bit = shiftright(nibble(tok, b / 4), 3 - b % 4).bitwiseAND(1)
    (bit * 2 - 1).cast("long")
  }

  /** Aggregate columns: one sum per lane, named s0..s31. */
  def laneAggs(tok: Column): Seq[Column] =
    (0 until Bits).map(b => sum(lane(tok, b)).as(s"s$b"))

  /** Combine lane sums s0..s31 into the simhash value (bit b from lane b). */
  def combine: Column =
    (0 until Bits).map { b =>
      when(col(s"s$b") >= 0, shiftleft(lit(1L), b)).otherwise(0L)
    }.reduce(_ + _)

  /** SQL twins (kept adjacent to the Scala so they evolve together). */
  def laneSqlExpr(tok: String, b: Int): String = {
    val nib = s"(strpos('0123456789abcdef', substring(md5($tok), ${b / 4 + 1}, 1)) - 1)"
    s"CAST((((($nib >> ${3 - b % 4}) & 1) * 2) - 1) AS BIGINT)"
  }

  def laneAggsSql(tok: String): String =
    (0 until Bits).map(b => s"sum(${laneSqlExpr(tok, b)}) AS s$b").mkString(",\n    ")

  def combineSql: String =
    (0 until Bits)
      .map(b => s"(CASE WHEN s$b >= 0 THEN (1::BIGINT << $b) ELSE 0 END)")
      .mkString("(", " + ", ")")
}
