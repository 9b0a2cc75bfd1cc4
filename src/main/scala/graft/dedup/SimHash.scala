package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
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

  // ------------------------------------------------- near-dup pair search

  /** Block-collision LSH (Manku/Jain/Sarma WWW'07 §3): split the 32 bits
    * into `Blocks` contiguous 8-bit blocks and bucket each fingerprint once
    * per block. A pair at hamming distance h touches at most h blocks, so
    * with h <= Blocks-1 some block is untouched on both sides and the pair
    * collides in that block's bucket — a TRUE recall guarantee for
    * hamming <= [[GuaranteedRadius]] (the pigeonhole argument; Manku's
    * permuted-table construction generalizes this to larger radii, which a
    * 32-bit fingerprint can't support with useful key widths: hamming<=8
    * needs >=9 blocks of <=3 bits — 8-value keys, near-quadratic buckets).
    */
  val Blocks = 4
  val BlockBits: Int = Bits / Blocks
  val GuaranteedRadius: Int = Blocks - 1

  /** All near-dup pairs at hamming <= radius from a (doc_id, simhash)
    * relation. One self-equi-join on (block index, block value); exact
    * hamming verification only on same-bucket candidates. Scale: bucket
    * population is n/2^8 per block in the uniform case; skewed buckets
    * (constant blocks across a corpus) are the known hazard — AQE skew
    * join splits them, and `Blocks`/`BlockBits` are dials.
    */
  def candidatePairs(sh: DataFrame, radius: Int = GuaranteedRadius): DataFrame = {
    require(radius <= GuaranteedRadius,
      s"block bucketing only guarantees recall up to hamming ${GuaranteedRadius}")
    val mask = (1L << BlockBits) - 1
    val keyed = sh.select(col("doc_id"), col("simhash"),
      explode(array((0 until Blocks).map(i => struct(lit(i).as("blk"),
        shiftright(col("simhash"), i * BlockBits).bitwiseAND(mask).as("bkey"))): _*)).as("bk"))
      .select(col("doc_id"), col("simhash"), col("bk.blk"), col("bk.bkey"))
    keyed.as("a")
      .join(keyed.as("b"),
        col("a.blk") === col("b.blk") && col("a.bkey") === col("b.bkey") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= radius)
  }

  /** SQL twin of [[candidatePairs]] — `sh` must be a (doc_id, simhash)
    * relation name in scope.
    */
  def candidatePairsSql(sh: String, radius: Int = GuaranteedRadius): String = {
    val mask = (1L << BlockBits) - 1
    val arms = (0 until Blocks).map(i =>
      s"SELECT doc_id, simhash, $i AS blk, ((simhash >> ${i * BlockBits}) & $mask) AS bkey FROM $sh")
    s"""keyed AS (
       |  ${arms.mkString("\n  UNION ALL\n  ")}
       |)
       |SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
       |FROM keyed a JOIN keyed b
       |  ON a.blk = b.blk AND a.bkey = b.bkey AND a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.simhash, b.simhash)) <= $radius""".stripMargin
  }
}
