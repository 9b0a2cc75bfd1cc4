package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 64-bit SimHash (Charikar 2002, as applied to near-dup detection in
  * Manku/Jain/Sarma, WWW'07) over whitespace tokens, built ONLY from
  * engine-portable primitives (md5 hex + string position) so the DuckDB
  * oracle reproduces it bit-for-bit.
  *
  * Per token, bit b of md5(token) contributes +1/-1 to lane b; the final
  * hash sets bit b iff lane b's sum >= 0. Token multiplicity counts
  * (standard frequency weighting).
  *
  * 64 bits (up from 32 in round 2): a 32-bit fingerprint collides by the
  * birthday bound at ~2^16 documents — useless for a corpus-scale dedup
  * pass. 64 bits pushes random collisions past 2^32 docs and supports 8
  * blocks of 8 bits, raising the guaranteed block-LSH radius from 3 to 7.
  *
  * The lane expressions read a PRE-COMPUTED md5-hex column rather than
  * hashing the token per lane — one md5 per token instead of 64, enforced
  * in the plan by projecting the hex before the aggregate (codegen
  * subexpression elimination is not guaranteed across 64 aggregate
  * buffers).
  */
object SimHash {

  val Bits = 64

  /** Value of hex nibble `idx` (0-based) of the md5 hex string, via
    * strpos — the same expression works verbatim in DuckDB:
    * strpos('0123456789abcdef', substring(h, idx+1, 1)) - 1
    */
  private def nibble(hex: Column, idx: Int): Column =
    instr(lit("0123456789abcdef"), substring(hex, idx + 1, 1)) - 1

  /** +1/-1 contribution of bit b (0 = most-significant bit of nibble 0).
    * `hex` is the md5 hex string of the token (compute it ONCE upstream).
    */
  def lane(hex: Column, b: Int): Column = {
    val bit = shiftright(nibble(hex, b / 4), 3 - b % 4).bitwiseAND(1)
    (bit * 2 - 1).cast("long")
  }

  /** Aggregate columns: one sum per lane, named s0..s63, over the token's
    * md5-hex column.
    */
  def laneAggs(hex: Column): Seq[Column] =
    (0 until Bits).map(b => sum(lane(hex, b)).as(s"s$b"))

  /** Combine lane sums s0..s63 into the simhash value (bit b from lane b).
    * Bit 63 is Long.MinValue — the sum of any subset of distinct bit values
    * stays inside two's-complement range (partial sums of bits 0..62 are
    * <= Long.MaxValue; adding bit 63 lands in [MinValue, -1]), so the
    * additions below never overflow in either engine.
    */
  def combine: Column =
    (0 until Bits).map { b =>
      when(col(s"s$b") >= 0, lit(1L << b)).otherwise(0L)
    }.reduce(_ + _)

  // ------------------------------------------------------------- SQL twins
  // (kept adjacent to the Scala so they evolve together)

  /** `hex` must be an expression yielding md5(token) — computed once in an
    * upstream CTE, mirroring the Spark-side projection.
    */
  def laneSqlExpr(hex: String, b: Int): String = {
    val nib = s"(strpos('0123456789abcdef', substring($hex, ${b / 4 + 1}, 1)) - 1)"
    s"CAST((((($nib >> ${3 - b % 4}) & 1) * 2) - 1) AS BIGINT)"
  }

  def laneAggsSql(hex: String): String =
    (0 until Bits).map(b => s"sum(${laneSqlExpr(hex, b)}) AS s$b").mkString(",\n    ")

  /** Bit values emitted as precomputed DECIMAL literals, not `1 << b`
    * expressions: shift/overflow semantics at b=63 differ across engines
    * (DuckDB rejects the bare literal 9223372036854775808), so bit 63 is
    * written as (-9223372036854775807 - 1), the portable MinValue spelling.
    */
  private def bitLiteralSql(b: Int): String =
    if (b == 63) "(-9223372036854775807 - 1)" else s"CAST(${1L << b} AS BIGINT)"

  def combineSql: String =
    (0 until Bits)
      .map(b => s"(CASE WHEN s$b >= 0 THEN ${bitLiteralSql(b)} ELSE CAST(0 AS BIGINT) END)")
      .mkString("(", " + ", ")")

  // ------------------------------------------------- near-dup pair search

  /** Block-collision LSH (Manku/Jain/Sarma WWW'07 §3): split the 64 bits
    * into `Blocks` contiguous 8-bit blocks and bucket each fingerprint once
    * per block. A pair at hamming distance h touches at most h blocks, so
    * with h <= Blocks-1 some block is untouched on both sides and the pair
    * collides in that block's bucket — a TRUE recall guarantee for
    * hamming <= [[GuaranteedRadius]] (the pigeonhole argument; Manku's
    * permuted-table construction generalizes to larger radii by compounding
    * blocks into wider keys, at the cost of more tables).
    */
  val Blocks = 8
  val BlockBits: Int = Bits / Blocks
  val GuaranteedRadius: Int = Blocks - 1

  /** All near-dup pairs at hamming <= radius from a (doc_id, simhash)
    * relation. One self-equi-join on (block index, block value); exact
    * hamming verification only on same-bucket candidates. Scale: bucket
    * population is n/2^8 per block in the uniform case; skewed buckets
    * (constant blocks across a corpus) are the known hazard — AQE skew
    * join splits them, and `Blocks`/`BlockBits` are dials.
    *
    * The (x >> shift) & mask block keys are shift-semantics-proof: logical
    * vs arithmetic right shift differ only in bits the mask discards.
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
