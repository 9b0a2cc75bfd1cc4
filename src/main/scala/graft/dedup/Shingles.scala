package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text-shingling / hashing primitives for the dedup family, with
  * exactly-mirrored DuckDB SQL fragments (each Spark builder documents its
  * SQL twin; the twins live in DedupQueries' oracle strings).
  *
  * Portability rules that make the hash-compare possible:
  *   - All hashing derives from md5 hex (identical strings in any engine),
  *     reduced to a 60-bit int64 and mixed with exact universal-hash
  *     arithmetic — never Spark's murmur hash() (its seed differs from
  *     every other engine).
  *   - Whitespace tokenization + word 3-gram shingles, guarded so docs with
  *     <3 tokens yield no shingles in both engines.
  *   - Shingle relations carry the 60-bit hash, not the shingle string —
  *     see [[shingleHashes3]].
  */
object Shingles {

  /** Number of minhash permutations and LSH band shape (k = bands * rows). */
  val MinhashK = 8
  val Bands = 4
  val RowsPerBand: Int = MinhashK / Bands

  /** lower + whitespace-split tokens. SQL: string_split_regex(lower(text), '\s+') */
  def tokens(text: Column): Column =
    split(lower(text), "\\s+")

  /** Word 3-gram shingles from a tokens array; empty when <3 tokens.
    * SQL: list_transform(range(1, greatest(len(toks)-1, 1)),
    *        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
    */
  def shingles3(toks: Column): Column =
    when(size(toks) < 3, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))

  /** Word 3-gram shingle HASHES (60-bit int64) from a tokens array. The
    * hash runs INSIDE the lambda, so the materialized array — and the
    * exploded relation and every downstream
    * join/aggregate — carries 8-byte keys, never the ~40-char shingle
    * strings (~5x fewer shuffle bytes for the biggest relation the dedup
    * family builds; at 100 TB the shingle stream is a multiple of the
    * corpus itself). Identity is the FULL 60-bit md5 prefix — at 100 TB
    * the distinct-shingle count is ~10^11-10^12, where a 2^60 space keeps
    * the expected collision count ~ n^2/2^61 harmlessly small (birthday
    * bound: ~10^24/10^18 ≈ 10^6 colliding pairs out of 10^12 shingles —
    * one in a million — versus CERTAIN saturation in a 10^9 space).
    * Jaccard/containment/fingerprint all key on this full-width value; the
    * mod-P reduction happens only inside the minhash mix ([[minhashAgg]]),
    * where the permutation space is what P bounds, not shingle identity.
    * The DuckDB twin hashes identically, so verification stays exact-match.
    */
  def shingleHashes3(toks: Column): Column =
    when(size(toks) < 3, array().cast("array<long>"))
      .otherwise(transform(
        sequence(lit(1), size(toks) - 2),
        i => hash60(concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2)))))

  /** Minhash hashing: ONE md5 per shingle reduced to a 60-bit integer, then
    * k cheap universal-hash mixes h_i = (a_i*(h mod P) + b_i) mod P — 8x fewer
    * digest computations than hashing per seed, identical collision
    * behavior, and every op is exact int64 in both engines.
    * SQL twins are built in DedupQueries.
    */
  val P = 1000000007L
  val MixA: Seq[Long] = Seq(824633721L, 433024223L, 715827883L, 294967291L,
    179424673L, 961748941L, 610612741L, 472882049L)
  val MixB: Seq[Long] = Seq(15485863L, 32452843L, 49979687L, 67867967L,
    86028121L, 104395301L, 122949823L, 141650939L)

  /** 60-bit integer hash of a shingle: first 15 hex chars of md5, un-modded
    * — this is the IDENTITY key for every distinct/intersection/containment
    * computation, so it keeps the full 60-bit width (see
    * [[shingleHashes3]] for the collision math).
    * SQL: ('0x' || substring(md5(sh), 1, 15))::BIGINT
    */
  def hash60(sh: Column): Column =
    conv(substring(md5(sh), 1, 15), 16, 10).cast("long")

  def hash60Sql(sh: String): String =
    s"(('0x' || substring(md5($sh), 1, 15))::BIGINT)"

  /** One minhash aggregate over the materialized integer hash column. The
    * 60-bit identity hash is reduced mod P only HERE, inside the mix —
    * `a*(h%P)+b` stays under 2^61 (a < 2^30, h%P < 2^30), so the int64
    * arithmetic is exact in both engines, and a permutation space of P
    * (~2^30) is ample for an 8-way minhash (what matters for the minimum's
    * distribution is P >> distinct shingles PER DOCUMENT, not corpus-wide).
    */
  def minhashAgg(h: Column, seed: Int): Column =
    min((lit(MixA(seed)) * (h % P) + lit(MixB(seed))) % P)

  def minhashAggSql(h: String, seed: Int): String =
    s"min((${MixA(seed)} * ($h % $P) + ${MixB(seed)}) % $P)"

  /** docs(doc_id, text) -> (doc_id, h) exploded distinct 60-bit shingle
    * hashes (see [[shingleHashes3]] for why hashes, not strings).
    *
    * Distinctness is per-document by construction, so it is enforced
    * ROW-LOCALLY (array_distinct before the explode) rather than with a
    * global `.distinct()` — the old formulation shuffled the full shingle
    * relation (2M rows at sf0.1, a corpus-multiple at 100 TB) just to
    * dedup within doc_id groups that each start out on one row. Every
    * consumer then reaches the relation shuffle-free: the minhash and
    * df aggregations reduce map-side, and the candidate array build
    * only ever shuffles the candidate sliver.
    *
    * The tokens array is materialized as its own projection BEFORE the
    * shingle lambda: inlining `split(...)` into the transform() lambda would
    * re-run the regex split for every element_at reference (3x per shingle,
    * ~150x per document) — measured 10x slower at sf0.1. CollapseProject
    * keeps multi-referenced non-trivial aliases, so this two-step select is
    * a genuine evaluation barrier.
    */
  def docShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), tokens(col("text")).as("tk"))
      .select(col("doc_id"), explode(array_distinct(shingleHashes3(col("tk")))).as("h"))

  /** (doc_id, m0..m{k-1}) minhash signature relation. */
  def signatures(docs: DataFrame): DataFrame =
    signaturesFrom(docShingles(docs))

  /** Signatures from an (optionally persisted) (doc_id, h) shingle-hash
    * relation — use this when the shingles feed several branches, so
    * they're computed once. The relation already carries the 60-bit hash,
    * so the k mixes are pure int64 arithmetic over it.
    */
  def signaturesFrom(sh: DataFrame): DataFrame = {
    val aggs = (0 until MinhashK).map(i => minhashAgg(col("h"), i).as(s"m$i"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Signature -> (doc_id, band, band_key): band_key = md5 of the band's
    * concatenated minhashes. SQL twin built in DedupQueries.
    */
  def bands(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until Bands).map { b =>
      val ms = (0 until RowsPerBand).map(r => col(s"m${b * RowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat_ws("|", ms: _*)).as("band_key"))
    }
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }
}
