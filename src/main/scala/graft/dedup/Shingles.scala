package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Shared text-shingling / hashing primitives for the dedup family, with
  * exactly-mirrored DuckDB SQL fragments (each Spark builder documents its
  * SQL twin; the twins live in DedupQueries' oracle strings).
  *
  * Portability rules that make the hash-compare possible:
  *   - All hashing is md5 hex (identical strings in any engine); minhash
  *     signatures are lexicographic MIN over md5 strings, never numeric
  *     murmur (Spark's hash() seed differs from every other engine).
  *   - Whitespace tokenization + word 3-gram shingles, guarded so docs with
  *     <3 tokens yield no shingles in both engines.
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

  /** One minhash: lexicographic min of md5(seed || '|' || shingle).
    * SQL: min(md5(<seed> || '|' || sh))
    */
  def minhashAgg(sh: Column, seed: Int): Column =
    min(md5(concat(lit(s"$seed|"), sh)))

  /** docs(doc_id, text) -> (doc_id, sh) exploded distinct shingles. */
  def docShingles(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), explode(shingles3(tokens(col("text")))).as("sh"))
      .distinct()

  /** (doc_id, m0..m{k-1}) minhash signature relation. */
  def signatures(docs: DataFrame): DataFrame = {
    val aggs = (0 until MinhashK).map(i => minhashAgg(col("sh"), i).as(s"m$i"))
    docShingles(docs).groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** Signature -> (doc_id, band, band_key): band_key = md5 of the band's
    * concatenated minhashes. SQL twin built in DedupQueries.
    */
  def bands(sigs: DataFrame): DataFrame = {
    val bandCols = (0 until Bands).map { b =>
      val ms = (0 until RowsPerBand).map(r => col(s"m${b * RowsPerBand + r}"))
      struct(lit(b).as("band"), md5(concat(ms: _*)).as("band_key"))
    }
    sigs.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }
}
