package graft.text

import scala.collection.mutable

/** JVM-side BPE encoder with REPLACE-CHAIN semantics — bit-compatible with
  * [[BpeQueries.bpeEncode]]'s column fold (and the oracle's
  * unrolled CTE chain): merges apply in rank order; within one rank,
  * occurrences merge left-to-right, non-overlapping, and the scan resumes
  * AFTER the replacement — exactly what `replace()` does on the
  * `|tok|`-delimited string form.
  *
  * This is deliberately NOT the classic min-rank-first BPE encode: merging
  * rank r can create an adjacency for some rank r' < r, which the chain
  * (like the SQL replace chain) does not revisit — switching algorithms
  * would flip hashes on such inputs (BpeCodecSpec plants one).
  *
  * Scale shape: the expression fold compiles ~50 merges into a shallow
  * codegen tree, but a vocab-scale (32k) table would nest 32k `replace`
  * calls — an uncompilable expression. Here the table is a broadcast
  * array walked per word, with a token-presence set pruning ranks whose
  * pair cannot occur (most of a 32k table, for typical short words).
  */
final class BpeCodec(merges: IndexedSeq[(String, String)]) extends Serializable {

  /** (left, right, merged) in rank order; pairs are "a b" space-split once
    * here, never per word.
    */
  private val table: Array[(String, String, String)] =
    merges.map { case (pair, merged) =>
      val i = pair.indexOf(' ')
      (pair.substring(0, i), pair.substring(i + 1), merged)
    }.toArray

  /** Encode one word to its BPE token sequence. */
  def encode(word: String): Array[String] = {
    var toks: Array[String] = word.toCharArray.map(_.toString)
    if (toks.length < 2) return toks
    val present = mutable.HashSet.empty[String]
    toks.foreach(present += _)
    var t = 0
    while (t < table.length) {
      val (a, b, m) = table(t)
      if (present.contains(a) && present.contains(b)) {
        val out = new mutable.ArrayBuffer[String](toks.length)
        var i = 0
        var any = false
        while (i < toks.length) {
          if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
            out += m; i += 2; any = true
          } else { out += toks(i); i += 1 }
        }
        if (any) { toks = out.toArray; present += m }
      }
      t += 1
    }
    toks
  }

  def tokenCount(word: String): Long = encode(word).length.toLong
}
