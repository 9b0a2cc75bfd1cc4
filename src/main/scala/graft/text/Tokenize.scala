package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's text-cleaning pipeline as composable `Column` functions
  * (all codegen'd built-ins — no UDFs):
  *
  *   P1 conditional lowercase  (DocumentFreq.java:61, IDF.java:83)
  *   P2 non-letter strip       `replaceAll("[^a-zA-Z ]","")`
  *                             (DocumentFreq.java:62, IDF.java:85)
  *   P3 split                  `split("[^\\w']+")`
  *                             (DocumentFreq.java:63, IDF.java:86)
  *
  * Quirks preserved exactly (SURVEY.md §2.2): digits/punctuation are DELETED,
  * not treated as separators, so `"abc123def"` becomes the single token
  * `"abcdef"`; a line starting with a separator yields a leading
  * empty-string token. Java's `String.split` drops trailing empty tokens
  * while Spark's `split` keeps them — the difference is unobservable in the
  * reference-parity pipeline because the stopword skip set contains `""`
  * (blank lines in stopwords.txt) and is always applied before counting,
  * removing every empty token in both engines.
  */
object Tokenize {

  /** Regex deleted by the cleaning step — anything but letters and spaces. */
  val CleanPattern = "[^a-zA-Z ]"

  /** Java `String.split` pattern used by the reference tokenizer. */
  val SplitPattern = "[^\\w']+"

  def clean(text: Column, caseSensitive: Boolean = false): Column = {
    val lowered = if (caseSensitive) text else lower(text)
    // Line terminators are RECORD boundaries in the reference (one map()
    // call per line) — they must act as token separators, not be deleted
    // like other non-letters ("fox\njumps" is two tokens, "abc123def" one).
    regexp_replace(regexp_replace(lowered, "[\\n\\r]", " "), CleanPattern, "")
  }

  /** Cleaned text -> array of tokens (may contain empty strings — see note
    * above; the stopword filter removes them).
    */
  def tokens(text: Column, caseSensitive: Boolean = false): Column =
    split(clean(text, caseSensitive), SplitPattern)

  /** One row per token. explode (not explode_outer): a document that cleans
    * to nothing contributes no rows, like a mapper emitting nothing.
    */
  def explodeTokens(text: Column, caseSensitive: Boolean = false): Column =
    explode(tokens(text, caseSensitive))
}
