package graft.tfidf

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.text.Stopwords

/** Reference-parity TF-IDF queries over `documents.parquet`.
  *
  * Two variants per stage:
  *   - `tfidf_*`      — full reference semantics INCLUDING Porter stemming
  *                      (DocumentFreq.java:69). Porter isn't expressible in
  *                      DuckDB SQL (its `stem()` lives in the fts extension,
  *                      unavailable offline), so these get the driver's
  *                      rows-only check; stemming itself is covered by
  *                      ScalaTest golden vectors (PorterStemmerSpec).
  *   - `tfidf_*_raw`  — identical pipeline minus stemming, WITH a full
  *                      DuckDB oracle (tokenize/stopword/DF/top-k/TF/score
  *                      all hash-checked cross-engine).
  */
object TfIdfQueries extends QueryPack {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private val stemmed = TfIdf.Default
  private val raw = TfIdf.Default.copy(stem = false)

  /** Deterministic ordering for the score relation is by (doc_id, term) —
    * already unique per row, so no ORDER BY is needed for hashing; the
    * driver sorts. Doubles are rounded on both sides.
    */
  private def scoreDf(s: SparkSession, dir: String, cfg: TfIdf.Config): DataFrame =
    TfIdf.pipeline(docs(s, dir), cfg)
      .select(col("doc_id"), col("term"), col("tf"), col("df"),
        round(col("score"), 6).as("score"))

  private def dfOf(s: SparkSession, d: String, cfg: TfIdf.Config): DataFrame =
    TfIdf.documentFrequencyFromTf(
      TfIdf.termFrequencyAll(TfIdf.terms(docs(s, d), cfg)))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "tfidf_df" -> ((s, d) => dfOf(s, d, stemmed)),
    "tfidf_top100" -> ((s, d) => TfIdf.topTerms(dfOf(s, d, stemmed), 100)),
    "tfidf_score" -> ((s, d) => scoreDf(s, d, stemmed)),
    "tfidf_df_raw" -> ((s, d) => dfOf(s, d, raw)),
    "tfidf_top100_raw" -> ((s, d) => TfIdf.topTerms(dfOf(s, d, raw), 100)),
    "tfidf_tf_raw" -> ((s, d) => {
      val tfAll = TfIdf.termFrequencyAll(TfIdf.terms(docs(s, d), raw))
      val top = TfIdf.topTerms(TfIdf.documentFrequencyFromTf(tfAll), 100)
      tfAll.join(org.apache.spark.sql.functions.broadcast(top.select("term")),
        Seq("term"), "left_semi")
    }),
    "tfidf_score_raw" -> ((s, d) => scoreDf(s, d, raw))
  )

  /** Shared oracle CTE: the cleaned, stop-filtered token stream. The cleaning
    * deletes everything but letters and spaces, so the reference's
    * `[^\w']+` split degenerates to splitting on runs of spaces; empty
    * tokens (leading separator) are removed by the stopword list, which
    * contains ''.
    */
  private val termsCte: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         unnest(string_split_regex(
       |           regexp_replace(regexp_replace(lower(text), '[\n\r]', ' ', 'g'),
       |                          '[^a-zA-Z ]', '', 'g'), ' +')) AS term
       |  FROM documents
       |), terms AS (
       |  SELECT doc_id, term FROM toks
       |  WHERE term NOT IN ${Stopwords.sqlInList}
       |)""".stripMargin

  private val dfCte: String =
    s"""$termsCte, dfr AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY term
       |)""".stripMargin

  private val topCte: String =
    s"""$dfCte, top AS (
       |  SELECT term, df FROM dfr ORDER BY df DESC, term ASC LIMIT 100
       |)""".stripMargin

  private val tfCte: String =
    s"""$topCte, tf AS (
       |  SELECT t.doc_id, t.term, count(*) AS tf
       |  FROM terms t WHERE t.term IN (SELECT term FROM top)
       |  GROUP BY t.doc_id, t.term
       |)""".stripMargin

  override val oracles: Map[String, String] = Map(
    "tfidf_df_raw" -> s"$dfCte SELECT term, df FROM dfr",
    "tfidf_top100_raw" -> s"$topCte SELECT term, df FROM top",
    "tfidf_tf_raw" -> s"$tfCte SELECT doc_id, term, tf FROM tf",
    "tfidf_score_raw" ->
      s"""$tfCte
         |SELECT tf.doc_id, tf.term, tf.tf, top.df,
         |       round(tf.tf * ln(10000.0 / (top.df + 1)), 6) AS score
         |FROM tf JOIN top ON tf.term = top.term""".stripMargin
  )
}
