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
  *                      unavailable offline), so the oracle joins the
  *                      PRECOMPUTED stem-map side table (SURVEY.md §5.2)
  *                      checked in at `src/test/resources/stemmap.tsv` —
  *                      regenerate with `sbt "runMain graft.GenStemMap"`.
  *                      The stemmer itself is pinned by golden vectors
  *                      (PorterStemmerSpec); the oracle verifies the
  *                      PIPELINE around it cross-engine.
  *   - `tfidf_*_raw`  — identical pipeline minus stemming, oracled without
  *                      any side table.
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
    "tfidf_tf_raw" -> ((s, d) => TfIdf.pipelineRelations(docs(s, d), raw)._3),
    "tfidf_score_raw" -> ((s, d) => scoreDf(s, d, raw))
  )

  /** Shared oracle CTEs, parameterized over stemming. The cleaning deletes
    * everything but letters and spaces, so the reference's `[^\w']+` split
    * degenerates to splitting on runs of spaces; empty tokens (leading
    * separator) are removed by the stopword list, which contains ''.
    *
    * When `stem`, the stop-filtered raw tokens are mapped through the
    * checked-in stem-map side table (GenStemMap — covers the full testdata
    * vocabulary; LEFT JOIN + COALESCE falls back to identity, so an
    * uncovered term whose stem differs hash-fails instead of silently
    * passing). Mirrors the reference order: stopword filter BEFORE stemming
    * (DocumentFreq.java:66-69).
    */
  /** Stem-map side table for the stemmed oracles. Resolution order:
    * `-Dgraft.stemmap.path=...`, `$GRAFT_STEMMAP_PATH`, then a
    * working-directory-relative default — no machine-specific absolute
    * path baked into main code (r2 ADVICE). The oracle SQL needs a real
    * filesystem path (DuckDB read_csv), so a classpath resource can't
    * serve here.
    */
  private val StemMapPath: String =
    sys.props.get("graft.stemmap.path")
      .orElse(sys.env.get("GRAFT_STEMMAP_PATH"))
      .getOrElse(new java.io.File("src/test/resources/stemmap.tsv")
        .getAbsolutePath)

  private def termsCte(stem: Boolean): String = {
    val rawCtes =
      s"""WITH toks AS (
         |  SELECT doc_id,
         |         unnest(string_split_regex(
         |           regexp_replace(regexp_replace(lower(text), '[\n\r]', ' ', 'g'),
         |                          '[^a-zA-Z ]', '', 'g'), ' +')) AS term
         |  FROM documents
         |), terms_raw AS (
         |  SELECT doc_id, term FROM toks
         |  WHERE term NOT IN ${Stopwords.sqlInList}
         |)""".stripMargin
    if (!stem) s"$rawCtes, terms AS (SELECT doc_id, term FROM terms_raw)"
    else
      s"""$rawCtes, smap AS (
         |  SELECT term_raw, term_stem FROM read_csv('$StemMapPath',
         |    delim='\t', header=true,
         |    columns={'term_raw': 'VARCHAR', 'term_stem': 'VARCHAR'})
         |), terms AS (
         |  SELECT t.doc_id, coalesce(m.term_stem, t.term) AS term
         |  FROM terms_raw t LEFT JOIN smap m ON t.term = m.term_raw
         |)""".stripMargin
  }

  private def dfCte(stem: Boolean): String =
    s"""${termsCte(stem)}, dfr AS (
       |  SELECT term, count(DISTINCT doc_id) AS df FROM terms GROUP BY term
       |)""".stripMargin

  private def topCte(stem: Boolean): String =
    s"""${dfCte(stem)}, top AS (
       |  SELECT term, df FROM dfr ORDER BY df DESC, term ASC LIMIT 100
       |)""".stripMargin

  private def tfCte(stem: Boolean): String =
    s"""${topCte(stem)}, tf AS (
       |  SELECT t.doc_id, t.term, count(*) AS tf
       |  FROM terms t WHERE t.term IN (SELECT term FROM top)
       |  GROUP BY t.doc_id, t.term
       |)""".stripMargin

  private def scoreSql(stem: Boolean): String =
    s"""${tfCte(stem)}
       |SELECT tf.doc_id, tf.term, tf.tf, top.df,
       |       round(tf.tf * ln(10000.0 / (top.df + 1)), 6) AS score
       |FROM tf JOIN top ON tf.term = top.term""".stripMargin

  override val oracles: Map[String, String] = Map(
    "tfidf_df" -> s"${dfCte(true)} SELECT term, df FROM dfr",
    "tfidf_top100" -> s"${topCte(true)} SELECT term, df FROM top",
    "tfidf_score" -> scoreSql(true),
    "tfidf_df_raw" -> s"${dfCte(false)} SELECT term, df FROM dfr",
    "tfidf_top100_raw" -> s"${topCte(false)} SELECT term, df FROM top",
    "tfidf_tf_raw" -> s"${tfCte(false)} SELECT doc_id, term, tf FROM tf",
    "tfidf_score_raw" -> scoreSql(false)
  )
}
