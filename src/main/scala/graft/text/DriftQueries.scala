package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}

/** Corpus-distribution monitoring for the training-data pipeline: is the
  * corpus DRIFTING (token-distribution divergence between two slices) and
  * is it still ADDING anything (per-doc n-gram novelty against everything
  * that came before)? These are the text-space siblings of the numeric
  * monitors (q_dq_drift_psi / q_ts_*): a crawler regression, a dedup bug,
  * or a source going stale shows up here before any downstream metric
  * moves.
  *
  * Scale shape: both operators collapse the corpus with ONE token/gram
  * explode into a bounded-vocab (or gram-keyed) aggregation; everything
  * after runs agg-to-agg. Determinism: probabilities derive from exact
  * integer counts; ln() runs on identical IEEE quotients; per-token
  * contributions are round-pinned and folded in exact DECIMAL, so
  * partition order can never move the sum.
  */
object DriftQueries extends QueryPack {

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  /** N-gram order for [[text_novelty]]. */
  val NoveltyN = 3

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Jensen-Shannon divergence between the token distributions of two
    // deterministic md5 halves of the corpus — the symmetric, always-
    // finite alternative to KL for "did the token mix move?" (PSI's
    // text-space sibling; 0 = identical, ln 2 = disjoint). Add-one
    // smoothing over the shared vocab keeps every term finite. One
    // corpus-sized token aggregation produces per-token (c0, c1); totals
    // ride a broadcast 1-row aggregate; the JSD sum folds round(,12)-
    // pinned contributions in exact DECIMAL. At 100 TB the "halves"
    // become yesterday-vs-today slices — the same plan keyed by any
    // deterministic slice function.
    "text_jsd_drift" -> ((s, d) => {
      val h = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
        16, 10).cast("long") % 2
      val g = docs(s, d)
        .select(h.as("h"),
          explode(split(lower(col("text")), "\\s+")).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("tok")
        .agg(count(when(col("h") === 0, 1)).as("c0"),
          count(when(col("h") === 1, 1)).as("c1"))
        .transform(graft.CacheScope.persisted(_))
      val tot = g.agg(sum(col("c0")).as("n0"), sum(col("c1")).as("n1"),
        count(lit(1)).as("v"))
      val p = (col("c0") + 1).cast("double") / (col("n0") + col("v")).cast("double")
      val q = (col("c1") + 1).cast("double") / (col("n1") + col("v")).cast("double")
      val m = (p + q) / lit(2.0)
      val contrib = round(lit(0.5) * p * log(p / m) +
        lit(0.5) * q * log(q / m), 12).cast(DecimalType(16, 12))
      g.crossJoin(broadcast(tot))
        .agg(max(col("n0")).as("n_tokens_a"), max(col("n1")).as("n_tokens_b"),
          max(col("v")).as("vocab"), sum(contrib).as("sj"))
        .select(col("n_tokens_a"), col("n_tokens_b"), col("vocab"),
          round(col("sj").cast("double"), 6).as("jsd"))
    }),

    // Per-document n-gram novelty: what fraction of a doc's distinct
    // word 3-grams appear in NO earlier document (doc_id order — the
    // crawl/ingest order)? The marginal-contribution curve that data
    // mixing and curriculum decisions read: a source whose novelty decays
    // to ~0 is re-crawling itself. First occurrence is one min(doc_id)
    // aggregation over the deduped (doc, gram-hash) relation; the join
    // back is agg-to-agg on the 60-bit gram hash (the Shingles identity
    // discipline — gram STRINGS never shuffle). Docs shorter than
    // [[NoveltyN]] tokens have no grams and emit no row, identically in
    // both engines.
    "text_novelty" -> ((s, d) => {
      // Materialize the token array BEFORE the gram lambda: an inlined
      // split would be re-evaluated by every element_at inside the
      // transform (3 splits/gram — measured 9.8s -> see PLANS.md), the
      // same trap text_ngram_counts' two-step select avoids.
      val grams = docs(s, d)
        .select(col("doc_id"), split(lower(col("text")), "\\s+").as("tk"))
        .select(col("doc_id"),
          explode(when(size(col("tk")) < NoveltyN, array().cast("array<string>"))
            .otherwise(transform(
              sequence(lit(1), size(col("tk")) - (NoveltyN - 1)),
              i => conv(substring(md5(concat_ws(" ",
                element_at(col("tk"), i), element_at(col("tk"), i + 1),
                element_at(col("tk"), i + 2))), 1, 15), 16, 10)
                .cast("long")))).as("gh"))
        .distinct()
        .transform(graft.CacheScope.persisted(_))
      val firsts = grams.groupBy("gh").agg(min(col("doc_id")).as("fd"))
      grams.join(firsts, "gh")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_grams"),
          count(when(col("fd") === col("doc_id"), 1)).as("n_novel"))
        .select(col("doc_id"), col("n_grams"), col("n_novel"),
          round(col("n_novel").cast("double") / col("n_grams").cast("double"),
            6).as("novelty"))
    }))

  override val oracles: Map[String, String] = Map(

    "text_jsd_drift" ->
      """WITH tk AS (
        |  SELECT ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS h,
        |         unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents
        |), g AS (
        |  SELECT tok, count(CASE WHEN h = 0 THEN 1 END) AS c0,
        |         count(CASE WHEN h = 1 THEN 1 END) AS c1
        |  FROM tk WHERE tok <> '' GROUP BY tok
        |), tot AS (
        |  SELECT CAST(sum(c0) AS BIGINT) AS n0, CAST(sum(c1) AS BIGINT) AS n1,
        |         count(*) AS v
        |  FROM g
        |), per AS (
        |  SELECT CAST(round(
        |           0.5 * (CAST(c0 + 1 AS DOUBLE) / CAST(n0 + v AS DOUBLE)) *
        |             ln((CAST(c0 + 1 AS DOUBLE) / CAST(n0 + v AS DOUBLE)) /
        |                ((CAST(c0 + 1 AS DOUBLE) / CAST(n0 + v AS DOUBLE) +
        |                  CAST(c1 + 1 AS DOUBLE) / CAST(n1 + v AS DOUBLE)) / 2.0)) +
        |           0.5 * (CAST(c1 + 1 AS DOUBLE) / CAST(n1 + v AS DOUBLE)) *
        |             ln((CAST(c1 + 1 AS DOUBLE) / CAST(n1 + v AS DOUBLE)) /
        |                ((CAST(c0 + 1 AS DOUBLE) / CAST(n0 + v AS DOUBLE) +
        |                  CAST(c1 + 1 AS DOUBLE) / CAST(n1 + v AS DOUBLE)) / 2.0)),
        |           12) AS DECIMAL(16,12)) AS contrib,
        |         n0, n1, v
        |  FROM g CROSS JOIN tot
        |)
        |SELECT max(n0) AS n_tokens_a, max(n1) AS n_tokens_b, max(v) AS vocab,
        |       round(CAST(sum(contrib) AS DOUBLE), 6) AS jsd
        |FROM per""".stripMargin,

    "text_novelty" ->
      s"""WITH tk AS (
         |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS t
         |  FROM documents
         |), g AS (
         |  SELECT DISTINCT doc_id,
         |         ('0x' || substring(md5(array_to_string(t[i:i+${NoveltyN - 1}], ' ')), 1, 15))::BIGINT AS gh
         |  FROM (SELECT doc_id, t,
         |               unnest(range(1, greatest(len(t) - ${NoveltyN - 2}, 1))) AS i
         |        FROM tk)
         |), f AS (
         |  SELECT gh, min(doc_id) AS fd FROM g GROUP BY gh
         |)
         |SELECT g.doc_id, count(*) AS n_grams,
         |       count(CASE WHEN f.fd = g.doc_id THEN 1 END) AS n_novel,
         |       round(CAST(count(CASE WHEN f.fd = g.doc_id THEN 1 END) AS DOUBLE) /
         |             CAST(count(*) AS DOUBLE), 6) AS novelty
         |FROM g JOIN f USING (gh)
         |GROUP BY g.doc_id""".stripMargin)
}
