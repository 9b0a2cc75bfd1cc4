package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}

/** Token-statistics / language-model readouts over `documents`, split out
  * of [[TextAnalysisQueries]] (r13 — the 1,000-line pack-file
  * discipline, the InferenceQueries precedent; keys and oracles
  * unchanged): unigram and bigram log-probability scoring, PMI
  * collocations, and the Zipf-law fit. The tokenizer conventions
  * (`cleanTokens`) stay in [[TextAnalysisQueries]] as the single source
  * of the corpus token model.
  */
object TokenStatsQueries extends QueryPack {

  import TextAnalysisQueries.cleanTokens

  private def docs(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Unigram-LM fluency scoring (KenLM stand-in): each token's
    // corpus-level log-probability, averaged per document — low scores
    // flag gibberish/OOV-heavy docs. The per-doc sum goes through a
    // 9-decimal DECIMAL so the order-dependent double sum cannot flake
    // the cross-engine compare (Det's discipline, applied to computed
    // logs). Two shuffles at any scale (vocab agg + per-doc agg); the
    // vocab side of the token join carries plan stats, so AQE broadcasts
    // it while it fits and falls back to a shuffle join for the 1e8-term
    // vocab a 100 TB corpus would have — no hardcoded hint.
    "text_unigram_logprob" -> ((s, d) => {
      val tok = docs(s, d)
        .select(col("doc_id"), explode(cleanTokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
        .transform(graft.CacheScope.persisted(_))
      val vocab = tok.groupBy("tok").agg(count(lit(1)).as("n"))
      val total = vocab.agg(sum(col("n")).as("total"))
      val lp = round(log(col("n").cast("double") / col("total").cast("double")), 9)
        .cast(org.apache.spark.sql.types.DecimalType(18, 9))
      tok.join(vocab, Seq("tok"))
        .crossJoin(broadcast(total))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(lp).as("sum_lp"))
        .select(col("doc_id"), col("n_tokens"),
          round(col("sum_lp").cast("double") / col("n_tokens"), 6)
            .as("avg_logprob"))
    }),

    // Bigram-LM fluency scoring — the unigram model's next notch: each
    // token's log-probability CONDITIONED on its predecessor,
    // P(w2|w1) = n(w1,w2)/n(w1,·), averaged per document. Catches
    // scrambled-but-common-words text that the unigram score rates
    // fluent. Same decimal discipline as text_unigram_logprob. Scale
    // shape: one bigram explode feeds the pair-vocab agg; the w1
    // marginal derives from the pair vocab (vocab-sized input, not a
    // second corpus pass), and the two scoring joins are AQE-gated
    // broadcasts while the vocab fits. Docs with < 2 clean tokens have
    // no bigrams and drop out in both engines.
    "text_bigram_logprob" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 9)
      // tokens materialized as their own projection (Shingles discipline:
      // inlining the split into the lambda re-runs it per element_at).
      val bg = docs(s, d)
        .select(col("doc_id"),
          filter(cleanTokens(col("text")), x => x =!= "").as("tk"))
        .filter(size(col("tk")) >= 2)
        .select(col("doc_id"), explode(transform(
          sequence(lit(1), size(col("tk")) - 1),
          i => struct(element_at(col("tk"), i).as("w1"),
            element_at(col("tk"), i + 1).as("w2")))).as("b"))
        .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
        .transform(graft.CacheScope.persisted(_))
      val v2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
        .transform(graft.CacheScope.persisted(_))
      val v1 = v2.groupBy("w1").agg(sum(col("n2")).as("n1"))
      val lp = round(log(col("n2").cast("double") / col("n1").cast("double")), 9)
        .cast(dec)
      bg.join(v2, Seq("w1", "w2"))
        .join(v1, Seq("w1"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_bigrams"), sum(lp).as("slp"))
        .select(col("doc_id"), col("n_bigrams"),
          round(col("slp").cast("double") / col("n_bigrams"), 6)
            .as("avg_logprob"))
    }),

    // Pointwise-mutual-information collocation ranking: the bigrams most
    // over-represented vs their unigrams' independence baseline — the
    // classic multi-word-expression detector ("new york" scores, "of the"
    // doesn't). pmi = ln(p(w1 w2) / (p(w1) p(w2))) over exact integer
    // counts; a min-count gate of 5 kills the hapax noise PMI is famous
    // for. Scale shape: two corpus-sized count shuffles (bigram + unigram
    // vocab), equi-joins on the word keys, corpus totals as a broadcast
    // 1-row aggregate, top-50 via TakeOrderedAndProject under a total
    // order (rounded pmi, then the pair).
    "text_pmi_collocations" -> ((s, d) => {
      val tk = docs(s, d)
        .select(col("doc_id"),
          filter(cleanTokens(col("text")), x => x =!= "").as("tk"))
        .transform(graft.CacheScope.persisted(_))
      val bg = tk.filter(size(col("tk")) >= 2)
        .select(explode(transform(
          sequence(lit(1), size(col("tk")) - 1),
          i => struct(element_at(col("tk"), i).as("w1"),
            element_at(col("tk"), i + 1).as("w2")))).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
        .transform(graft.CacheScope.persisted(_))
      val v2 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("n2"))
      val uni = tk.select(explode(col("tk")).as("w"))
        .groupBy("w").agg(count(lit(1)).as("nu"))
        .transform(graft.CacheScope.persisted(_))
      val totals = bg.agg(count(lit(1)).as("nb"))
        .crossJoin(broadcast(uni.agg(sum(col("nu")).as("ntok"))))
      val pmi = round(log(
        (col("n2").cast("double") * col("ntok").cast("double") *
          col("ntok").cast("double")) /
          (col("nb").cast("double") * col("nu1").cast("double") *
            col("nu2").cast("double"))), 9)
      v2.filter(col("n2") >= 5)
        .join(uni.select(col("w").as("w1"), col("nu").as("nu1")), "w1")
        .join(uni.select(col("w").as("w2"), col("nu").as("nu2")), "w2")
        .crossJoin(broadcast(totals))
        .select(col("w1"), col("w2"), col("n2"), pmi.as("pmi"))
        .orderBy(col("pmi").desc, col("w1").asc, col("w2").asc)
        .limit(50)
    }),

    // Zipf-law fit over the corpus vocabulary: OLS slope of ln(freq) vs
    // ln(rank) for the top-200 terms. A healthy natural-language corpus
    // sits near slope -1; a scrape full of boilerplate or spam drifts off
    // it, so this is a one-row corpus-health gauge. Scale shape: the freq
    // relation is one shuffled agg, top-200 is TakeOrderedAndProject (no
    // global window — PlanAuditSpec bans those), and the rank is computed
    // by a broadcast self-join on the CONSTANT-size top-k relation.
    // Determinism: per-element round(ln, 9) into exact decimals before any
    // sum, the same discipline as text_unigram_logprob.
    "text_zipf" -> ((s, d) => {
      val dec = org.apache.spark.sql.types.DecimalType(18, 9)
      val top = docs(s, d)
        .select(explode(cleanTokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
        .groupBy("tok").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("tok").asc).limit(200)
      val other = top.select(col("tok").as("tok2"), col("n").as("n2"))
      val ranked = top.join(broadcast(other),
          (col("n2") > col("n")) ||
            (col("n2") === col("n") && col("tok2") < col("tok")), "left")
        .groupBy(col("tok"), col("n"))
        .agg((count(col("tok2")) + 1).as("rank"))
      val x = round(log(col("rank").cast("double")), 9).cast(dec)
      val y = round(log(col("n").cast("double")), 9).cast(dec)
      val sums = ranked.agg(
        count(lit(1)).cast("double").as("m"),
        sum(x).cast("double").as("sx"), sum(y).cast("double").as("sy"),
        sum(x * y).cast("double").as("sxy"), sum(x * x).cast("double").as("sxx"))
      val slope = (col("m") * col("sxy") - col("sx") * col("sy")) /
        (col("m") * col("sxx") - col("sx") * col("sx"))
      sums.select(col("m").cast("long").as("n_terms"),
        round(slope, 6).as("slope"),
        round((col("sy") - slope * col("sx")) / col("m"), 6).as("intercept"))
    }),
  )

  override val oracles: Map[String, String] = Map(
    "text_unigram_logprob" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +')) AS tok
        |  FROM documents
        |), tok2 AS (
        |  SELECT doc_id, tok FROM tok WHERE tok <> ''
        |), vocab AS (
        |  SELECT tok, count(*) AS n FROM tok2 GROUP BY tok
        |), total AS (
        |  SELECT sum(n) AS total FROM vocab
        |)
        |SELECT t.doc_id, count(*) AS n_tokens,
        |       round(CAST(sum(CAST(round(ln(CAST(v.n AS DOUBLE) / CAST(s.total AS DOUBLE)), 9)
        |                          AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6)
        |         AS avg_logprob
        |FROM tok2 t JOIN vocab v ON v.tok = t.tok CROSS JOIN total s
        |GROUP BY t.doc_id""".stripMargin,

    "text_bigram_logprob" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +'),
        |                     x -> x <> '') AS tk
        |  FROM documents
        |), bg AS (
        |  SELECT doc_id,
        |         unnest(list_transform(range(1, len(tk)),
        |                i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))) AS b
        |  FROM toks WHERE len(tk) >= 2
        |), bg2 AS (
        |  SELECT doc_id, b.w1 AS w1, b.w2 AS w2 FROM bg
        |), v2 AS (
        |  SELECT w1, w2, count(*) AS n2 FROM bg2 GROUP BY 1, 2
        |), v1 AS (
        |  SELECT w1, sum(n2) AS n1 FROM v2 GROUP BY 1
        |)
        |SELECT t.doc_id, count(*) AS n_bigrams,
        |       round(CAST(sum(CAST(round(ln(CAST(v.n2 AS DOUBLE) / CAST(o.n1 AS DOUBLE)), 9)
        |                          AS DECIMAL(18,9))) AS DOUBLE) / count(*), 6)
        |         AS avg_logprob
        |FROM bg2 t
        |JOIN v2 v ON v.w1 = t.w1 AND v.w2 = t.w2
        |JOIN v1 o ON o.w1 = t.w1
        |GROUP BY t.doc_id""".stripMargin,

    "text_pmi_collocations" ->
      """WITH toks AS (
        |  SELECT doc_id,
        |         list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +'),
        |                     x -> x <> '') AS tk
        |  FROM documents
        |), bg AS (
        |  SELECT unnest(list_transform(range(1, len(tk)),
        |                i -> struct_pack(w1 := tk[i], w2 := tk[i+1]))) AS b
        |  FROM toks WHERE len(tk) >= 2
        |), bg2 AS (
        |  SELECT b.w1 AS w1, b.w2 AS w2 FROM bg
        |), v2 AS (
        |  SELECT w1, w2, count(*) AS n2 FROM bg2 GROUP BY 1, 2
        |), uni AS (
        |  SELECT unnest(tk) AS w FROM toks
        |), v1 AS (
        |  SELECT w, count(*) AS nu FROM uni GROUP BY 1
        |), tot AS (
        |  SELECT (SELECT count(*) FROM bg2) AS nb,
        |         (SELECT count(*) FROM uni) AS ntok
        |)
        |SELECT v2.w1, v2.w2, v2.n2,
        |       round(ln((CAST(v2.n2 AS DOUBLE) * CAST(ntok AS DOUBLE) * CAST(ntok AS DOUBLE)) /
        |                (CAST(nb AS DOUBLE) * CAST(a.nu AS DOUBLE) * CAST(b.nu AS DOUBLE))), 9) AS pmi
        |FROM v2
        |JOIN v1 a ON a.w = v2.w1
        |JOIN v1 b ON b.w = v2.w2, tot
        |WHERE v2.n2 >= 5
        |ORDER BY pmi DESC, v2.w1 ASC, v2.w2 ASC
        |LIMIT 50""".stripMargin,

    "text_zipf" ->
      """WITH tok AS (
        |  SELECT unnest(string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +')) AS tok
        |  FROM documents
        |), freq AS (
        |  SELECT tok, count(*) AS n FROM tok WHERE tok <> '' GROUP BY tok
        |), top AS (
        |  SELECT tok, n FROM freq ORDER BY n DESC, tok LIMIT 200
        |), ranked AS (
        |  SELECT tok, n, row_number() OVER (ORDER BY n DESC, tok) AS rank FROM top
        |), t AS (
        |  SELECT CAST(round(ln(CAST(rank AS DOUBLE)), 9) AS DECIMAL(18,9)) AS x,
        |         CAST(round(ln(CAST(n AS DOUBLE)), 9) AS DECIMAL(18,9)) AS y
        |  FROM ranked
        |), s AS (
        |  SELECT CAST(count(*) AS DOUBLE) AS m,
        |         CAST(sum(x) AS DOUBLE) AS sx, CAST(sum(y) AS DOUBLE) AS sy,
        |         CAST(sum(x*y) AS DOUBLE) AS sxy, CAST(sum(x*x) AS DOUBLE) AS sxx
        |  FROM t
        |)
        |SELECT CAST(m AS BIGINT) AS n_terms,
        |       round((m*sxy - sx*sy) / (m*sxx - sx*sx), 6) AS slope,
        |       round((sy - ((m*sxy - sx*sy)/(m*sxx - sx*sx))*sx) / m, 6) AS intercept
        |FROM s""".stripMargin
  )
}
