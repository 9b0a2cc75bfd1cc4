package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}

/** Text-analysis operators for the training-data pipeline north star:
  * language ID (stopword-hit heuristic), quality scoring, token counting
  * (whitespace + BPE-ish regex), and document fingerprinting. All pure
  * codegen'd column expressions — the stopword-hit count is a custom
  * codegen expression ([[graft.functions.CountInSet]], one hash probe per
  * token), so the whole scoring projection is one fused narrow map stage
  * over documents at any scale — and each mirrored in DuckDB SQL.
  */
object TextAnalysisQueries extends QueryPack {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "documents")

  /** BPE-ish pre-tokenizer: letter runs, single digits, punctuation runs. */
  val BpePattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]+"

  /** Feature-hashing vector width (2^6; production uses 2^18-2^20 — the
    * same expression with one constant changed).
    */
  val FeatureHashBuckets = 64

  private def wsTokens(c: Column): Column = split(c, "\\s+")

  /** Lowercased letter-only tokens (the reference's cleaning pipeline). */
  private[text] def cleanTokens(c: Column): Column =
    split(regexp_replace(lower(c), "[^a-z ]", ""), " +")

  private[text] def countIn(toks: Column, set: Seq[String]): Column =
    graft.functions.CountInSet.countIn(toks, set)

  /** Arrival batches for the Heaps'-law vocabulary-growth fit. */
  val HeapsBuckets = 8

  /** Character-class count via delete-and-diff (portable to any engine). */
  private def charClassCount(text: Column, keepPattern: String): Column =
    length(text) - length(regexp_replace(text, keepPattern, ""))

  /** The composite quality score in [0, 1], rounded to 6 — shared by
    * text_quality (per-doc profile), text_quality_deciles (global rank),
    * and dedup.DedupQueries' dedup_keep_best (cluster canonicalization).
    * Weights: length 0.4, stopword density 0.4, punctuation 0.2.
    *
    * The punctuation denominator is greatest(n_chars, 1) — an EMPTY
    * document would otherwise score 0/0 = NaN, which Spark's non-ANSI
    * BIGINT cast folds to 0 while DuckDB's cast ERRORS, crashing any
    * verify run on a corpus containing one blank doc (and NaN ordering
    * is engine-ambiguous besides). The guard changes no value for any
    * non-empty document; every SQL twin carries the same greatest().
    */
  def qualityScore: Column = {
    val text = col("text")
    val nChars = length(text).cast("double")
    val nTok = size(wsTokens(text)).cast("double")
    val punct = charClassCount(text, "[^A-Za-z0-9\\s]").cast("double")
    val stops = countIn(cleanTokens(text), Stopwords.reachable.filter(_.nonEmpty))
      .cast("double")
    val stopRatio = stops / size(cleanTokens(text))
    round(
      least(nTok / 100.0, lit(1.0)) * 0.4 +
        least(stopRatio * 4.0, lit(1.0)) * 0.4 +
        (lit(1.0) - least(punct / greatest(nChars, lit(1.0)) * 10.0, lit(1.0))) * 0.2, 6)
  }

  /** SQL twin of [[qualityScore]] as a CTE body named `qscore`:
    * (doc_id, quality_score) over `documents`. Mirrors the text_quality
    * oracle's arithmetic exactly; consumed by dedup_keep_best's oracle.
    */
  lazy val qualityScoreCte: String =
    s"""qscore AS (
       |  SELECT doc_id,
       |         round(least(n_tok / 100.0, 1.0) * 0.4 +
       |               least(stops / n_clean * 4.0, 1.0) * 0.4 +
       |               (1.0 - least(punct / greatest(n_chars, 1.0) * 10.0, 1.0)) * 0.2, 6) AS quality_score
       |  FROM (
       |    SELECT doc_id,
       |           CAST(length(text) AS DOUBLE) AS n_chars,
       |           CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS n_tok,
       |           CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) AS punct,
       |           CAST(len(list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +'),
       |                                x -> x IN $stopList)) AS DOUBLE) AS stops,
       |           len(string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +')) AS n_clean
       |    FROM documents
       |  )
       |)""".stripMargin

  /** Base offsets for the distributed bucketed prefix sum (shared by
    * text_quality_deciles, text_budget_select, and text_pack_sequences'
    * shard offsets — one implementation so the three cannot drift):
    * for each bucket of `totals` (`key`, t), the sum of `t` over buckets
    * strictly EARLIER in the traversal direction. `totals` is
    * constant-size by construction (fixed micro-score ranges or a fixed
    * shard count), so the triangular self-join never scales with data.
    */
  private[graft] def prefixBases(totals: DataFrame, key: String,
      desc: Boolean): DataFrame = {
    val earlier =
      if (desc) col(s"o.$key") > col(s"b.$key")
      else col(s"o.$key") < col(s"b.$key")
    totals.as("b").join(totals.as("o"), earlier, "left")
      .groupBy(col(s"b.$key").as(key))
      .agg(coalesce(sum(col("o.t")), lit(0L)).as("base"))
  }

  /** Micro-score bucket width for text_quality_deciles: the micro-score is
    * bounded in [0, 10^6], and a width of floor(10^6 / 64) + 1 = 15626
    * maps it onto buckets 0..63 — a constant-size offsets relation at any
    * scale. (15625 would also be correct but puts the single value 10^6
    * into its own 65th bucket.)
    */
  val MuBlock = 15626

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Language ID: fraction of tokens that are English stopwords.
    "text_langid" -> ((s, d) => {
      val toks = cleanTokens(col("text"))
      val nTok = size(toks)
      val hits = countIn(toks, Stopwords.reachable.filter(_.nonEmpty))
      docs(s, d).select(
        col("doc_id"),
        nTok.as("n_tokens"),
        round(hits.cast("double") / nTok, 6).as("stop_ratio"),
        when(hits.cast("double") / nTok >= 0.15, "en").otherwise("unknown")
          .as("pred_lang"))
    }),

    // Classifier evaluation: confusion matrix of the langid heuristic
    // against the gold lang labels — the QA step after any classifier
    // pass over a corpus. Narrow scoring scan + one tiny aggregation
    // (|langs| x |preds| cells at any corpus size).
    "text_langid_eval" -> ((s, d) => {
      val toks = cleanTokens(col("text"))
      val hits = countIn(toks, Stopwords.reachable.filter(_.nonEmpty))
      docs(s, d)
        .select(col("lang"),
          when(hits.cast("double") / size(toks) >= 0.15, "en")
            .otherwise("unknown").as("pred_lang"))
        .groupBy(col("lang"), col("pred_lang"))
        .agg(count(lit(1)).as("n"))
    }),

    // Quality score: length/punctuation/digit/stopword signals combined in
    // a fixed-order double formula (identical arithmetic in both engines).
    "text_quality" -> ((s, d) => {
      val text = col("text")
      val nChars = length(text).cast("double")
      val toks = wsTokens(text)
      val nTok = size(toks).cast("double")
      val punct = charClassCount(text, "[^A-Za-z0-9\\s]").cast("double")
      val digits = charClassCount(text, "[^0-9]").cast("double")
      val stops = countIn(cleanTokens(text), Stopwords.reachable.filter(_.nonEmpty))
        .cast("double")
      val stopRatio = stops / size(cleanTokens(text))
      docs(s, d).select(
        col("doc_id"),
        nChars.cast("long").as("n_chars"),
        nTok.cast("long").as("n_tokens"),
        round(punct / greatest(nChars, lit(1.0)), 6).as("punct_ratio"),
        round(digits / greatest(nChars, lit(1.0)), 6).as("digit_ratio"),
        round(stopRatio, 6).as("stop_ratio"),
        qualityScore.as("quality_score"))
    }),

    // Heaps'-law fit V(n) ≈ K·n^β of vocabulary growth — the corpus
    // statistic that predicts how much NEW vocabulary another 10× of
    // data buys (β≈0.5 typical English; β→1 means unbounded novelty,
    // β→0 means the corpus has saturated — a dedup/quality smell).
    // Docs land in HeapsBuckets md5-hash "arrival batches"; a term's
    // first appearance is its min bucket, so cumulative vocabulary per
    // prefix is one bounded prefix join over a |buckets|-row relation —
    // never a sequential scan. The log-log OLS runs on round(,6)-pinned
    // DECIMAL moment sums of the |buckets| points.
    "text_heaps" -> ((s, d) => {
      val tok = docs(s, d)
        .select(col("doc_id"), explode(cleanTokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
        .withColumn("bucket",
          pmod(conv(substring(md5(col("doc_id").cast("string")), 1, 6), 16, 10)
            .cast("long"), lit(HeapsBuckets.toLong)) + 1)
        .transform(graft.CacheScope.persisted(_))
      val nPerB = tok.groupBy("bucket").agg(count(lit(1)).as("nt"))
      val vPerB = tok.groupBy("term").agg(min(col("bucket")).as("fb"))
        .groupBy("fb").agg(count(lit(1)).as("nv"))
      val grid = docs(s, d).limit(1)
        .select(explode(expr(s"sequence(1, $HeapsBuckets)")).as("p"))
      val pts = grid
        .join(nPerB, col("bucket") <= col("p"))
        .groupBy("p").agg(sum(col("nt")).as("n_cum"))
        .join(grid.join(vPerB, col("fb") <= col("p"))
          .groupBy(col("p").as("p2")).agg(sum(col("nv")).as("v_cum")),
          col("p") === col("p2"))
        .select(col("p"), col("n_cum"), col("v_cum"),
          round(log(col("n_cum").cast("double")), 6)
            .cast(DecimalType(12, 6)).as("x"),
          round(log(col("v_cum").cast("double")), 6)
            .cast(DecimalType(12, 6)).as("y"))
      val m = pts.agg(count(lit(1)).as("np"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"), sum(col("x") * col("y")).as("sxy"),
        max(col("n_cum")).as("n_tokens"), max(col("v_cum")).as("n_terms"))
      val beta = (col("np").cast("double") * col("sxy").cast("double") -
        col("sx").cast("double") * col("sy").cast("double")) /
        (col("np").cast("double") * col("sxx").cast("double") -
          col("sx").cast("double") * col("sx").cast("double"))
      m.select(col("n_tokens").cast("long").as("n_tokens"),
        col("n_terms").cast("long").as("n_terms"),
        round(beta, 6).as("beta"),
        round(exp((col("sy").cast("double") - beta * col("sx").cast("double")) /
          col("np").cast("double")), 6).as("k"))
    }),

    // Flesch reading-ease per document — the classic readability gate a
    // curriculum or quality filter applies next to text_quality's ratio
    // score: 206.835 − 1.015·(words/sentences) − 84.6·(syllables/words).
    // Sentences = terminator characters, syllables ≈ vowel GROUPS (the
    // standard regex surrogate) — both exact integer counts via the
    // delete-and-diff / split-count tricks that hold in both engines;
    // the formula assembles in identical doubles. One narrow projection,
    // zero shuffle.
    "text_readability" -> ((s, d) => {
      val text = col("text")
      val words = size(wsTokens(text)).cast("double")
      val sents = greatest(
        charClassCount(text, "[^.!?]").cast("double"), lit(1.0))
      val syll = greatest(
        (size(split(lower(text), "[aeiouy]+")) - 1).cast("double"), lit(1.0))
      docs(s, d)
        .filter(size(wsTokens(text)) > 0)
        .select(col("doc_id"),
          words.cast("long").as("n_words"),
          sents.cast("long").as("n_sentences"),
          syll.cast("long").as("n_syllables"),
          round(lit(206.835) - lit(1.015) * (words / sents) -
            lit(84.6) * (syll / words), 6).as("flesch"))
    }),

    // Per-document CHARACTER entropy — the gibberish/boilerplate signal
    // the ratio-based quality score can't see (keyboard mash has normal
    // length and punctuation but collapsed entropy; base64 blobs spike
    // it). H = ln n − (Σ c·ln c)/n from exact per-char counts. ZERO
    // shuffle: counts come from run lengths over the row's own sorted
    // char array (sort → boundary positions → zip_with gaps), so the
    // whole query is one narrow codegen map at any corpus size —
    // measured 4.3s (char explode + (doc, char) shuffle) -> narrow at
    // sf0.1. Exactness across formulations: each run's c·ln c is
    // round(,9)-pinned and accumulated in DECIMAL(24,9) — decimal
    // addition is exact, so the fold equals the oracle's grouped DECIMAL
    // sum of the identical terms no matter how either side orders them.
    "text_char_entropy" -> ((s, d) =>
      docs(s, d)
        // Empty documents emit NO row, matching the oracle's
        // generate_series(1, 0) elision — and an empty cs would make the
        // boundary filter probe element_at(cs, 0), which errors (SQL
        // arrays are 1-indexed).
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), length(col("text")).as("n"),
          expr("array_sort(filter(split(text, ''), x -> x != ''))").as("cs"))
        .withColumn("bnd", expr(
          """filter(sequence(1, size(cs)),
            |  i -> i = 1 OR element_at(cs, i) != element_at(cs, greatest(i - 1, 1)))"""
            .stripMargin))
        .withColumn("runs", expr(
          """zip_with(bnd,
            |  concat(slice(bnd, 2, size(bnd) - 1), array(size(cs) + 1)),
            |  (a, b) -> b - a)""".stripMargin))
        .withColumn("sclnc", expr(
          """aggregate(runs, CAST(0 AS DECIMAL(24,9)),
            |  (a, c) -> CAST(a + CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 9)
            |                          AS DECIMAL(24,9)) AS DECIMAL(24,9)))""".stripMargin))
        .select(col("doc_id"), col("n").cast("long").as("n_chars"),
          size(col("bnd")).cast("long").as("n_distinct_chars"),
          round(log(col("n").cast("double")) -
            col("sclnc").cast("double") / col("n").cast("double"), 6)
            .as("entropy"))),

    // Global quality DECILES — exact corpus-wide rank by score, computed
    // with the same distributed machinery as text_pack_sequences' prefix
    // sum, generalized from "order by doc_id" to "order by a computed
    // key": the sort key is the integer micro-score, buckets are fixed
    // ranges of it (the score is bounded, so the bucket relation is
    // constant-size by construction — no max() pre-pass needed), bucket
    // counts give base offsets via the constant-size triangular join, and
    // ranking is a bucket-PARTITIONED row_number. This is exact global
    // ntile at any corpus scale with no global sort — the "drop the
    // bottom decile" curation op, where text_quality_filter's
    // percentile-threshold variant trims by a precomputed scalar instead.
    "text_quality_deciles" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val m = docs(s, d)
        .select(col("doc_id"), qualityScore.as("quality_score"))
        .select(col("doc_id"), col("quality_score"),
          expr("CAST(round(quality_score * 1000000.0) AS BIGINT)").as("mu"))
        .withColumn("bkt", expr(s"mu div $MuBlock"))
        .transform(graft.CacheScope.persisted(_))
      val totals = m.groupBy("bkt").agg(count(lit(1)).as("t"))
      val bases = prefixBases(totals, "bkt", desc = false)
      val nTotal = totals.agg(sum(col("t")).as("n"))
      m.join(broadcast(bases), "bkt")
        .crossJoin(broadcast(nTotal))
        .withColumn("global_rank",
          col("base") + row_number().over(
            Window.partitionBy("bkt").orderBy(col("mu"), col("doc_id"))))
        .select(col("doc_id"), col("quality_score"),
          col("global_rank").cast("long").as("global_rank"),
          expr("((global_rank - 1) * 10) div n").as("decile"))
    }),

    // Quantile-threshold corpus filter: keep documents whose token count
    // sits between the corpus P10 and P90 — the standard "trim the tails"
    // hygiene pass before training. The thresholds are ONE row (exact
    // interpolated percentile, proven bit-identical to DuckDB's
    // quantile_cont by q_percentile), broadcast into the filter — at
    // 100 TB this is an agg to a scalar plus one narrow filter pass, never
    // a sort of the corpus.
    "text_quality_filter" -> ((s, d) => {
      val m = docs(s, d).select(col("doc_id"), col("lang"), col("source"),
        size(wsTokens(col("text"))).cast("double").as("n_tok"))
      val th = m.agg(
        expr("percentile(n_tok, 0.10)").as("lo"),
        expr("percentile(n_tok, 0.90)").as("hi"))
      m.join(broadcast(th),
          col("n_tok") >= col("lo") && col("n_tok") <= col("hi"))
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_tok").cast("long").as("n_tokens"))
    }),

    // Token counting: whitespace tokens vs BPE-ish subword count.
    "text_tokencount" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        col("n_chars"),
        size(wsTokens(col("text"))).as("ws_tokens"),
        size(regexp_extract_all(col("text"), lit(BpePattern), lit(0)))
          .as("bpe_tokens"))),

    // Corpus-level word bigram counts, top 50 (ml.feature.NGram-shaped
    // output without the ML pipeline ceremony: explode 2-grams, count,
    // TakeOrderedAndProject).
    "text_ngram_counts" -> ((s, d) => {
      val toks = split(lower(col("text")), "\\s+")
      docs(s, d)
        .select(toks.as("tk"))
        .select(explode(when(size(col("tk")) < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(col("tk")) - 1),
            i => concat_ws(" ", element_at(col("tk"), i), element_at(col("tk"), i + 1)))))
          .as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("n"))
        .orderBy(col("n").desc, col("bigram").asc)
        .limit(50)
    }),

    // Inverted-index build (the search/retrieval primitive): term ->
    // document frequency + the posting list's first 32 doc ids. One
    // distinct (term, doc) relation, one aggregation; the posting list is
    // numerically sorted then joined to a string so the hash compare is
    // order-stable. At 100 TB posting lists are sharded by doc-id range
    // (the group key becomes (term, shard)) — the truncation here stands
    // where a shard boundary would; df stays exact and global.
    "text_inverted_index" -> ((s, d) => {
      docs(s, d)
        .select(col("doc_id"), explode(cleanTokens(col("text"))).as("term"))
        .filter(col("term") =!= "")
        .distinct()
        .groupBy("term")
        .agg(count(lit(1)).as("df"),
          array_join(transform(slice(array_sort(collect_list(col("doc_id"))), 1, 32),
            x => x.cast("string")), ",").as("postings"))
    }),

    // Sliding-window token chunking (training-data prep): 32-token
    // chunks, stride 16 (50% overlap — sized to the testdata's ~100-token
    // docs so the multi-chunk path is actually exercised; a production
    // 512/256 config is the same expression with two constants changed),
    // so no context is lost at chunk
    // boundaries and every token lands in <= 2 chunks. One narrow
    // map + explode — no shuffle at any scale; chunk text is re-joined
    // with single spaces (the whitespace tokenizer's inverse, canonical
    // for tokenizer-ready shards).
    "text_chunk" -> ((s, d) =>
      docs(s, d)
        .select(col("doc_id"), wsTokens(col("text")).as("tk"))
        .select(col("doc_id"), col("tk"),
          when(size(col("tk")) <= 32, lit(1))
            .otherwise(ceil((size(col("tk")) - 32).cast("double") / 16.0)
              .cast("int") + 1).as("n_chunks"))
        .select(col("doc_id"),
          explode(sequence(lit(0), col("n_chunks") - 1)).as("chunk_id"),
          col("tk"))
        .select(col("doc_id"), col("chunk_id"),
          slice(col("tk"), col("chunk_id") * 16 + 1, lit(32)).as("ck"))
        .select(col("doc_id"), col("chunk_id"),
          size(col("ck")).as("n_tokens"),
          concat_ws(" ", col("ck")).as("chunk_text"))),

    // Fingerprint: MIN over the 60-bit word-3-gram shingle hashes — a
    // MinHash-1 content fingerprint, stable under reordering-free edits
    // far from the minimum. Rides the shared int64 shingle relation (the
    // relation is already distinct, so a plain count sizes it).
    "text_fingerprint" -> ((s, d) => {
      import graft.dedup.Shingles
      Shingles.docShingles(docs(s, d))
        .groupBy("doc_id")
        .agg(min(col("h")).as("fingerprint"),
          count(lit(1)).as("n_shingles"))
    }),

    // Hashing-trick (signed feature hashing) document vectors: token →
    // bucket h mod 64 with a ±1 sign from the hash's 7th bit, summed per
    // (doc, bucket) — the vocabulary-FREE featurizer (Weinberger et al.)
    // that replaces a build-vocab + broadcast-dictionary pass with pure
    // per-row arithmetic. That is precisely what survives 100 TB: no
    // driver-side vocabulary, no dictionary join, just one narrow
    // hash/explode scan into one (doc, bucket)-keyed partial-aggregating
    // reduce, with the fixed bucket width bounding the output at
    // docs × 64 whatever the corpus vocabulary does. Zero-sum buckets
    // (sign cancellation) are dropped on both sides — the sparse-vector
    // contract. Hash = the portable 60-bit md5 (Shingles.hash60), never
    // an engine-seeded murmur.
    "text_feature_hash" -> ((s, d) => {
      import graft.dedup.Shingles
      docs(s, d)
        .select(col("doc_id"), explode(cleanTokens(col("text"))).as("tok"))
        .filter(col("tok") =!= "")
        .select(col("doc_id"), Shingles.hash60(col("tok")).as("h"))
        .select(col("doc_id"), (col("h") % FeatureHashBuckets).cast("int").as("bucket"),
          when(expr(s"(h div $FeatureHashBuckets) % 2") === 0, 1L)
            .otherwise(-1L).as("sgn"))
        .groupBy("doc_id", "bucket")
        .agg(sum(col("sgn")).as("w"))
        .filter(col("w") =!= 0)
    }),

    // The COMPOSED C4-style cleaning pipeline — what a training-data run
    // actually executes: language gate (stopword-hit heuristic) + quality
    // gate + exact dedup (keep min doc_id), one narrow scoring scan and
    // one dedup shuffle. Survivor stats out.
    "text_clean_pipeline" -> ((s, d) => {
      val text = col("text")
      val nChars = length(text).cast("double")
      val toks = wsTokens(text)
      val punct = charClassCount(text, "[^A-Za-z0-9\\s]").cast("double")
      val stops = countIn(cleanTokens(text), Stopwords.reachable.filter(_.nonEmpty))
        .cast("double")
      val stopRatio = stops / size(cleanTokens(text))
      val score =
        least(size(toks).cast("double") / 100.0, lit(1.0)) * 0.4 +
          least(stopRatio * 4.0, lit(1.0)) * 0.4 +
          (lit(1.0) - least(punct / greatest(nChars, lit(1.0)) * 10.0, lit(1.0))) * 0.2
      // barrier: without it PushPredicateThroughProject inlines the full
      // scoring expressions into the Filter and the projection re-evaluates
      // them — the heavy stopword stage runs twice per row. persist: scored
      // feeds BOTH the dedup-keep aggregate and the output join; without
      // pinning, the whole scoring scan runs once per branch. Together:
      // one scoring pass (measured 4.5x at sf0.1).
      // The content hash is computed BEFORE the persist so the cache holds
      // a 32-char digest, not the document text — at 100 TB the cached
      // survivor relation is metadata-sized.
      import graft.sim.VecMath.barrier
      val scored = docs(s, d)
        .select(col("doc_id"), col("source"), md5(text).as("k"),
          size(toks).cast("long").as("n_tokens"),
          barrier(round(score, 6)).as("quality_score"), barrier(stopRatio).as("sr"))
        .filter(col("sr") >= 0.15 && col("quality_score") >= 0.5)
        // eager: scored feeds the keep-aggregate AND the output join of
        // one action — racing AQE stage jobs would double-build the cache
        .transform(graft.CacheScope.persisted(_))
      val keep = scored
        .groupBy(col("k")).agg(min(col("doc_id")).as("doc_id"))
      scored
        .join(keep.select("doc_id"), Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("source"), col("n_tokens"),
          col("quality_score"))
    }),

    // Repetition metrics (the Gopher-rule quality signals) — body in
    // [[repetitionOf]] so specs can run it over planted corpora.
    "text_repetition" -> ((s, d) => repetitionOf(docs(s, d))),

  )

  /** Repetition metrics over any (doc_id, text) relation: duplicate token
    * mass, most-frequent-token share, duplicate bigram mass. Two cascaded
    * aggregations per granularity — the second one reads
    * already-aggregated (doc, gram) counts, tiny at any scale.
    */
  def repetitionOf(dd: DataFrame): DataFrame = {
    val toks = dd.select(col("doc_id"),
      explode(split(lower(col("text")), "\\s+")).as("tok"))
    val tstats = toks.groupBy("doc_id", "tok").agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg(sum("n").as("n_tokens"),
        count(lit(1)).as("n_distinct"), max("n").as("max_n"))
    val bg = dd
      .select(col("doc_id"), split(lower(col("text")), "\\s+").as("tk"))
      .select(col("doc_id"),
        explode(when(size(col("tk")) < 2, array().cast("array<string>"))
          .otherwise(transform(sequence(lit(1), size(col("tk")) - 1),
            i => concat_ws(" ", element_at(col("tk"), i), element_at(col("tk"), i + 1)))))
          .as("bg"))
    val bstats = bg.groupBy("doc_id", "bg").agg(count(lit(1)).as("n"))
      .groupBy("doc_id").agg(sum("n").as("nb"), count(lit(1)).as("ndb"))
    tstats.join(bstats, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        round(lit(1.0) - col("n_distinct").cast("double") / col("n_tokens"), 6)
          .as("dup_token_ratio"),
        round(col("max_n").cast("double") / col("n_tokens"), 6)
          .as("top_token_ratio"),
        when(col("nb").isNull, lit(0.0))
          .otherwise(round(lit(1.0) - col("ndb").cast("double") / col("nb"), 6))
          .as("dup_bigram_ratio"))
  }

  private[text] def stopList: String =
    Stopwords.reachable.filter(_.nonEmpty).map(w => s"'$w'").mkString("(", ", ", ")")

  override val oracles: Map[String, String] = Map(
    "text_langid_eval" ->
      s"""WITH t AS (
         |  SELECT lang,
         |         string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +') AS toks
         |  FROM documents
         |), m AS (
         |  SELECT lang,
         |         CASE WHEN CAST(len(list_filter(toks, x -> x IN $stopList)) AS DOUBLE) / len(toks) >= 0.15
         |              THEN 'en' ELSE 'unknown' END AS pred_lang
         |  FROM t
         |)
         |SELECT lang, pred_lang, count(*) AS n FROM m GROUP BY 1, 2""".stripMargin,

    "text_langid" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +') AS toks
         |  FROM documents
         |), m AS (
         |  SELECT doc_id, len(toks) AS n_tokens,
         |         len(list_filter(toks, x -> x IN $stopList)) AS hits
         |  FROM t
         |)
         |SELECT doc_id, CAST(n_tokens AS INT) AS n_tokens,
         |       round(CAST(hits AS DOUBLE) / n_tokens, 6) AS stop_ratio,
         |       CASE WHEN CAST(hits AS DOUBLE) / n_tokens >= 0.15
         |            THEN 'en' ELSE 'unknown' END AS pred_lang
         |FROM m""".stripMargin,

    "text_char_entropy" ->
      """WITH pos AS (
        |  SELECT doc_id, length(text) AS n, text,
        |         unnest(generate_series(1, length(text))) AS i
        |  FROM documents
        |), cc AS (
        |  SELECT doc_id, n, substr(text, CAST(i AS INT), 1) AS ch,
        |         count(*) AS c
        |  FROM pos GROUP BY 1, 2, 3
        |)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
        |       count(*) AS n_distinct_chars,
        |       round(ln(CAST(n AS DOUBLE)) -
        |             CAST(sum(CAST(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 9)
        |                           AS DECIMAL(24,9))) AS DOUBLE) /
        |             CAST(n AS DOUBLE), 6) AS entropy
        |FROM cc GROUP BY doc_id, n""".stripMargin,

    "text_heaps" ->
      s"""WITH tok AS (
         |  SELECT doc_id,
         |         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
         |           % $HeapsBuckets + 1 AS bucket,
         |         unnest(string_split_regex(
         |           regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +')) AS term
         |  FROM documents
         |), tk AS (SELECT * FROM tok WHERE term <> ''),
         |npb AS (SELECT bucket, count(*) AS nt FROM tk GROUP BY 1),
         |vpb AS (
         |  SELECT fb, count(*) AS nv FROM (
         |    SELECT term, min(bucket) AS fb FROM tk GROUP BY 1
         |  ) GROUP BY 1
         |), grid AS (SELECT unnest(generate_series(1, $HeapsBuckets)) AS p),
         |pts AS (
         |  SELECT g.p,
         |         (SELECT sum(nt) FROM npb WHERE bucket <= g.p) AS n_cum,
         |         (SELECT sum(nv) FROM vpb WHERE fb <= g.p) AS v_cum
         |  FROM grid g
         |), xy AS (
         |  SELECT p, n_cum, v_cum,
         |         CAST(round(ln(CAST(n_cum AS DOUBLE)), 6) AS DECIMAL(12,6)) AS x,
         |         CAST(round(ln(CAST(v_cum AS DOUBLE)), 6) AS DECIMAL(12,6)) AS y
         |  FROM pts
         |), m AS (
         |  SELECT count(*) AS np, sum(x) AS sx, sum(y) AS sy,
         |         sum(x * x) AS sxx, sum(x * y) AS sxy,
         |         max(n_cum) AS n_tokens, max(v_cum) AS n_terms
         |  FROM xy
         |)
         |SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
         |       CAST(n_terms AS BIGINT) AS n_terms,
         |       round((CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) -
         |              CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
         |             (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) -
         |              CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS beta,
         |       round(exp((CAST(sy AS DOUBLE) -
         |                  (CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE) -
         |                   CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
         |                  (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE) -
         |                   CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
         |                  CAST(sx AS DOUBLE)) /
         |                 CAST(np AS DOUBLE)), 6) AS k
         |FROM m""".stripMargin,

    "text_readability" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) AS words,
        |         greatest(CAST(length(text) -
        |           length(regexp_replace(text, '[^.!?]', '', 'g')) AS DOUBLE),
        |           1.0) AS sents,
        |         greatest(CAST(len(string_split_regex(lower(text), '[aeiouy]+')) - 1
        |           AS DOUBLE), 1.0) AS syll
        |  FROM documents
        |  WHERE len(string_split_regex(text, '\s+')) > 0
        |)
        |SELECT doc_id, CAST(words AS BIGINT) AS n_words,
        |       CAST(sents AS BIGINT) AS n_sentences,
        |       CAST(syll AS BIGINT) AS n_syllables,
        |       round(206.835 - 1.015 * (words / sents) - 84.6 * (syll / words),
        |             6) AS flesch
        |FROM m""".stripMargin,

    "text_quality" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |         CAST(length(text) AS DOUBLE) AS n_chars,
         |         CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS n_tok,
         |         CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) AS punct,
         |         CAST(length(text) - length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE) AS digits,
         |         CAST(len(list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +'),
         |                              x -> x IN $stopList)) AS DOUBLE) AS stops,
         |         len(string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +')) AS n_clean
         |  FROM documents
         |)
         |SELECT doc_id,
         |       CAST(n_chars AS BIGINT) AS n_chars,
         |       CAST(n_tok AS BIGINT) AS n_tokens,
         |       round(punct / greatest(n_chars, 1.0), 6) AS punct_ratio,
         |       round(digits / greatest(n_chars, 1.0), 6) AS digit_ratio,
         |       round(stops / n_clean, 6) AS stop_ratio,
         |       round(least(n_tok / 100.0, 1.0) * 0.4 +
         |             least(stops / n_clean * 4.0, 1.0) * 0.4 +
         |             (1.0 - least(punct / greatest(n_chars, 1.0) * 10.0, 1.0)) * 0.2, 6) AS quality_score
         |FROM m""".stripMargin,

    // Oracle ranks with the global window the Spark side deliberately
    // avoids (single-node DuckDB: exactly right there); equality proves
    // the bucketed distributed rank computes the same function.
    "text_quality_deciles" ->
      s"""WITH m AS (
         |  SELECT doc_id,
         |         CAST(length(text) AS DOUBLE) AS n_chars,
         |         CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS n_tok,
         |         CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) AS punct,
         |         CAST(len(list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +'),
         |                              x -> x IN $stopList)) AS DOUBLE) AS stops,
         |         len(string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +')) AS n_clean
         |  FROM documents
         |), q AS (
         |  SELECT doc_id,
         |         round(least(n_tok / 100.0, 1.0) * 0.4 +
         |               least(stops / n_clean * 4.0, 1.0) * 0.4 +
         |               (1.0 - least(punct / greatest(n_chars, 1.0) * 10.0, 1.0)) * 0.2, 6) AS quality_score
         |  FROM m
         |), r AS (
         |  SELECT doc_id, quality_score,
         |         CAST(round(quality_score * 1000000.0) AS BIGINT) AS mu
         |  FROM q
         |), rk AS (
         |  SELECT doc_id, quality_score,
         |         row_number() OVER (ORDER BY mu, doc_id) AS global_rank,
         |         count(*) OVER () AS n
         |  FROM r
         |)
         |SELECT doc_id, quality_score,
         |       CAST(global_rank AS BIGINT) AS global_rank,
         |       CAST(((global_rank - 1) * 10) // n AS BIGINT) AS decile
         |FROM rk""".stripMargin,

    "text_quality_filter" ->
      """WITH m AS (
        |  SELECT doc_id, lang, source,
        |         CAST(len(string_split_regex(text, '\s+')) AS DOUBLE) AS n_tok
        |  FROM documents
        |), th AS (
        |  SELECT quantile_cont(n_tok, 0.10) AS lo,
        |         quantile_cont(n_tok, 0.90) AS hi
        |  FROM m
        |)
        |SELECT doc_id, lang, source, CAST(n_tok AS BIGINT) AS n_tokens
        |FROM m, th WHERE n_tok >= lo AND n_tok <= hi""".stripMargin,

    "text_tokencount" ->
      s"""SELECT doc_id, n_chars,
         |       CAST(len(string_split_regex(text, '\\s+')) AS INT) AS ws_tokens,
         |       CAST(len(regexp_extract_all(text, '$BpePattern')) AS INT) AS bpe_tokens
         |FROM documents""".stripMargin,

    "text_ngram_counts" ->
      """WITH toks AS (
        |  SELECT string_split_regex(lower(text), '\s+') AS tk FROM documents
        |), bg AS (
        |  SELECT unnest(list_transform(range(1, greatest(len(tk), 1)),
        |                i -> tk[i] || ' ' || tk[i+1])) AS bigram
        |  FROM toks WHERE len(tk) >= 2
        |)
        |SELECT bigram, count(*) AS n FROM bg GROUP BY bigram
        |ORDER BY n DESC, bigram ASC LIMIT 50""".stripMargin,

    "text_inverted_index" ->
      """WITH tok AS (
        |  SELECT doc_id,
        |         unnest(string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +')) AS term
        |  FROM documents
        |), td AS (
        |  SELECT DISTINCT doc_id, term FROM tok WHERE term <> ''
        |)
        |SELECT term, count(*) AS df,
        |       array_to_string(list_sort(list(doc_id))[1:32], ',') AS postings
        |FROM td
        |GROUP BY term""".stripMargin,

    "text_chunk" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split_regex(text, '\s+') AS tk FROM documents
        |), nc AS (
        |  SELECT doc_id, tk,
        |         CASE WHEN len(tk) <= 32 THEN 1
        |              ELSE CAST(ceil((len(tk) - 32) / 16.0) AS INT) + 1 END
        |           AS n_chunks
        |  FROM toks
        |), ex AS (
        |  SELECT doc_id, tk, unnest(range(0, n_chunks)) AS chunk_id FROM nc
        |)
        |SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
        |       CAST(len(tk[chunk_id*16+1 : chunk_id*16+32]) AS INT) AS n_tokens,
        |       array_to_string(tk[chunk_id*16+1 : chunk_id*16+32], ' ') AS chunk_text
        |FROM ex""".stripMargin,

    "text_fingerprint" ->
      s"""WITH toks AS (
         |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk FROM documents
         |), sh AS (
         |  SELECT DISTINCT doc_id,
         |         unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
         |                i -> ${graft.dedup.Shingles.hash60Sql("tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]")})) AS h
         |  FROM toks WHERE len(tk) >= 3
         |)
         |SELECT doc_id, min(h) AS fingerprint,
         |       count(*) AS n_shingles
         |FROM sh GROUP BY doc_id""".stripMargin,

    "text_feature_hash" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |         unnest(string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +')) AS tok
         |  FROM documents
         |), h AS (
         |  SELECT doc_id, ${graft.dedup.Shingles.hash60Sql("tok")} AS h
         |  FROM toks WHERE tok <> ''
         |)
         |SELECT doc_id, CAST(h % $FeatureHashBuckets AS INTEGER) AS bucket,
         |       CAST(sum(CASE WHEN (h // $FeatureHashBuckets) % 2 = 0 THEN 1 ELSE -1 END) AS BIGINT) AS w
         |FROM h GROUP BY 1, 2
         |HAVING sum(CASE WHEN (h // $FeatureHashBuckets) % 2 = 0 THEN 1 ELSE -1 END) <> 0""".stripMargin,

    "text_clean_pipeline" ->
      s"""WITH m AS (
         |  SELECT doc_id, source, text,
         |         CAST(length(text) AS DOUBLE) AS n_chars,
         |         CAST(len(string_split_regex(text, '\\s+')) AS DOUBLE) AS n_tok,
         |         CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9\\s]', '', 'g')) AS DOUBLE) AS punct,
         |         CAST(len(list_filter(string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +'),
         |                              x -> x IN $stopList)) AS DOUBLE) AS stops,
         |         len(string_split_regex(regexp_replace(lower(text), '[^a-z ]', '', 'g'), ' +')) AS n_clean
         |  FROM documents
         |), scored AS (
         |  SELECT doc_id, source, text, CAST(n_tok AS BIGINT) AS n_tokens,
         |         round(least(n_tok / 100.0, 1.0) * 0.4 +
         |               least(stops / n_clean * 4.0, 1.0) * 0.4 +
         |               (1.0 - least(punct / greatest(n_chars, 1.0) * 10.0, 1.0)) * 0.2, 6) AS quality_score,
         |         stops / n_clean AS sr
         |  FROM m
         |), surv AS (
         |  SELECT * FROM scored WHERE sr >= 0.15 AND quality_score >= 0.5
         |), keep AS (
         |  SELECT min(doc_id) AS doc_id FROM surv GROUP BY md5(text)
         |)
         |SELECT s.doc_id, s.source, s.n_tokens, s.quality_score
         |FROM surv s JOIN keep k ON s.doc_id = k.doc_id""".stripMargin,

    "text_repetition" ->
      """WITH toks AS (
        |  SELECT doc_id, unnest(string_split_regex(lower(text), '\s+')) AS tok
        |  FROM documents
        |), tc AS (
        |  SELECT doc_id, tok, count(*) AS n FROM toks GROUP BY 1, 2
        |), tstats AS (
        |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
        |         count(*) AS n_distinct, max(n) AS max_n
        |  FROM tc GROUP BY doc_id
        |), tk AS (
        |  SELECT doc_id, string_split_regex(lower(text), '\s+') AS tk FROM documents
        |), bg AS (
        |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk), 1)),
        |                i -> tk[i] || ' ' || tk[i+1])) AS bg
        |  FROM tk WHERE len(tk) >= 2
        |), bc AS (
        |  SELECT doc_id, bg, count(*) AS n FROM bg GROUP BY 1, 2
        |), bstats AS (
        |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS nb, count(*) AS ndb
        |  FROM bc GROUP BY doc_id
        |)
        |SELECT t.doc_id, t.n_tokens,
        |       round(1.0 - CAST(t.n_distinct AS DOUBLE) / t.n_tokens, 6) AS dup_token_ratio,
        |       round(CAST(t.max_n AS DOUBLE) / t.n_tokens, 6) AS top_token_ratio,
        |       CASE WHEN b.nb IS NULL THEN 0.0
        |            ELSE round(1.0 - CAST(b.ndb AS DOUBLE) / b.nb, 6) END AS dup_bigram_ratio
        |FROM tstats t LEFT JOIN bstats b ON b.doc_id = t.doc_id""".stripMargin,

  )
}
