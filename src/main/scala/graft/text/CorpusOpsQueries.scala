package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}
import graft.dedup.Shingles

/** Corpus-hygiene operators a training-data pipeline runs before tokenizing:
  * span-level exact dedup (the scalable approximation of suffix-array
  * substring dedup, Lee et al. 2022 "Deduplicating Training Data Makes
  * Language Models Better"), benchmark-contamination detection (n-gram
  * containment of held-out eval docs inside training docs), PII
  * scrubbing (regex redaction of emails / URLs / long digit runs), and
  * deterministic shuffle/sharding (reproducible training order without a
  * global sort).
  *
  * Scale design (100 TB):
  *   - span dedup follows the TF/DF discipline: ONE explode pass aggregated
  *     to per-(doc, span-hash) counts, global counts derived from that
  *     already-aggregated relation, and the join back is agg-to-agg on the
  *     hash key — the raw span stream is never joined or shuffled twice,
  *     and it carries 32-char hashes, never the span strings themselves.
  *   - contamination joins the (small) benchmark shingle set against the
  *     corpus inverted-index style on the shingle key — an equi-join whose
  *     left side is the benchmark sliver, never all-pairs.
  *   - PII scrub is a pure narrow map (regexp_extract_all / regexp_replace
  *     are codegen'd); counts and the scrubbed-text digest in one pass.
  */
object CorpusOpsQueries extends QueryPack {

  private def docs(s: SparkSession, d: String): DataFrame = Tables.load(s, d, "documents")

  /** Span length for exact-substring dedup: long enough that natural text
    * rarely collides (Lee et al. use 50 BPE tokens; 10 words is the same
    * order), short enough to catch boilerplate repeats.
    */
  val SpanTokens = 10

  /** Rolling word 10-gram span HASHES from a tokens array; empty when too
    * short. The md5 runs INSIDE the lambda, so the materialized array —
    * and everything downstream of the explode — carries 32-char hashes,
    * never the span strings themselves (a ~10x copy of the document text;
    * at corpus scale that blowup is pure memory/shuffle waste, since only
    * the hash is ever compared).
    * SQL twin: list_transform(range(1, greatest(len(tk)-8, 1)),
    *            i -> md5(array_to_string(tk[i:i+9], ' ')))
    */
  def spanHashes(tk: Column): Column =
    when(size(tk) < SpanTokens, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(1), size(tk) - (SpanTokens - 1)),
        i => md5(array_join(slice(tk, i, lit(SpanTokens)), " "))))

  // PII patterns — the RE2-safe subset (no backreferences, no lookaround)
  // so Java regex and DuckDB RE2 agree byte-for-byte.
  val EmailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlPat = "https?://[^\\s]+"
  val LongNumPat = "[0-9]{9,}"

  /** Redaction order is part of the contract (an email inside a URL is
    * redacted as part of the URL): URL, then email, then digit runs.
    */
  def scrub(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, UrlPat, "<URL>"),
        EmailPat, "<EMAIL>"),
      LongNumPat, "<NUM>")

  /** Deterministic md5 bucket in [0,100) — same construction as
    * text_sample_stratified, so "the benchmark set" is a stable 5% slice.
    */
  private def bucket(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Training shards for text_shard_assign — a dial, not a truth. */
  val NShards = 16

  /** The standard "flatten the language distribution" temperature.
    * Declared BEFORE `oracles`: the oracle SQL interpolates it strictly at
    * object init, and a forward reference would silently bake in 0.0 (the
    * r11 split regression — see BpeQueries' init-order note).
    */
  val TempAlpha = 0.3

  /** Language mixture weights (percent kept), the single source of truth
    * for text_sample_mix's Spark CASE and its SQL twin. Same init-order
    * constraint as [[TempAlpha]] (a forward reference NPEs in `oracles`).
    */
  val MixRates: Seq[(String, Int)] =
    Seq("en" -> 80, "de" -> 60, "fr" -> 60, "es" -> 40, "zh" -> 20)

  /** Boilerplate threshold: a shingle present in >= this percent of a
    * source's documents (and in >= 2 of them) is template text. 10% is
    * the working dial for the synthetic corpus (real web sources run
    * 30-50%); the gate compares exact integers either way.
    */
  val BoilerPct = 10

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Per-SOURCE boilerplate detection: token 3-gram shingles that recur
    // across >= BoilerPct% of the SAME source's documents are template text
    // (headers, footers, nav chrome — the C4/RefinedWeb cleaning step
    // that corpus-wide span dedup misses, because a template is frequent
    // within its site yet globally rare). Output: each document's
    // boilerplate shingle fraction. Scale shape: the shingle stream is
    // aggregated once to (source, hash) document frequencies (map-side
    // partial agg), the source-size relation is a tiny broadcast, and
    // the flag join back to the per-doc stream is agg-to-agg on the
    // (source, hash) key — the raw shingle relation shuffles once. The
    // percentage gate compares exact integers (df * 100 >= pct * n_docs).
    "text_boilerplate" -> ((s, d) => {
      val sh = docs(s, d)
        .select(col("doc_id"), col("source"), Shingles.tokens(col("text")).as("tk"))
        .select(col("doc_id"), col("source"),
          explode(array_distinct(Shingles.shingleHashes3(col("tk")))).as("h"))
        .transform(graft.CacheScope.persisted(_))
      val srcSize = docs(s, d).groupBy("source")
        .agg(count(lit(1)).as("n_docs"))
      val boiler = sh.groupBy(col("source"), col("h"))
        .agg(count(lit(1)).as("df"))
        .join(broadcast(srcSize), "source")
        .filter(col("df") * 100 >= lit(BoilerPct) * col("n_docs") && col("df") >= 2)
        .select(col("source"), col("h"), lit(1L).as("is_boiler"))
      sh.join(boiler, Seq("source", "h"), "left")
        .groupBy("doc_id", "source")
        .agg(count(lit(1)).as("n_shingles"),
          sum(coalesce(col("is_boiler"), lit(0L))).as("n_boiler"))
        .select(col("doc_id"), col("source"), col("n_shingles"), col("n_boiler"),
          round(col("n_boiler").cast("double") / col("n_shingles").cast("double"), 6)
            .as("boiler_ratio"))
    }),

    // Span-level exact dedup: per doc, how much of it is 10-token spans
    // that occur elsewhere in the corpus (or again in the same doc).
    "text_span_dedup" -> ((s, d) => spanDedupOf(docs(s, d))),

    // Benchmark contamination: for each held-out doc (deterministic 5%
    // md5 slice), every corpus doc containing >= 50% of its 3-gram
    // shingles. The canonical train/test-overlap decontamination check.
    "text_contamination" -> ((s, d) => {
      val benchIds = docs(s, d).select(col("doc_id"))
        .filter(bucket(col("doc_id")) < 5)
      containmentOf(docs(s, d), benchIds, 0.5)
    }),

    // Deterministic training shuffle + sharding: every doc gets a stable
    // pseudo-random 60-bit key from md5(doc_id); shard = key mod NShards,
    // in-shard position = rank of the key. Reproducible global shuffle
    // without a global sort — ONE narrow map plus ONE shard-partitioned
    // window (each shard ranks independently; at 100 TB that is 1/NShards
    // of the corpus per partition, and NShards is the dial). This is the
    // op that turns a curated corpus into training shard files with a
    // seedable order.
    "text_shard_assign" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      val key = conv(substring(md5(col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("long")
      docs(s, d).select(col("doc_id"), key.as("ord"))
        .select(col("doc_id"), (col("ord") % NShards).as("shard"), col("ord"))
        .withColumn("pos", row_number().over(
          Window.partitionBy("shard").orderBy(col("ord"), col("doc_id"))))
        .select(col("doc_id"), col("shard"), col("pos"))
    }),

    // Content-defined chunking (CDC): cut each document where the token
    // hash hits a boundary pattern (hash60(tok) % 64 == 0 — expected
    // chunk length 64 tokens), instead of at fixed offsets. The property
    // that matters for storage/span dedup: an insertion shifts every
    // FIXED chunk after it (all hashes change), but only the CDC chunk
    // containing the edit (boundaries are content-anchored) —
    // CdcChunkSpec plants exactly that edit and counts surviving chunk
    // hashes. One posexplode pass + a doc-partitioned window + one
    // ordered aggregation; chunk content is md5'd per chunk, and the
    // window partitions by doc_id — never global.
    "text_cdc_chunk" -> ((s, d) => cdcChunks(docs(s, d))),

    // Sequence packing (training-batch assembly): concat docs in corpus
    // order and split at PackLen-token boundaries. Body in
    // [[packSequences]] — a DISTRIBUTED PREFIX SUM, the scalable form of
    // "cumulative sum over everything".
    "text_pack_sequences" -> ((s, d) => packSequences(docs(s, d))),

    // Token-budget selection: greedily keep the highest-quality documents
    // until the corpus token budget is spent ([[budgetSelect]]) — the
    // "train on the best B tokens" curation op, computed with the same
    // distributed prefix-sum machinery as packing/deciles (no global
    // window at any corpus size).
    "text_budget_select" -> ((s, d) => budgetSelect(docs(s, d), BudgetTokens)),

    // PII scrub: redaction counts + digest of the scrubbed text, one
    // narrow map pass. The synthetic corpus contains no PII (counts are
    // zero and the digest equals md5(text)) — PiiScrubSpec plants emails /
    // URLs / card-length numbers and pins the redaction behavior.
    "text_pii_scrub" -> ((s, d) =>
      docs(s, d).select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit(EmailPat), lit(0))).as("n_emails"),
        size(regexp_extract_all(col("text"), lit(UrlPat), lit(0))).as("n_urls"),
        size(regexp_extract_all(col("text"), lit(LongNumPat), lit(0))).as("n_longnums"),
        md5(scrub(col("text"))).as("scrubbed_md5"))),

    // Deterministic hash-stratified sampling: md5-derived bucket per doc,
    // ~10% per (lang, source) stratum — reproducible across engines and
    // runs (never rand()), verified by per-stratum totals.
    "text_sample_stratified" -> ((s, d) => {
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
      docs(s, d).select(col("lang"), col("source"), bucket.as("b"))
        .groupBy("lang", "source")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("b") < 10, 1L).otherwise(0L)).as("n_sampled"))
    }),

    // Deterministic MIXTURE sampling (corpus assembly): each language
    // keeps an md5-keyed fraction of its documents per [[MixRates]] — the
    // data-mixing step that weights sources into a training corpus,
    // reproducible run-over-run (never rand()). One narrow filter pass
    // (NarrowOpsSpec), no shuffle at any scale; both engines evaluate the
    // same CASE generated from the one rate table.
    "text_sample_mix" -> ((s, d) => {
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
      val rate = MixRates.foldLeft(lit(0)) { case (acc, (l, r)) =>
        when(col("lang") === l, lit(r)).otherwise(acc)
      }
      docs(s, d)
        .select(col("doc_id"), col("lang"), col("source"),
          bucket.as("b"), rate.as("r"))
        .filter(col("b") < col("r"))
        .select(col("doc_id"), col("lang"), col("source"))
    }),

    // Deterministic WEIGHTED sampling without replacement (the
    // Efraimidis-Spirakis exponential race): each doc draws an
    // md5-derived uniform u in (0,1) and races with key = -ln(u)/w; the
    // 200 smallest keys are a weight-proportional sample — here weighted
    // by document length, the "sample long docs preferentially" corpus
    // shaping step. Scale shape: one narrow map + TakeOrderedAndProject
    // (no global sort, never rand() — re-runs pick the SAME sample,
    // which is the whole point vs df.sample). u = (h + 0.5) / 2^52 is
    // exact double arithmetic on a 52-bit md5 prefix so it can never be
    // 0 or 1; the key is round(,9)-pinned like every computed ln in this
    // pack, with doc_id as the total-order tiebreak.
    "text_sample_weighted" -> ((s, d) => {
      val h = conv(substring(md5(concat(lit("ws:"), col("doc_id").cast("string"))),
        1, 13), 16, 10).cast("long")
      val u = (h.cast("double") + 0.5) / lit(4503599627370496.0)
      val w = greatest(col("n_chars"), lit(1L)).cast("double")
      docs(s, d)
        .select(col("doc_id"), col("n_chars"), round(-log(u) / w, 9).as("race_key"))
        .orderBy(col("race_key").asc, col("doc_id").asc)
        .limit(200)
    }),

    // TEMPERATURE (alpha) sampling — the mT5/XLM-R multilingual mixing
    // rule: where text_sample_mix's rates are hand-set, these are DERIVED
    // from the corpus itself. Language shares p_l are flattened to
    // q_l ∝ p_l^alpha, realized without upsampling as per-language keep
    // rates r_l = (n_l/n_min)^(alpha-1): the rarest language keeps
    // everything, every other language is downsampled toward the
    // flattened mix. See [[temperatureSampleOf]].
    "text_sample_temperature" -> ((s, d) =>
      temperatureSampleOf(docs(s, d), TempAlpha)),

    // Mixture-epochs plan: given per-source token counts, a temperature-
    // reweighted target mixture (w_s ∝ tokens^τ, the multilingual/
    // multi-source up-weighting convention), and a token budget of
    // [[MixBudgetMult]]× the corpus, how many EPOCHS of each source does
    // training consume? epochs > 1 means the source repeats — the number
    // a data-mixing plan checks against repetition-harm thresholds
    // before the run starts. Per-source pow terms are pinned and
    // DECIMAL-folded (bounded source relation); epochs is one fixed-shape
    // double expression over those pinned terms; the oversampled flag
    // compares the PINNED epochs value.
    "text_mixture_epochs" -> ((s, d) => {
      import org.apache.spark.sql.types.DecimalType
      val pw = docs(s, d)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), "\\s+")).cast("long")).as("tokens"))
        .select(col("source"), col("n_docs"), col("tokens"),
          round(pow(col("tokens").cast("double"), lit(MixTau)), 9).as("pt"))
        .transform(graft.CacheScope.persisted(_))
      val tot = pw.agg(sum(col("tokens")).as("ttot"),
        sum(col("pt").cast(DecimalType(28, 9))).as("ptot"))
      pw.crossJoin(broadcast(tot))
        .select(col("source"), col("n_docs"), col("tokens"),
          round(col("pt") / col("ptot").cast("double"), 6).as("weight"),
          round(lit(MixBudgetMult) * col("ttot").cast("double") * col("pt") /
            col("ptot").cast("double") / col("tokens").cast("double"), 6)
            .as("epochs"))
        .withColumn("oversampled", col("epochs") > lit(1.0))
    }),
  )

  /** Mixture temperature (w_s ∝ tokens^τ) and the training token budget
    * as a multiple of the corpus — shared with the oracle SQL.
    */
  val MixTau = 0.7
  val MixBudgetMult = 2.0

  /** CDC boundary modulus: expected chunk length in tokens. */
  val CdcMod = 64L

  /** Content-defined chunks over any (doc_id, text) relation: a token is a
    * BOUNDARY when its 60-bit hash ≡ 0 mod [[CdcMod]]; a boundary ENDS its
    * chunk, so chunk_id = count of boundaries strictly before the token.
    * Chunk text order is pinned by sorting (pos, tok) structs inside the
    * aggregation — collect_list alone is partition-order-dependent.
    */
  def cdcChunks(dd: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = dd
      .select(col("doc_id"), posexplode(Shingles.tokens(col("text")))
        .as(Seq("pos", "tok")))
      .withColumn("b", (Shingles.hash60(col("tok")) % CdcMod === 0).cast("int"))
    val chunkId = coalesce(
      sum(col("b")).over(Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
    toks
      .withColumn("chunk_id", chunkId)
      .groupBy("doc_id", "chunk_id")
      .agg(count(lit(1)).as("n_tokens"),
        md5(concat_ws(" ", transform(
          array_sort(collect_list(struct(col("pos"), col("tok")))),
          x => x.getField("tok")))).as("chunk_md5"))
  }

  /** Token budget for text_budget_select — interior at every testdata sf
    * (total whitespace tokens are ~27k at sf0.01, ~271k at sf0.1), so the
    * selection boundary is always exercised.
    */
  val BudgetTokens = 15000L

  /** Token-budget greedy selection over any (doc_id, text) relation:
    * documents ordered by (quality desc, doc_id asc) are selected while
    * the running token total BEFORE each document is still under
    * `budget` — i.e. the standard "spend the token budget on the best
    * documents first" curation rule, with the boundary document included
    * (first overshoot, never silent undershoot).
    *
    * Shape: the global running sum is the SAME distributed prefix sum as
    * [[packSequences]], generalized to a computed order key exactly like
    * text_quality_deciles — buckets are fixed ranges of the bounded
    * integer micro-score (constant-size bucket relation by construction),
    * per-bucket TOKEN totals give base offsets via the triangular join,
    * and the within-bucket cumulative sum is a bucket-partitioned window.
    * Ordering ties are broken by doc_id, and the order key is the exact
    * integer micro-score (never the raw double), so Spark and DuckDB
    * cannot disagree on the selection boundary.
    */
  def budgetSelect(dd: DataFrame, budget: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val m = dd.select(col("doc_id"),
        TextAnalysisQueries.qualityScore.as("quality_score"),
        size(split(col("text"), "\\s+")).cast("long").as("n_tokens"))
      .withColumn("mu",
        expr("CAST(round(quality_score * 1000000.0) AS BIGINT)"))
      .withColumn("bkt", expr(s"mu div ${TextAnalysisQueries.MuBlock}"))
      .transform(graft.CacheScope.persisted(_))
    val totals = m.groupBy("bkt").agg(sum(col("n_tokens")).as("t"))
    // Selection order is quality DESC: a bucket's base offset sums the
    // token totals of HIGHER buckets (the better documents spent first).
    val bases = TextAnalysisQueries.prefixBases(totals, "bkt", desc = true)
    val cumBefore = sum(col("n_tokens")).over(
      Window.partitionBy("bkt").orderBy(col("mu").desc, col("doc_id").asc)
        .rowsBetween(Window.unboundedPreceding, -1))
    m.join(broadcast(bases), "bkt")
      .select(col("doc_id"), col("quality_score"), col("n_tokens"),
        (col("base") + coalesce(cumBefore, lit(0L))).as("cum_before"))
      .withColumn("selected", col("cum_before") < budget)
  }

  /** Tokens per packed training sequence — the context length dial. */
  val PackLen = 2048L

  /** Shard count for the packing prefix sum — constant, so the offset
    * relation is constant-size at any corpus scale.
    */
  val PackShards = 32

  /** Sequence packing: concatenate documents in deterministic corpus order
    * (doc_id) and cut every [[PackLen]] tokens — each doc gets its global
    * token offset, its pack (training sequence) id, and its position
    * inside the pack. Docs may straddle a boundary, as in standard packed
    * pretraining batches (the attention mask, not the packer, separates
    * documents).
    *
    * The interesting part is HOW the global offset is computed: a naive
    * `sum() over (order by doc_id)` is an unpartitioned window — a
    * single-task global scan, banned by PlanAuditSpec. Instead, a
    * DISTRIBUTED PREFIX SUM: shard by CONTIGUOUS doc_id range (shard =
    * doc_id div blockSize — order-preserving, unlike text_shard_assign's
    * md5 shuffle-sharding, which is the other side of the same coin),
    * aggregate per-shard token totals (a PackShards-row relation), turn
    * those into per-shard base offsets with a triangular self-join over
    * that constant-size relation (same no-global-window discipline as
    * text_zipf), and add a shard-PARTITIONED running sum. Every stage is
    * either narrow, a constant-size relation, or a partitioned window —
    * nothing global, at any corpus size.
    *
    * The blockSize derives from max(doc_id) via a broadcast one-row
    * cross-join — no driver collect. Exactness: integer token counts and
    * integer offsets, so the DuckDB oracle's straightforward global-window
    * cumsum must agree bit-for-bit.
    */
  def packSequences(dd: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = dd.select(col("doc_id"),
      size(Shingles.tokens(col("text"))).cast("long").as("n_tokens"))
      // feeds the max(doc_id) pre-pass AND the sharded prefix sum: the
      // pin makes "touch the corpus text once" true in the executed plan
      // (the persisted relation is doc-count-sized, not corpus-sized)
      .transform(graft.CacheScope.persisted(_))
    val mx = toks.agg(max(col("doc_id")).as("mx"))
    val sharded = toks.crossJoin(broadcast(mx))
      .select(col("doc_id"), col("n_tokens"),
        expr(s"doc_id div ((mx div $PackShards) + 1)").as("shard"))
      .transform(graft.CacheScope.persisted(_))
    val totals = sharded.groupBy("shard").agg(sum(col("n_tokens")).as("t"))
    val bases = TextAnalysisQueries.prefixBases(totals, "shard", desc = false)
    val cumBefore = sum(col("n_tokens")).over(
      Window.partitionBy("shard").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1))
    sharded.join(broadcast(bases), "shard")
      .select(col("doc_id"), col("n_tokens"),
        (col("base") + coalesce(cumBefore, lit(0L))).as("global_offset"))
      .select(col("doc_id"), col("n_tokens"), col("global_offset"),
        expr(s"global_offset div $PackLen").as("pack_id"),
        (col("global_offset") % PackLen).as("pack_off"))
  }

  /** Benchmark-containment over any (doc_id, text) relation: for each doc
    * in `benchIds`, every other doc holding >= `threshold` of its distinct
    * 3-gram shingles. The shingle relation feeds both sides (benchmark
    * sliver + corpus), so it's persisted; the benchmark id set and the
    * per-benchmark sizes broadcast (both are eval-set-sized, never
    * corpus-sized).
    */
  def containmentOf(dd: DataFrame, benchIds: DataFrame, threshold: Double): DataFrame = {
    val sh = Shingles.docShingles(dd)
      .transform(graft.CacheScope.persisted(_))
    val bsh = sh.join(broadcast(benchIds), Seq("doc_id"), "left_semi")
    val bsz = bsh.groupBy("doc_id").agg(count(lit(1)).as("bsz"))
    // Inverted-index probe: the corpus side is semi-joined by the
    // BROADCAST benchmark hash set BEFORE any shuffle, so only corpus
    // shingles that can possibly intersect move — at 100 TB the
    // benchmark vocabulary is the sliver, and shuffling the whole corpus
    // shingle stream into the join would dwarf everything else.
    val cSide = sh.join(broadcast(bsh.select(col("h")).distinct()),
      Seq("h"), "left_semi")
    val inter = bsh.as("b")
      .join(cSide.as("c"),
        col("b.h") === col("c.h") && col("b.doc_id") =!= col("c.doc_id"))
      .groupBy(col("b.doc_id").as("bench_doc"), col("c.doc_id").as("corpus_doc"))
      .agg(count(lit(1)).as("n_common"))
    inter
      .join(broadcast(bsz.withColumnRenamed("doc_id", "bench_doc")), Seq("bench_doc"))
      .select(col("bench_doc"), col("corpus_doc"), col("n_common"),
        round(col("n_common").cast("double") / col("bsz"), 6).as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Span-dedup stats over any (doc_id, text) relation: per doc, total
    * 10-token span occurrences, occurrences whose span text appears more
    * than once corpus-wide, and the duplicated-mass ratio. Docs with
    * fewer than [[SpanTokens]] tokens yield no row (no spans to judge).
    *
    * The per-(doc, hash) count relation feeds both the global count and
    * the final join — persisted so the explode pass runs once.
    */
  def spanDedupOf(dd: DataFrame): DataFrame = {
    val local = dd
      .select(col("doc_id"), Shingles.tokens(col("text")).as("tk"))
      .select(col("doc_id"), explode(spanHashes(col("tk"))).as("k"))
      .groupBy("doc_id", "k").agg(count(lit(1)).as("cnt"))
      .transform(graft.CacheScope.persisted(_))
    val global = local.groupBy("k").agg(sum("cnt").as("g"))
    local.join(global, Seq("k"))
      .groupBy("doc_id")
      .agg(sum("cnt").as("n_spans"),
        sum(when(col("g") > 1, col("cnt")).otherwise(0L)).as("n_dup_spans"))
      .select(col("doc_id"), col("n_spans"), col("n_dup_spans"),
        round(col("n_dup_spans").cast("double") / col("n_spans"), 6)
          .as("dup_span_ratio"))
  }

  private val spanCte: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk FROM documents
       |), spans AS (
       |  SELECT doc_id, unnest(list_transform(range(1, greatest(len(tk) - ${SpanTokens - 2}, 1)),
       |                 i -> md5(array_to_string(tk[i:i+${SpanTokens - 1}], ' ')))) AS k
       |  FROM toks WHERE len(tk) >= $SpanTokens
       |), local AS (
       |  SELECT doc_id, k, count(*) AS cnt FROM spans GROUP BY 1, 2
       |), gc AS (
       |  SELECT k, sum(cnt) AS g FROM local GROUP BY k
       |)""".stripMargin

  private val shCte: String =
    s"""WITH toks AS (
       |  SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id,
       |         unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
       |                i -> ${Shingles.hash60Sql("tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]")})) AS h
       |  FROM toks WHERE len(tk) >= 3
       |)""".stripMargin

  override val oracles: Map[String, String] = Map(

    "text_mixture_epochs" ->
      s"""WITH per AS (
         |  SELECT source, count(*) AS n_docs,
         |         CAST(sum(CAST(len(string_split_regex(text, '\\s+')) AS BIGINT))
         |              AS BIGINT) AS tokens
         |  FROM documents GROUP BY 1
         |), pw AS (
         |  SELECT source, n_docs, tokens,
         |         round(pow(CAST(tokens AS DOUBLE), $MixTau), 9) AS pt
         |  FROM per
         |), tot AS (
         |  SELECT CAST(sum(tokens) AS BIGINT) AS ttot,
         |         sum(CAST(pt AS DECIMAL(28,9))) AS ptot
         |  FROM pw
         |), o AS (
         |  SELECT source, n_docs, tokens,
         |         round(pt / CAST(ptot AS DOUBLE), 6) AS weight,
         |         round($MixBudgetMult * CAST(ttot AS DOUBLE) * pt /
         |               CAST(ptot AS DOUBLE) / CAST(tokens AS DOUBLE), 6) AS epochs
         |  FROM pw CROSS JOIN tot
         |)
         |SELECT source, n_docs, tokens, weight, epochs,
         |       epochs > 1.0 AS oversampled
         |FROM o""".stripMargin,

    "text_boilerplate" ->
      s"""WITH toks AS (
         |  SELECT doc_id, source, string_split_regex(lower(text), '\\s+') AS tk
         |  FROM documents
         |), sh AS (
         |  SELECT DISTINCT doc_id, source,
         |         unnest(list_transform(range(1, greatest(len(tk) - 1, 1)),
         |                i -> ${Shingles.hash60Sql("tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]")})) AS h
         |  FROM toks WHERE len(tk) >= 3
         |), srcsize AS (
         |  SELECT source, count(*) AS n_docs FROM documents GROUP BY 1
         |), boiler AS (
         |  SELECT s.source, s.h
         |  FROM (SELECT source, h, count(*) AS df FROM sh GROUP BY 1, 2) s
         |  JOIN srcsize z USING (source)
         |  WHERE s.df * 100 >= $BoilerPct * z.n_docs AND s.df >= 2
         |)
         |SELECT sh.doc_id, sh.source, count(*) AS n_shingles,
         |       CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_boiler,
         |       round(CAST(sum(CASE WHEN b.h IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE) /
         |             CAST(count(*) AS DOUBLE), 6) AS boiler_ratio
         |FROM sh LEFT JOIN boiler b ON b.source = sh.source AND b.h = sh.h
         |GROUP BY 1, 2""".stripMargin,
    "text_budget_select" ->
      s"""WITH ${TextAnalysisQueries.qualityScoreCte}, toks AS (
         |  SELECT doc_id,
         |         CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
         |  FROM documents
         |), ordered AS (
         |  SELECT q.doc_id, q.quality_score, t.n_tokens,
         |         CAST(coalesce(sum(t.n_tokens) OVER (
         |           ORDER BY CAST(round(q.quality_score * 1000000.0) AS BIGINT) DESC,
         |                    q.doc_id ASC
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
         |  FROM qscore q JOIN toks t USING (doc_id)
         |)
         |SELECT doc_id, quality_score, n_tokens, cum_before,
         |       cum_before < $BudgetTokens AS selected
         |FROM ordered""".stripMargin,

    "text_span_dedup" ->
      s"""$spanCte
         |SELECT l.doc_id,
         |       CAST(sum(l.cnt) AS BIGINT) AS n_spans,
         |       CAST(sum(CASE WHEN g.g > 1 THEN l.cnt ELSE 0 END) AS BIGINT) AS n_dup_spans,
         |       round(CAST(sum(CASE WHEN g.g > 1 THEN l.cnt ELSE 0 END) AS DOUBLE) /
         |             sum(l.cnt), 6) AS dup_span_ratio
         |FROM local l JOIN gc g ON g.k = l.k
         |GROUP BY l.doc_id""".stripMargin,

    "text_contamination" ->
      s"""$shCte, bench AS (
         |  SELECT doc_id FROM documents
         |  WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 5
         |), bsh AS (
         |  SELECT s.doc_id, s.h FROM sh s JOIN bench b ON b.doc_id = s.doc_id
         |), bsz AS (
         |  SELECT doc_id, count(*) AS bsz FROM bsh GROUP BY doc_id
         |), inter AS (
         |  SELECT b.doc_id AS bench_doc, c.doc_id AS corpus_doc, count(*) AS n_common
         |  FROM bsh b JOIN sh c ON c.h = b.h AND c.doc_id <> b.doc_id
         |  GROUP BY 1, 2
         |)
         |SELECT i.bench_doc, i.corpus_doc, i.n_common,
         |       round(CAST(i.n_common AS DOUBLE) / z.bsz, 6) AS containment
         |FROM inter i JOIN bsz z ON z.doc_id = i.bench_doc
         |WHERE round(CAST(i.n_common AS DOUBLE) / z.bsz, 6) >= 0.5""".stripMargin,

    "text_shard_assign" ->
      s"""WITH k AS (
         |  SELECT doc_id,
         |         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT AS ord
         |  FROM documents
         |)
         |SELECT doc_id, ord % $NShards AS shard,
         |       row_number() OVER (PARTITION BY ord % $NShards
         |                          ORDER BY ord, doc_id) AS pos
         |FROM k""".stripMargin,

    "text_cdc_chunk" ->
      s"""WITH toks AS (
         |  SELECT doc_id,
         |         generate_subscripts(tk, 1) AS pos, unnest(tk) AS tok
         |  FROM (SELECT doc_id, string_split_regex(lower(text), '\\s+') AS tk
         |        FROM documents)
         |), flagged AS (
         |  SELECT doc_id, pos, tok,
         |         CASE WHEN ${Shingles.hash60Sql("tok")} % $CdcMod = 0
         |              THEN 1 ELSE 0 END AS b
         |  FROM toks
         |), cids AS (
         |  SELECT doc_id, pos, tok,
         |         COALESCE(sum(b) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS chunk_id
         |  FROM flagged
         |)
         |SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
         |       count(*) AS n_tokens,
         |       md5(string_agg(tok, ' ' ORDER BY pos)) AS chunk_md5
         |FROM cids GROUP BY doc_id, chunk_id""".stripMargin,

    // The oracle uses the global-window cumsum the Spark side deliberately
    // avoids — DuckDB is single-node, so a global ordered scan is exactly
    // right THERE; equality proves the distributed prefix sum computes the
    // same function.
    "text_pack_sequences" ->
      s"""WITH t AS (
         |  SELECT doc_id,
         |         len(string_split_regex(lower(text), '\\s+')) AS n_tokens
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, n_tokens,
         |         COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |           AS global_offset
         |  FROM t
         |)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
         |       CAST(global_offset AS BIGINT) AS global_offset,
         |       CAST(global_offset // $PackLen AS BIGINT) AS pack_id,
         |       CAST(global_offset % $PackLen AS BIGINT) AS pack_off
         |FROM c""".stripMargin,

    "text_pii_scrub" ->
      s"""SELECT doc_id,
         |       CAST(len(regexp_extract_all(text, '$EmailPat')) AS INT) AS n_emails,
         |       CAST(len(regexp_extract_all(text, '$UrlPat')) AS INT) AS n_urls,
         |       CAST(len(regexp_extract_all(text, '$LongNumPat')) AS INT) AS n_longnums,
         |       md5(regexp_replace(regexp_replace(regexp_replace(text,
         |             '$UrlPat', '<URL>', 'g'),
         |             '$EmailPat', '<EMAIL>', 'g'),
         |             '$LongNumPat', '<NUM>', 'g')) AS scrubbed_md5
         |FROM documents""".stripMargin,

    "text_sample_stratified" ->
      """SELECT lang, source, count(*) AS n_total,
        |       CAST(sum(CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 < 10
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_sampled
        |FROM documents GROUP BY lang, source""".stripMargin,

    "text_sample_mix" ->
      s"""SELECT doc_id, lang, source
         |FROM documents
         |WHERE ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 <
         |      CASE lang ${MixRates.map { case (l, r) => s"WHEN '$l' THEN $r" }.mkString(" ")} ELSE 0 END""".stripMargin,

    "text_sample_weighted" ->
      """SELECT doc_id, n_chars,
        |       round(-ln((('0x' || substring(md5('ws:' || doc_id), 1, 13))::BIGINT + 0.5)
        |                 / 4503599627370496.0)
        |             / greatest(n_chars, 1), 9) AS race_key
        |FROM documents
        |ORDER BY race_key ASC, doc_id ASC
        |LIMIT 200""".stripMargin,

    "text_sample_temperature" ->
      s"""WITH c AS (
         |  SELECT lang, count(*) AS nl FROM documents GROUP BY lang
         |), r AS (
         |  SELECT lang,
         |         round(pow(CAST(nl AS DOUBLE) /
         |                   (SELECT CAST(min(nl) AS DOUBLE) FROM c),
         |                   ${TempAlpha - 1.0}), 9) AS r
         |  FROM c
         |)
         |SELECT d.doc_id, d.lang, d.source
         |FROM documents d JOIN r ON r.lang = d.lang
         |WHERE (('0x' || substring(md5('temp:' || doc_id), 1, 13))::BIGINT + 0.5)
         |      / 4503599627370496.0 < r.r""".stripMargin
  )


  /** Alpha-sampling body (see the text_sample_temperature registration):
    * one bounded language-count aggregation, rates as a broadcast
    * #langs-row table, one narrow filter pass — no corpus-sized shuffle
    * at any scale. Determinism: the keep decision compares an exact
    * md5-derived u (text_sample_weighted's 52-bit construction) against
    * a round(,9)-pinned rate, so both engines make the SAME per-doc
    * decision. Public so TrainingPrepSpec can replay the decisions
    * doc-by-doc on a planted two-language corpus.
    */
  def temperatureSampleOf(dd0: DataFrame, alpha: Double): DataFrame = {
    val dd = dd0.transform(graft.CacheScope.persisted(_))
    val counts = dd.groupBy("lang").agg(count(lit(1)).as("nl"))
    val nmin = counts.agg(min(col("nl")).as("nmin"))
    val rates = counts.crossJoin(broadcast(nmin))
      .select(col("lang"),
        round(pow(col("nl").cast("double") / col("nmin").cast("double"),
          lit(alpha - 1.0)), 9).as("r"))
    val h = conv(substring(md5(concat(lit("temp:"), col("doc_id").cast("string"))),
      1, 13), 16, 10).cast("long")
    val u = (h.cast("double") + 0.5) / lit(4503599627370496.0)
    dd.join(broadcast(rates), "lang")
      .filter(u < col("r"))
      .select(col("doc_id"), col("lang"), col("source"))
  }

}
