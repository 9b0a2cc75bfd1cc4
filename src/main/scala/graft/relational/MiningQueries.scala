package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{CacheScope, QueryPack, Tables}

/** Sequence/decision-mining operators: MATCH_RECOGNIZE-style event-sequence
  * pattern counting, the Mann–Whitney U rank test, a single-pass Poisson
  * bootstrap, and a decision-stump (best binary split) learner. The
  * inferential siblings of [[StatsQueries]] — same exact-integer-cents
  * discipline: counts, ranks, and moment sums stay in exact DECIMAL,
  * doubles appear only in final shared expressions, round()-pinned.
  *
  * Distributed prefix sums (Mann–Whitney's cumulative rank base, the
  * stump's cumulative class counts) follow the blessed sharded shape:
  * constant-bucket totals + a self-join over the BOUNDED bucket relation
  * for the bases (same machinery as text_quality_deciles /
  * text_pack_sequences — never a global unpartitioned window).
  */
object MiningQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  private def cents(c: Column): Column =
    (c.cast(DecimalType(12, 2)) * 100).cast("long")

  private val CentsSql = "CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)"

  /** Value-range buckets for the distributed prefix sums — constant, so
    * the offsets relation (and its O(B²) base self-join) never grows with
    * the corpus; per-bucket work parallelizes across B tasks.
    */
  val RankBuckets = 64

  /** Poisson-bootstrap replicate count. */
  val BootReps = 32

  /** Item-CF dials: min co-purchase support, neighbors kept per item. */
  val ItemCfMinCooc = 2
  val ItemCfTopK = 5

  /** Cumulative Poisson(1) thresholds scaled to the 24-bit md5-prefix
    * domain [0, 16^6): replicate weight k is the first k with
    * u < Thresh(k). Computed once here and EMBEDDED as integer literals
    * in both engines' CASE chains, so the draw is exact and identical.
    */
  val PoissonThresh: Seq[Long] = {
    val e1 = math.exp(-1.0)
    var acc = 0.0
    var fact = 1.0
    (0 to 6).map { k =>
      if (k > 0) fact *= k
      acc += e1 / fact
      math.floor(acc * 16777216.0).toLong
    }
  }

  /** Bucket index of `v` within the broadcast [vmin, vmax] span — exact
    * long arithmetic, identical in both engines.
    */
  private def bucketOf(v: String, vmin: String, vmax: String): String =
    s"CAST(($v - $vmin) * $RankBuckets AS BIGINT) div ($vmax - $vmin + 1)"

  /** The item-CF top-k neighbor relation (part_a, part_b, cooc, cosine,
    * rk) — shared by q_itemcf_topk and q_rec_coverage.
    *
    * q_assoc_rules' basket-explode shape: ONE shuffle builds the basket
    * sets; pair emission is a narrow double-explode (quadratic only in
    * basket size), vs the distinct + self-join formulation the ORACLE
    * deliberately keeps (measured: 5.3s -> the explode shape at sf0.1;
    * the oracle's join shape proves them equivalent).
    */
  /** [[itemcfTopkOf]] through [[graft.LabelsMemo]] (r15): the item-CF
    * neighbor artifact is consumed by TWO registered queries —
    * `q_itemcf_topk` (the raw honest producer, which does NOT read the
    * memo: its benched cost stays the full basket-explode pipeline) and
    * `q_rec_coverage` (the quality profile OF that artifact, which
    * previously replayed the whole pipeline to score it). Same
    * managed-table discipline as the dedup cluster labels: at 100 TB the
    * neighbor list is a table the recommender serves from and the
    * profile job reads — not a lineage each consumer re-derives.
    */
  private def itemcfTopkMemo(s: SparkSession, d: String): DataFrame =
    graft.LabelsMemo.getOrCompute(s"itemcf_topk:$d", s)(itemcfTopkOf(s, d))

  private def itemcfTopkOf(s: SparkSession, d: String): DataFrame = {
    val baskets = t(s, d, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
      .transform(CacheScope.persisted(_))
    val ni = baskets.select(explode(col("ps")).as("pk"))
      .groupBy("pk").agg(count(lit(1)).as("n"))
    val cooc = baskets
      .select(explode(col("ps")).as("pk"), col("ps"))
      .select(col("pk"), explode(col("ps")).as("pk2"))
      .filter(col("pk") < col("pk2"))
      .groupBy(col("pk"), col("pk2")).agg(count(lit(1)).as("c"))
      .filter(col("c") >= ItemCfMinCooc)
    val sym = cooc.select(col("pk").as("i"), col("pk2").as("j"), col("c"))
      .union(cooc.select(col("pk2").as("i"), col("pk").as("j"), col("c")))
    val scored = sym
      .join(ni.select(col("pk").as("i"), col("n").as("ni")), "i")
      .join(ni.select(col("pk").as("j"), col("n").as("nj")), "j")
      .withColumn("cosine", round(col("c").cast("double") /
        sqrt((col("ni") * col("nj")).cast("double")), 6))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("i").orderBy(col("cosine").desc, col("j").asc)
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= ItemCfTopK)
      .select(col("i").as("part_a"), col("j").as("part_b"),
        col("c").as("cooc"), col("cosine"), col("rk"))
  }

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // MATCH_RECOGNIZE-style sequence pattern count: per user, how many
    // non-overlapping view→click→purchase runs appear in the event-time
    // order? Each user's history collapses to a code string (one char
    // per event — the five types have distinct initials) via an ordered
    // array sort pinned by (ts, event_id); the pattern count is the
    // classic replace-length identity (no regex — engines disagree on
    // regex dialects, never on substring replace). Per-user state is the
    // user's OWN event count — bounded by activity, the same contract as
    // q_events_sessionize; a 100 TB deployment scopes the collect to
    // (user, day/session) exactly as that query documents.
    "q_events_pattern" -> ((s, d) => {
      val code = upper(substring(col("event_type"), 1, 1))
      t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), code.as("ch"))
        .groupBy(col("user_id"))
        .agg(concat_ws("", transform(
          array_sort(collect_list(struct(col("ts"), col("event_id"), col("ch")))),
          x => x.getField("ch"))).as("seq"))
        .select(col("user_id"),
          length(col("seq")).cast("long").as("n_events"),
          ((length(col("seq")) -
            length(expr("replace(seq, 'VCP', '')"))) / lit(3))
            .cast("long").as("n_matches"))
        .withColumn("converted", col("n_matches") > 0)
    }),

    // Mann–Whitney U (Wilcoxon rank-sum) test: does `value` differ in
    // distribution between purchase and click events? The
    // nonparametric complement of q_stats_ttest — rank-based, so one
    // whale cannot drag the verdict the way it drags a mean. Ranks are
    // NEVER materialized per row: the per-distinct-value relation
    // (bounded by the cents domain) carries tie counts; average ranks
    // come from the sharded prefix sum (bucket bases via the bounded
    // self-join, within-bucket running sums via a bucket-PARTITIONED
    // window); U, the tie-corrected variance, and z derive from exact
    // integer sums, with doubles only in the one shared final
    // expression. Doubled-rank trick keeps the .5-average-rank exact:
    // 2·r̄(v) = 2·C(v⁻) + t + 1 is always integer.
    "q_stats_mannwhitney" -> ((s, d) => {
      val ev = t(s, d, "events")
        .filter(col("event_type").isin("purchase", "click"))
        .select((col("event_type") === "purchase").as("g1"),
          cents(col("value")).as("v"))
      val per = ev.groupBy(col("v"))
        .agg(count(lit(1)).as("t"),
          sum(when(col("g1"), 1L).otherwise(0L)).as("t1"))
        .transform(CacheScope.persisted(_))
      val span = per.agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
      val b = per.crossJoin(broadcast(span))
        .withColumn("bkt", expr(bucketOf("v", "vmin", "vmax")))
      val totals = b.groupBy("bkt").agg(sum(col("t")).as("t"))
      val bases = graft.text.TextAnalysisQueries.prefixBases(totals, "bkt", desc = false)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("bkt").orderBy("v")
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
      val ranked = b.join(broadcast(bases), "bkt")
        .withColumn("cbelow", col("base") + coalesce(sum(col("t")).over(w), lit(0L)))
        // doubled average rank: integer by construction
        .withColumn("r2", lit(2) * col("cbelow") + col("t") + 1)
      val agg = ranked.agg(
        sum(col("t1")).as("n1"),
        sum(col("t") - col("t1")).as("n2"),
        sum(col("t1").cast(DecimalType(20, 0)) * col("r2").cast(DecimalType(20, 0)))
          .cast(DecimalType(38, 0)).as("r1x2"),
        sum(col("t").cast(DecimalType(20, 0)) * col("t").cast(DecimalType(20, 0)) *
            col("t").cast(DecimalType(20, 0)) - col("t").cast(DecimalType(20, 0)))
          .cast(DecimalType(38, 0)).as("ties"))
      val n = col("n1") + col("n2")
      val p = (col("n1") * col("n2")).cast("double")
      val u1x2 = col("r1x2").cast("double") - (col("n1") * (col("n1") + 1)).cast("double")
      val sigma = sqrt(p / 12.0 * ((n + 1).cast("double") -
        col("ties").cast("double") / (n.cast("double") * (n - 1).cast("double"))))
      agg.select(col("n1"), col("n2"),
        round(u1x2 / 2.0, 1).as("u1"),
        round((u1x2 - p) / (lit(2.0) * sigma), 6).as("z"),
        round(lit(1.0) - u1x2 / p, 6).as("rank_biserial"))
    }),

    // Single-pass Poisson bootstrap of the mean value per event type:
    // each of the 32 replicates weighs every row by an independent
    // Poisson(1) draw — the ONLY bootstrap that works at 100 TB, because
    // it needs no resampling shuffle, no row indices, and no second pass
    // (Chamandy et al., "Estimating Uncertainty for Massive Data
    // Streams"). Draws are md5-derived (rows × replicates is a narrow
    // explode collapsed by map-side partial agg), thresholds are shared
    // integer literals, replicate means are round(,6)-pinned before the
    // exact-DECIMAL variance fold, so both engines see the identical 32
    // doubles per type.
    "q_stats_bootstrap" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("event_type"), col("event_id"), cents(col("value")).as("c"))
      // Draw r for a row reads 24 bits of md5(event_id:(r div 5)) at hex
      // offset 6·(r % 5). Measured at sf0.1: the per-exploded-row digest
      // (2.9s) beats pre-building the 32-draw array before the explode
      // (4.0s) — the nested transform/flatten/posexplode costs more than
      // the redundant hashing it saves, because the per-row expression
      // stays inside whole-stage codegen while the array build does not.
      val drawn = ev
        .select(col("event_type"), col("event_id"), col("c"),
          explode(sequence(lit(0), lit(BootReps - 1))).as("rep"))
        .withColumn("u", expr(
          """CAST(conv(substr(md5(concat(CAST(event_id AS STRING), ':',
            |                            CAST(rep div 5 AS STRING))),
            |            1 + 6 * CAST(rep % 5 AS INT), 6), 16, 10) AS BIGINT)"""
            .stripMargin))
        .withColumn("wt", poissonCase(col("u")))
      val reps = drawn.groupBy(col("event_type"), col("rep"))
        .agg(sum((col("wt") * col("c")).cast(DecimalType(28, 0))).as("wc"),
          sum(col("wt")).as("w"))
        .filter(col("w") > 0)
        .withColumn("bmean",
          round(col("wc").cast("double") / (col("w") * 100).cast("double"), 6))
      val full = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
        .withColumn("est", round(col("sc").cast("double") / (col("n") * 100).cast("double"), 6))
      val boot = reps.groupBy(col("event_type"))
        .agg(count(lit(1)).as("b"),
          sum(col("bmean").cast(DecimalType(18, 6))).cast(DecimalType(24, 6)).as("sb"),
          sum(col("bmean").cast(DecimalType(18, 6)) * col("bmean").cast(DecimalType(18, 6)))
            .cast(DecimalType(30, 12)).as("sbb"))
      val se = sqrt(greatest(lit(0.0),
        (col("b").cast(DecimalType(6, 0)) * col("sbb") - col("sb") * col("sb")).cast("double") /
          (col("b") * (col("b") - 1)).cast("double")))
      full.join(boot, "event_type")
        .select(col("event_type"), col("n"), col("est"),
          round(se, 6).as("se_boot"),
          round(col("est") - lit(1.96) * se, 6).as("lo95"),
          round(col("est") + lit(1.96) * se, 6).as("hi95"))
    }),

    // Item-item collaborative filtering: per part, the top-5 most
    // co-purchased neighbors by basket-cosine sim(i,j) =
    // cooc(i,j)/sqrt(n_i·n_j) — q_assoc_rules' ranked-recommendation
    // twin (rules gate on lift/confidence; this produces each item's
    // neighbor LIST, the item-CF serving artifact). Candidate pairs come
    // from the basket self-equi-join on l_orderkey — quadratic only in
    // the BASKET size (bounded at 13 here; a 100 TB deployment caps or
    // salts whale baskets exactly as q_assoc_rules documents) — and the
    // min-support gate prunes before the per-item top-k window
    // (partitioned by item, never global). Cosine is one double from
    // exact counts, round(,6)-pinned before it orders the window, with
    // the neighbor id breaking ties deterministically.
    "q_itemcf_topk" -> ((s, d) => itemcfTopkOf(s, d)),

    // Recommendation-quality profile of the item-CF artifact: catalog
    // coverage (what share of the catalog ever gets recommended — the
    // long-tail health check) and mean novelty −log2(popularity) of the
    // recommended items (a coverage-blind recommender that only serves
    // bestsellers scores near the popularity floor). Novelty terms are
    // 9dp-pinned into exact DECIMAL; coverage is exact counts. The rec
    // relation is q_itemcf_topk's artifact read through the memo
    // ([[itemcfTopkMemo]] — the producer stays raw); everything after is
    // bounded by items, not the corpus.
    "q_rec_coverage" -> ((s, d) => {
      val recs = itemcfTopkMemo(s, d).transform(CacheScope.persisted(_))
      val cat = t(s, d, "part").agg(count(lit(1)).as("n_catalog"))
      val li = t(s, d, "lineitem")
        .select(col("l_orderkey"), col("l_partkey")).distinct()
        .transform(CacheScope.persisted(_))
      val nb = li.select(col("l_orderkey")).distinct()
        .agg(count(lit(1)).as("n_baskets"))
      val ni = li.groupBy(col("l_partkey")).agg(count(lit(1)).as("npk"))
      val nov = recs
        .join(ni.select(col("l_partkey").as("part_b"), col("npk")), "part_b")
        .crossJoin(broadcast(nb))
        .select(round(-log2(col("npk").cast("double") /
          col("n_baskets").cast("double")), 9)
          .cast(org.apache.spark.sql.types.DecimalType(16, 9)).as("nv"))
        .agg(count(lit(1)).as("n_recs"), sum(col("nv")).as("snv"))
      val cov = recs.select(col("part_b")).distinct()
        .agg(count(lit(1)).as("n_rec_items"))
      cov.crossJoin(broadcast(cat)).crossJoin(broadcast(nov))
        .select(col("n_rec_items"), col("n_catalog"), col("n_recs"),
          round(col("n_rec_items").cast("double") /
            col("n_catalog").cast("double"), 6).as("coverage"),
          round(col("snv").cast("double") /
            col("n_recs").cast("double"), 6).as("novelty_bits"))
    }),

    // Decision stump: the best single threshold on o_totalprice for
    // predicting "order is 1-URGENT", by weighted Gini impurity — the
    // depth-1 tree that anchors every boosted/forest pipeline, and the
    // shape histogram-based GBDT learners (LightGBM-style) evaluate at
    // scale: one pass collapses orders to 64 feature-range buckets with
    // class counts; cumulative counts per candidate split come from the
    // bounded-bucket self-join (64² pairs, corpus-independent); the
    // argmin rides max(struct) — no window, no collect. Gini and
    // accuracy are doubles over exact integer counts, round(,6)-pinned,
    // with the bucket id breaking ties deterministically.
    "q_ml_stump" -> ((s, d) => {
      val ord = t(s, d, "orders")
        .select(cents(col("o_totalprice")).as("v"),
          (col("o_orderpriority") === "1-URGENT").as("pos"))
      val span = ord.agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
      val buckets = ord.crossJoin(broadcast(span))
        .withColumn("bkt", expr(bucketOf("v", "vmin", "vmax")))
        .groupBy("bkt")
        .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("p"),
          sum(when(col("pos"), 0L).otherwise(1L)).as("q"))
        .transform(CacheScope.persisted(_))
      // cumulative class counts over candidate splits (bucket b = "goes
      // left iff v lands in bucket <= b"); the last bucket is no split.
      val cum = buckets.as("b").join(buckets.as("o"), col("o.bkt") <= col("b.bkt"))
        .groupBy(col("b.bkt").as("bkt"))
        .agg(sum(col("o.p")).as("pl"), sum(col("o.q")).as("ql"))
      val tot = buckets.agg(sum(col("p")).as("tp"), sum(col("q")).as("tq"))
      val g = cum.crossJoin(broadcast(tot))
        .withColumn("pr", col("tp") - col("pl"))
        .withColumn("qr", col("tq") - col("ql"))
        .filter(col("pl") + col("ql") > 0 && col("pr") + col("qr") > 0)
      val nl = (col("pl") + col("ql")).cast("double")
      val nr = (col("pr") + col("qr")).cast("double")
      val nn = nl + nr
      val gini = nl / nn * (lit(1.0) -
          (col("pl").cast("double") / nl) * (col("pl").cast("double") / nl) -
          (col("ql").cast("double") / nl) * (col("ql").cast("double") / nl)) +
        nr / nn * (lit(1.0) -
          (col("pr").cast("double") / nr) * (col("pr").cast("double") / nr) -
          (col("qr").cast("double") / nr) * (col("qr").cast("double") / nr))
      val acc = (greatest(col("pl"), col("ql")) + greatest(col("pr"), col("qr")))
        .cast("double") / nn
      val scored = g.select(col("bkt"), col("pl"), col("ql"), col("pr"), col("qr"),
        round(gini, 6).as("gini"), round(acc, 6).as("acc"))
      scored.agg(min(struct(col("gini"), col("bkt"), col("pl"), col("ql"),
          col("pr"), col("qr"), col("acc"))).as("m"))
        .select(col("m.bkt").as("split_bucket"), col("m.gini").as("gini"),
          col("m.acc").as("acc"), col("m.pl").as("pos_left"),
          col("m.ql").as("neg_left"), col("m.pr").as("pos_right"),
          col("m.qr").as("neg_right"))
    }),

    // One gradient-boosting round over histogram stumps — the iterative
    // additive-fit template GBDT learners run at scale: stage 1 fits a
    // squared-loss stump to the URGENT label on the o_totalprice
    // histogram; stage 2 fits a second stump to the RESIDUALS of the
    // first. The stage-2 statistics never touch rows: stage 1's split
    // lands on a bucket boundary, so every bucket lies wholly on one
    // side and its residual sum / sum-of-squares are closed forms of
    // (n_b, sy_b) — the whole round is ONE corpus scan + two bounded
    // 64²-triangular cumulations, which is why histogram GBDT scales.
    // Determinism: residuals are rationals y − sy_side/n_side, so all
    // stage-2 stats are computed in r·D units (D = nl·nr) as EXACT
    // decimals; split gains are round(,6)-pinned doubles over exact
    // operands, argmax via max(struct) with a bucket tie-break. Decimal
    // headroom: bounds hold to ~3e6 rows (sr2 has 36 digits); past that
    // the documented dial is a wider sr2 cast (the q_ml_ridge note).
    "q_ml_gbdt_round" -> ((s, d) => {
      val ord = t(s, d, "orders")
        .select(cents(col("o_totalprice")).as("v"),
          when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L).as("y"))
      val span = ord.agg(min(col("v")).as("vmin"), max(col("v")).as("vmax"))
      val bk = ord.crossJoin(broadcast(span))
        .withColumn("bkt", expr(bucketOf("v", "vmin", "vmax")))
        .groupBy("bkt")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
        .transform(CacheScope.persisted(_))
      val tot = bk.agg(sum(col("n")).as("nn"), sum(col("sy")).as("syt"))
      val cum1 = bk.as("b").join(bk.as("o"), col("o.bkt") <= col("b.bkt"))
        .groupBy(col("b.bkt").as("bkt"))
        .agg(sum(col("o.n")).as("nl"), sum(col("o.sy")).as("syl"))
        .crossJoin(broadcast(tot))
        .withColumn("nr", col("nn") - col("nl"))
        .withColumn("syr", col("syt") - col("syl"))
        .filter(col("nr") > 0)
      val g1 = round(col("syl").cast("double") * col("syl").cast("double") /
        col("nl").cast("double") +
        col("syr").cast("double") * col("syr").cast("double") /
          col("nr").cast("double"), 6)
      val best1 = cum1
        .select(struct(g1.as("g"), (-col("bkt")).as("nb"), col("bkt").as("b1"),
          col("nl").as("nl1"), col("syl").as("syl1"), col("nr").as("nr1"),
          col("syr").as("syr1"), col("nn"), col("syt")).as("s"))
        .agg(max(col("s")).as("m"))
        .select(col("m.b1").as("b1"), col("m.nl1").as("nl1"),
          col("m.syl1").as("syl1"), col("m.nr1").as("nr1"),
          col("m.syr1").as("syr1"), col("m.nn").as("nn"), col("m.syt").as("syt"))
        .transform(CacheScope.persisted(_))
      // Per-bucket residual stats in r·D units (all exact decimals).
      val r2 = bk.crossJoin(broadcast(best1))
        .withColumn("dd", (col("nl1").cast(DecimalType(12, 0)) *
          col("nr1").cast(DecimalType(12, 0))).cast(DecimalType(24, 0)))
        .withColumn("c", when(col("bkt") <= col("b1"),
            (col("syl1").cast(DecimalType(12, 0)) *
              col("nr1").cast(DecimalType(12, 0))).cast(DecimalType(24, 0)))
          .otherwise((col("syr1").cast(DecimalType(12, 0)) *
            col("nl1").cast(DecimalType(12, 0))).cast(DecimalType(24, 0))))
        .select(col("bkt"), col("n"), col("nl1"), col("nr1"),
          (col("sy").cast(DecimalType(12, 0)) * col("dd") -
            col("n").cast(DecimalType(12, 0)) * col("c"))
            .cast(DecimalType(24, 0)).as("sr"),
          (col("sy").cast(DecimalType(12, 0)) *
            ((col("dd") - col("c")).cast(DecimalType(11, 0)) *
              (col("dd") - col("c")).cast(DecimalType(11, 0)))
              .cast(DecimalType(23, 0)) +
            (col("n") - col("sy")).cast(DecimalType(12, 0)) *
              (col("c").cast(DecimalType(11, 0)) *
                col("c").cast(DecimalType(11, 0))).cast(DecimalType(23, 0)))
            .cast(DecimalType(36, 0)).as("sr2"))
        .transform(CacheScope.persisted(_))
      val tot2 = r2.agg(sum(col("sr")).cast(DecimalType(26, 0)).as("srt"),
        sum(col("sr2")).cast(DecimalType(38, 0)).as("sr2t"),
        sum(col("n")).as("nn2"),
        max(col("nl1")).as("dnl"), max(col("nr1")).as("dnr"))
      val cum2 = r2.as("b").join(r2.as("o"), col("o.bkt") <= col("b.bkt"))
        .groupBy(col("b.bkt").as("bkt"))
        .agg(sum(col("o.n")).as("nl"),
          sum(col("o.sr")).cast(DecimalType(26, 0)).as("srl"))
        .crossJoin(broadcast(tot2))
        .withColumn("nr", col("nn2") - col("nl"))
        .withColumn("srr", (col("srt") - col("srl")).cast(DecimalType(26, 0)))
        .filter(col("nr") > 0)
      val ddb = col("dnl").cast("double") * col("dnr").cast("double")
      val g2 = round((col("srl").cast("double") * col("srl").cast("double") /
        col("nl").cast("double") +
        col("srr").cast("double") * col("srr").cast("double") /
          col("nr").cast("double")) / (ddb * ddb), 6)
      val best2 = cum2
        .select(struct(g2.as("g"), (-col("bkt")).as("nb"), col("bkt").as("b2"),
          col("nl").as("nl2"), col("srl").as("srl2"), col("nr").as("nr2"),
          col("srr").as("srr2"), col("sr2t"), col("nn2"), col("dnl"),
          col("dnr")).as("s"))
        .agg(max(col("s")).as("m")).select(col("m.*"))
      val row1 = best1.select(lit(1L).as("stage"), col("b1").as("split_bucket"),
        round(col("syl1").cast("double") / col("nl1").cast("double"), 6)
          .as("leaf_left"),
        round(col("syr1").cast("double") / col("nr1").cast("double"), 6)
          .as("leaf_right"),
        round((col("syt").cast("double") -
          col("syl1").cast("double") * col("syl1").cast("double") /
            col("nl1").cast("double") -
          col("syr1").cast("double") * col("syr1").cast("double") /
            col("nr1").cast("double")) / col("nn").cast("double"), 6)
          .as("mse_after"))
      val row2 = best2.select(lit(2L).as("stage"), col("b2").as("split_bucket"),
        round(col("srl2").cast("double") /
          (col("nl2").cast("double") * ddb), 6).as("leaf_left"),
        round(col("srr2").cast("double") /
          (col("nr2").cast("double") * ddb), 6).as("leaf_right"),
        round((col("sr2t").cast("double") -
          col("srl2").cast("double") * col("srl2").cast("double") /
            col("nl2").cast("double") -
          col("srr2").cast("double") * col("srr2").cast("double") /
            col("nr2").cast("double")) /
          (ddb * ddb * col("nn2").cast("double")), 6).as("mse_after"))
      row1.unionByName(row2)
    }),

    // Two-feature ridge regression, closed form: predict line-item price
    // (cents) from quantity and discount by solving the 2x2 regularized
    // normal equations — q_stats_linreg's multivariate, shrunk sibling
    // (and the exact solve that anchors an iterative learner like
    // q_stats_logreg). ONE aggregation collapses the corpus to seven
    // exact-DECIMAL moments; the n-scaled centered moment matrix, the
    // ridge-damped determinant, and both betas are then a fixed double
    // expression tree over identical operands — no iteration, no
    // second pass, nothing grows with the corpus after the agg.
    "q_ml_ridge" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(
        cents(col("l_quantity")).cast(DecimalType(12, 0)).as("x1"),
        cents(col("l_discount")).cast(DecimalType(12, 0)).as("x2"),
        cents(col("l_extendedprice")).cast(DecimalType(14, 0)).as("y"))
      // Downcasts keep every cross-product inside DECIMAL(38): the widest
      // is n(10)·s1y(22) = 33 digits. Bench-SF bounds with headroom; the
      // q_stats_linreg dial applies past ~1e12 rows.
      val m = li.agg(
        count(lit(1)).cast(DecimalType(10, 0)).as("n"),
        sum(col("x1")).cast(DecimalType(14, 0)).as("s1"),
        sum(col("x2")).cast(DecimalType(14, 0)).as("s2"),
        sum(col("y")).cast(DecimalType(16, 0)).as("sy"),
        sum(col("x1") * col("x1")).cast(DecimalType(18, 0)).as("s11"),
        sum(col("x1") * col("x2")).cast(DecimalType(18, 0)).as("s12"),
        sum(col("x2") * col("x2")).cast(DecimalType(18, 0)).as("s22"),
        sum(col("x1") * col("y")).cast(DecimalType(22, 0)).as("s1y"),
        sum(col("x2") * col("y")).cast(DecimalType(22, 0)).as("s2y"))
      val a11 = (col("n") * col("s11") - col("s1") * col("s1")).cast("double") + expr(RidgeLambda)
      val a12 = (col("n") * col("s12") - col("s1") * col("s2")).cast("double")
      val a22 = (col("n") * col("s22") - col("s2") * col("s2")).cast("double") + expr(RidgeLambda)
      val r1 = (col("n") * col("s1y") - col("s1") * col("sy")).cast("double")
      val r2 = (col("n") * col("s2y") - col("s2") * col("sy")).cast("double")
      val det = a11 * a22 - a12 * a12
      val b1 = (a22 * r1 - a12 * r2) / det
      val b2 = (a11 * r2 - a12 * r1) / det
      m.filter(det =!= 0.0).select(
        col("n").cast("long").as("n"),
        round(b1, 9).as("beta_qty"),
        round(b2, 9).as("beta_disc"),
        round((col("sy").cast("double") - b1 * col("s1").cast("double") -
          b2 * col("s2").cast("double")) / (col("n").cast("double") * 100.0), 4)
          .as("intercept"),
        expr(RidgeLambda).as("lambda"))
    }),

    // One exact coordinate-descent sweep of the two-feature LASSO —
    // q_ml_ridge's sparsity-inducing sibling (the L1 penalty that a
    // feature-selection pass runs to find which signals matter at all,
    // where ridge only shrinks). From β = 0: β1 = S(r1, λ)/a11, then
    // β2 = S(r2 − β1·a12, λ)/a22 with soft-threshold S(v,λ) =
    // sign(v)·max(|v|−λ, 0) — the classic closed-form CD update on the
    // n-scaled centered moments, so it reuses the exact-DECIMAL moment
    // relation unchanged and needs NO iteration or second data pass.
    // β1 is round(,9)-pinned before β2 consumes it, so both engines
    // thread identical coefficients; λ rides the same n²-scale as
    // RidgeLambda (the dial note there applies verbatim).
    "q_ml_lasso_cd" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(
        cents(col("l_quantity")).cast(DecimalType(12, 0)).as("x1"),
        cents(col("l_discount")).cast(DecimalType(12, 0)).as("x2"),
        cents(col("l_extendedprice")).cast(DecimalType(14, 0)).as("y"))
      val m = li.agg(
        count(lit(1)).cast(DecimalType(10, 0)).as("n"),
        sum(col("x1")).cast(DecimalType(14, 0)).as("s1"),
        sum(col("x2")).cast(DecimalType(14, 0)).as("s2"),
        sum(col("y")).cast(DecimalType(16, 0)).as("sy"),
        sum(col("x1") * col("x1")).cast(DecimalType(18, 0)).as("s11"),
        sum(col("x1") * col("x2")).cast(DecimalType(18, 0)).as("s12"),
        sum(col("x2") * col("x2")).cast(DecimalType(18, 0)).as("s22"),
        sum(col("x1") * col("y")).cast(DecimalType(22, 0)).as("s1y"),
        sum(col("x2") * col("y")).cast(DecimalType(22, 0)).as("s2y"))
      val a11 = (col("n") * col("s11") - col("s1") * col("s1")).cast("double")
      val a12 = (col("n") * col("s12") - col("s1") * col("s2")).cast("double")
      val a22 = (col("n") * col("s22") - col("s2") * col("s2")).cast("double")
      val r1 = (col("n") * col("s1y") - col("s1") * col("sy")).cast("double")
      val r2 = (col("n") * col("s2y") - col("s2") * col("sy")).cast("double")
      def soft(v: Column): Column =
        signum(v) * greatest(abs(v) - expr(LassoLambda), lit(0.0))
      val b1 = round(soft(r1) / a11, 9)
      val b2 = round(soft(r2 - b1 * a12) / a22, 9)
      m.filter(a11 > 0.0 && a22 > 0.0).select(
        col("n").cast("long").as("n"),
        b1.as("beta_qty"),
        b2.as("beta_disc"),
        ((b1 =!= 0.0).cast("long") + (b2 =!= 0.0).cast("long")).as("nnz"),
        round((col("sy").cast("double") - b1 * col("s1").cast("double") -
          b2 * col("s2").cast("double")) / (col("n").cast("double") * 100.0), 4)
          .as("intercept"),
        expr(LassoLambda).as("lambda"))
    }))

  /** Ridge penalty on the n-scaled centered moment matrix (comparable to
    * S11 ~ n²·var at bench SF; a production run picks λ relative to the
    * measured trace — the dial, not the algebra, is scale-dependent).
    */
  val RidgeLambda = "1.0e16"

  /** LASSO soft-threshold level on the same n²-scaled moment scale as
    * [[RidgeLambda]] — chosen so the weak feature (discount) is driven
    * exactly to zero at bench SF while the strong one survives, which is
    * the behavior the operator exists to demonstrate.
    */
  val LassoLambda = "1.0e15"

  /** The shared Poisson(1) inverse-CDF CASE over the 24-bit draw. */
  private def poissonCase(u: Column): Column = {
    val base: Column = lit(PoissonThresh.length.toLong)
    PoissonThresh.zipWithIndex.reverse.foldLeft(base) {
      case (els, (thr, k)) => when(u < thr, k.toLong).otherwise(els)
    }
  }

  /** Same CASE chain as SQL text for the oracle. */
  private def poissonCaseSql(u: String): String =
    PoissonThresh.zipWithIndex
      .map { case (thr, k) => s"WHEN $u < $thr THEN $k" }
      .mkString("CASE ", " ", s" ELSE ${PoissonThresh.length} END")

  private val BucketSqlDuck =
    s"(v - vmin) * $RankBuckets // (vmax - vmin + 1)"

  /** Shared item-CF oracle CTE chain, closed by a `rec` relation of
    * (part_a, part_b, cooc, cosine, rk) plus the reusable `li`/`ni`
    * relations — q_itemcf_topk and q_rec_coverage both consume it.
    */
  private def itemcfCte: String =
    s"""WITH li AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), ni AS (SELECT pk, count(*) AS n FROM li GROUP BY 1),
       |cooc AS (
       |  SELECT a.pk, b.pk AS pk2, count(*) AS c
       |  FROM li a JOIN li b ON b.ok = a.ok AND a.pk < b.pk
       |  GROUP BY 1, 2 HAVING count(*) >= $ItemCfMinCooc
       |), sym AS (
       |  SELECT pk AS i, pk2 AS j, c FROM cooc
       |  UNION ALL
       |  SELECT pk2 AS i, pk AS j, c FROM cooc
       |), scored AS (
       |  SELECT s.i, s.j, s.c,
       |         round(CAST(s.c AS DOUBLE) /
       |               sqrt(CAST(a.n * b.n AS DOUBLE)), 6) AS cosine
       |  FROM sym s
       |  JOIN ni a ON a.pk = s.i
       |  JOIN ni b ON b.pk = s.j
       |), rec AS (
       |  SELECT i AS part_a, j AS part_b, c AS cooc, cosine,
       |         CAST(row_number() OVER (
       |           PARTITION BY i ORDER BY cosine DESC, j ASC) AS INTEGER) AS rk
       |  FROM scored
       |)""".stripMargin

  override val oracles: Map[String, String] = Map(

    "q_events_pattern" ->
      """WITH seqs AS (
        |  SELECT user_id,
        |         string_agg(upper(substr(event_type, 1, 1)), ''
        |                    ORDER BY ts, event_id) AS seq
        |  FROM events GROUP BY 1
        |)
        |SELECT user_id, CAST(length(seq) AS BIGINT) AS n_events,
        |       CAST((length(seq) - length(replace(seq, 'VCP', ''))) // 3 AS BIGINT)
        |         AS n_matches,
        |       (length(seq) - length(replace(seq, 'VCP', ''))) // 3 > 0 AS converted
        |FROM seqs""".stripMargin,

    "q_stats_mannwhitney" ->
      s"""WITH ev AS (
         |  SELECT event_type = 'purchase' AS g1, $CentsSql AS v
         |  FROM events WHERE event_type IN ('purchase', 'click')
         |), per AS (
         |  SELECT v, count(*) AS t,
         |         sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS t1
         |  FROM ev GROUP BY 1
         |), span AS (SELECT min(v) AS vmin, max(v) AS vmax FROM per),
         |b AS (
         |  SELECT per.*, $BucketSqlDuck AS bkt FROM per CROSS JOIN span
         |), bases AS (
         |  SELECT b0.bkt, coalesce(sum(o.t), 0) AS base
         |  FROM (SELECT bkt, sum(t) AS t FROM b GROUP BY 1) b0
         |  LEFT JOIN (SELECT bkt, sum(t) AS t FROM b GROUP BY 1) o
         |    ON o.bkt < b0.bkt
         |  GROUP BY 1
         |), ranked AS (
         |  SELECT b.t, b.t1,
         |         bases.base + coalesce(sum(b.t) OVER (
         |           PARTITION BY b.bkt ORDER BY b.v
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cbelow
         |  FROM b JOIN bases ON bases.bkt = b.bkt
         |), agg AS (
         |  SELECT sum(t1) AS n1, sum(t - t1) AS n2,
         |         CAST(sum(CAST(t1 AS DECIMAL(20,0)) *
         |                  CAST(2 * cbelow + t + 1 AS DECIMAL(20,0))) AS DECIMAL(38,0)) AS r1x2,
         |         CAST(sum(CAST(t AS DECIMAL(20,0)) * CAST(t AS DECIMAL(20,0)) *
         |                  CAST(t AS DECIMAL(20,0)) - CAST(t AS DECIMAL(20,0))) AS DECIMAL(38,0)) AS ties
         |  FROM ranked
         |)
         |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
         |       round((CAST(r1x2 AS DOUBLE) - CAST(n1 * (n1 + 1) AS DOUBLE)) / 2.0, 1) AS u1,
         |       round(((CAST(r1x2 AS DOUBLE) - CAST(n1 * (n1 + 1) AS DOUBLE)) -
         |              CAST(n1 * n2 AS DOUBLE)) /
         |             (2.0 * sqrt(CAST(n1 * n2 AS DOUBLE) / 12.0 *
         |                (CAST(n1 + n2 + 1 AS DOUBLE) -
         |                 CAST(ties AS DOUBLE) /
         |                 (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE))))),
         |             6) AS z,
         |       round(1.0 - (CAST(r1x2 AS DOUBLE) - CAST(n1 * (n1 + 1) AS DOUBLE)) /
         |             CAST(n1 * n2 AS DOUBLE), 6) AS rank_biserial
         |FROM agg""".stripMargin,

    "q_stats_bootstrap" ->
      s"""WITH ev AS (
         |  SELECT event_type, event_id, $CentsSql AS c FROM events
         |), drawn AS (
         |  SELECT event_type, rep, c,
         |         ${poissonCaseSql(
              "('0x' || substring(md5(CAST(event_id AS VARCHAR) || ':' || CAST(rep // 5 AS VARCHAR)), 1 + 6 * (rep % 5), 6))::BIGINT")} AS wt
         |  FROM ev CROSS JOIN (
         |    SELECT unnest(generate_series(0, ${BootReps - 1})) AS rep
         |  )
         |), reps AS (
         |  SELECT event_type, rep,
         |         round(CAST(sum(wt * c) AS DOUBLE) /
         |               CAST(sum(wt) * 100 AS DOUBLE), 6) AS bmean
         |  FROM drawn GROUP BY 1, 2 HAVING sum(wt) > 0
         |), boot AS (
         |  SELECT event_type, count(*) AS b,
         |         CAST(sum(CAST(bmean AS DECIMAL(18,6))) AS DECIMAL(24,6)) AS sb,
         |         CAST(sum(CAST(bmean AS DECIMAL(18,6)) *
         |                  CAST(bmean AS DECIMAL(18,6))) AS DECIMAL(30,12)) AS sbb
         |  FROM reps GROUP BY 1
         |), fl AS (
         |  SELECT event_type, count(*) AS n,
         |         round(CAST(sum(c) AS DOUBLE) / CAST(count(*) * 100 AS DOUBLE), 6) AS est
         |  FROM ev GROUP BY 1
         |)
         |SELECT f.event_type, f.n, f.est,
         |       round(sqrt(greatest(0.0,
         |         CAST(CAST(b.b AS DECIMAL(6,0)) * b.sbb - b.sb * b.sb AS DOUBLE) /
         |         CAST(b.b * (b.b - 1) AS DOUBLE))), 6) AS se_boot,
         |       round(f.est - 1.96 * sqrt(greatest(0.0,
         |         CAST(CAST(b.b AS DECIMAL(6,0)) * b.sbb - b.sb * b.sb AS DOUBLE) /
         |         CAST(b.b * (b.b - 1) AS DOUBLE))), 6) AS lo95,
         |       round(f.est + 1.96 * sqrt(greatest(0.0,
         |         CAST(CAST(b.b AS DECIMAL(6,0)) * b.sbb - b.sb * b.sb AS DOUBLE) /
         |         CAST(b.b * (b.b - 1) AS DOUBLE))), 6) AS hi95
         |FROM fl f JOIN boot b ON b.event_type = f.event_type""".stripMargin,

    "q_itemcf_topk" ->
      s"""$itemcfCte
         |SELECT part_a, part_b, cooc, cosine, rk
         |FROM rec WHERE rk <= $ItemCfTopK""".stripMargin,

    "q_rec_coverage" ->
      s"""$itemcfCte, recs AS (
         |  SELECT part_a, part_b FROM rec WHERE rk <= $ItemCfTopK
         |), nb AS (SELECT count(DISTINCT ok) AS n_baskets FROM li),
         |cat AS (SELECT count(*) AS n_catalog FROM part),
         |nov AS (
         |  SELECT count(*) AS n_recs,
         |         sum(CAST(round(-log2(CAST(n.n AS DOUBLE) /
         |                              CAST(nb.n_baskets AS DOUBLE)), 9)
         |                  AS DECIMAL(16,9))) AS snv
         |  FROM recs r JOIN ni n ON n.pk = r.part_b CROSS JOIN nb
         |), cov AS (SELECT count(DISTINCT part_b) AS n_rec_items FROM recs)
         |SELECT cov.n_rec_items, cat.n_catalog, nov.n_recs,
         |       round(CAST(cov.n_rec_items AS DOUBLE) /
         |             CAST(cat.n_catalog AS DOUBLE), 6) AS coverage,
         |       round(CAST(nov.snv AS DOUBLE) /
         |             CAST(nov.n_recs AS DOUBLE), 6) AS novelty_bits
         |FROM cov CROSS JOIN cat CROSS JOIN nov""".stripMargin,

    "q_ml_gbdt_round" ->
      s"""WITH o AS (
         |  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
         |         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
         |  FROM orders
         |), span AS (SELECT min(v) AS vmin, max(v) AS vmax FROM o),
         |bk AS (
         |  SELECT $BucketSqlDuck AS bkt, count(*) AS n, CAST(sum(y) AS BIGINT) AS sy
         |  FROM o, span GROUP BY 1
         |), tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, CAST(sum(sy) AS BIGINT) AS syt FROM bk),
         |cum1 AS (
         |  SELECT b.bkt, CAST(sum(ob.n) AS BIGINT) AS nl, CAST(sum(ob.sy) AS BIGINT) AS syl
         |  FROM bk b JOIN bk ob ON ob.bkt <= b.bkt GROUP BY 1
         |), c1 AS (
         |  SELECT c.bkt, c.nl, c.syl, t.nn - c.nl AS nr, t.syt - c.syl AS syr, t.nn, t.syt
         |  FROM cum1 c, tot t WHERE t.nn - c.nl > 0
         |), best1 AS (
         |  SELECT * FROM (
         |    SELECT bkt AS b1, nl AS nl1, syl AS syl1, nr AS nr1, syr AS syr1, nn, syt,
         |           round(CAST(syl AS DOUBLE) * CAST(syl AS DOUBLE) / CAST(nl AS DOUBLE) +
         |                 CAST(syr AS DOUBLE) * CAST(syr AS DOUBLE) / CAST(nr AS DOUBLE), 6) AS g
         |    FROM c1)
         |  ORDER BY g DESC, b1 ASC LIMIT 1
         |), r2p AS (
         |  SELECT bk.bkt, bk.n, bk.sy, b.nl1, b.nr1,
         |         CAST(b.nl1 AS HUGEINT) * b.nr1 AS dd,
         |         CASE WHEN bk.bkt <= b.b1 THEN CAST(b.syl1 AS HUGEINT) * b.nr1
         |              ELSE CAST(b.syr1 AS HUGEINT) * b.nl1 END AS c
         |  FROM bk, best1 b
         |), r2 AS (
         |  SELECT bkt, n, nl1, nr1,
         |         CAST(sy AS HUGEINT) * dd - CAST(n AS HUGEINT) * c AS sr,
         |         CAST(sy AS HUGEINT) * ((dd - c) * (dd - c)) +
         |         CAST(n - sy AS HUGEINT) * (c * c) AS sr2
         |  FROM r2p
         |), tot2 AS (
         |  SELECT sum(sr) AS srt, sum(sr2) AS sr2t, CAST(sum(n) AS BIGINT) AS nn2,
         |         max(nl1) AS dnl, max(nr1) AS dnr
         |  FROM r2
         |), cum2 AS (
         |  SELECT b.bkt, CAST(sum(ob.n) AS BIGINT) AS nl, sum(ob.sr) AS srl
         |  FROM r2 b JOIN r2 ob ON ob.bkt <= b.bkt GROUP BY 1
         |), c2 AS (
         |  SELECT c.bkt, c.nl, c.srl, t.nn2 - c.nl AS nr, t.srt - c.srl AS srr,
         |         t.sr2t, t.nn2, t.dnl, t.dnr
         |  FROM cum2 c, tot2 t WHERE t.nn2 - c.nl > 0
         |), best2 AS (
         |  SELECT * FROM (
         |    SELECT bkt AS b2, nl AS nl2, srl AS srl2, nr AS nr2, srr AS srr2,
         |           sr2t, nn2, dnl, dnr,
         |           round((CAST(srl AS DOUBLE) * CAST(srl AS DOUBLE) / CAST(nl AS DOUBLE) +
         |                  CAST(srr AS DOUBLE) * CAST(srr AS DOUBLE) / CAST(nr AS DOUBLE)) /
         |                 ((CAST(dnl AS DOUBLE) * CAST(dnr AS DOUBLE)) *
         |                  (CAST(dnl AS DOUBLE) * CAST(dnr AS DOUBLE))), 6) AS g
         |    FROM c2)
         |  ORDER BY g DESC, b2 ASC LIMIT 1
         |)
         |SELECT CAST(1 AS BIGINT) AS stage, b1 AS split_bucket,
         |       round(CAST(syl1 AS DOUBLE) / CAST(nl1 AS DOUBLE), 6) AS leaf_left,
         |       round(CAST(syr1 AS DOUBLE) / CAST(nr1 AS DOUBLE), 6) AS leaf_right,
         |       round((CAST(syt AS DOUBLE) -
         |              CAST(syl1 AS DOUBLE) * CAST(syl1 AS DOUBLE) / CAST(nl1 AS DOUBLE) -
         |              CAST(syr1 AS DOUBLE) * CAST(syr1 AS DOUBLE) / CAST(nr1 AS DOUBLE)) /
         |             CAST(nn AS DOUBLE), 6) AS mse_after
         |FROM best1
         |UNION ALL
         |SELECT CAST(2 AS BIGINT), b2,
         |       round(CAST(srl2 AS DOUBLE) /
         |             (CAST(nl2 AS DOUBLE) * (CAST(dnl AS DOUBLE) * CAST(dnr AS DOUBLE))), 6),
         |       round(CAST(srr2 AS DOUBLE) /
         |             (CAST(nr2 AS DOUBLE) * (CAST(dnl AS DOUBLE) * CAST(dnr AS DOUBLE))), 6),
         |       round((CAST(sr2t AS DOUBLE) -
         |              CAST(srl2 AS DOUBLE) * CAST(srl2 AS DOUBLE) / CAST(nl2 AS DOUBLE) -
         |              CAST(srr2 AS DOUBLE) * CAST(srr2 AS DOUBLE) / CAST(nr2 AS DOUBLE)) /
         |             ((CAST(dnl AS DOUBLE) * CAST(dnr AS DOUBLE)) *
         |              (CAST(dnl AS DOUBLE) * CAST(dnr AS DOUBLE)) * CAST(nn2 AS DOUBLE)), 6)
         |FROM best2""".stripMargin,

    "q_ml_ridge" ->
      s"""WITH li AS (
         |  SELECT CAST(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS DECIMAL(12,0)) AS x1,
         |         CAST(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS DECIMAL(12,0)) AS x2,
         |         CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS DECIMAL(14,0)) AS y
         |  FROM lineitem
         |), m AS (
         |  SELECT CAST(count(*) AS DECIMAL(10,0)) AS n,
         |         CAST(sum(x1) AS DECIMAL(14,0)) AS s1,
         |         CAST(sum(x2) AS DECIMAL(14,0)) AS s2,
         |         CAST(sum(y) AS DECIMAL(16,0)) AS sy,
         |         CAST(sum(x1 * x1) AS DECIMAL(18,0)) AS s11,
         |         CAST(sum(x1 * x2) AS DECIMAL(18,0)) AS s12,
         |         CAST(sum(x2 * x2) AS DECIMAL(18,0)) AS s22,
         |         CAST(sum(x1 * y) AS DECIMAL(22,0)) AS s1y,
         |         CAST(sum(x2 * y) AS DECIMAL(22,0)) AS s2y
         |  FROM li
         |), f AS (
         |  -- HUGEINT keeps the cross-products exact where DuckDB's
         |  -- fixed-precision decimal multiply overflows (Spark widens
         |  -- to DECIMAL(38) instead); both engines then cast the same
         |  -- exact integers to DOUBLE.
         |  SELECT n, s1, s2, sy,
         |         CAST(CAST(n AS HUGEINT) * CAST(s11 AS HUGEINT) -
         |              CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT) AS DOUBLE) + $RidgeLambda AS a11,
         |         CAST(CAST(n AS HUGEINT) * CAST(s12 AS HUGEINT) -
         |              CAST(s1 AS HUGEINT) * CAST(s2 AS HUGEINT) AS DOUBLE) AS a12,
         |         CAST(CAST(n AS HUGEINT) * CAST(s22 AS HUGEINT) -
         |              CAST(s2 AS HUGEINT) * CAST(s2 AS HUGEINT) AS DOUBLE) + $RidgeLambda AS a22,
         |         CAST(CAST(n AS HUGEINT) * CAST(s1y AS HUGEINT) -
         |              CAST(s1 AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) AS r1,
         |         CAST(CAST(n AS HUGEINT) * CAST(s2y AS HUGEINT) -
         |              CAST(s2 AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) AS r2
         |  FROM m
         |)
         |SELECT CAST(n AS BIGINT) AS n,
         |       round((a22 * r1 - a12 * r2) / (a11 * a22 - a12 * a12), 9) AS beta_qty,
         |       round((a11 * r2 - a12 * r1) / (a11 * a22 - a12 * a12), 9) AS beta_disc,
         |       round((CAST(sy AS DOUBLE) -
         |              ((a22 * r1 - a12 * r2) / (a11 * a22 - a12 * a12)) * CAST(s1 AS DOUBLE) -
         |              ((a11 * r2 - a12 * r1) / (a11 * a22 - a12 * a12)) * CAST(s2 AS DOUBLE)) /
         |             (CAST(n AS DOUBLE) * 100.0), 4) AS intercept,
         |       $RidgeLambda AS lambda
         |FROM f WHERE a11 * a22 - a12 * a12 <> 0""".stripMargin,

    "q_ml_lasso_cd" ->
      s"""WITH li AS (
         |  SELECT CAST(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT) AS DECIMAL(12,0)) AS x1,
         |         CAST(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS DECIMAL(12,0)) AS x2,
         |         CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS DECIMAL(14,0)) AS y
         |  FROM lineitem
         |), m AS (
         |  SELECT CAST(count(*) AS DECIMAL(10,0)) AS n,
         |         CAST(sum(x1) AS DECIMAL(14,0)) AS s1,
         |         CAST(sum(x2) AS DECIMAL(14,0)) AS s2,
         |         CAST(sum(y) AS DECIMAL(16,0)) AS sy,
         |         CAST(sum(x1 * x1) AS DECIMAL(18,0)) AS s11,
         |         CAST(sum(x1 * x2) AS DECIMAL(18,0)) AS s12,
         |         CAST(sum(x2 * x2) AS DECIMAL(18,0)) AS s22,
         |         CAST(sum(x1 * y) AS DECIMAL(22,0)) AS s1y,
         |         CAST(sum(x2 * y) AS DECIMAL(22,0)) AS s2y
         |  FROM li
         |), f AS (
         |  SELECT n, s1, s2, sy,
         |         CAST(CAST(n AS HUGEINT) * CAST(s11 AS HUGEINT) -
         |              CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT) AS DOUBLE) AS a11,
         |         CAST(CAST(n AS HUGEINT) * CAST(s12 AS HUGEINT) -
         |              CAST(s1 AS HUGEINT) * CAST(s2 AS HUGEINT) AS DOUBLE) AS a12,
         |         CAST(CAST(n AS HUGEINT) * CAST(s22 AS HUGEINT) -
         |              CAST(s2 AS HUGEINT) * CAST(s2 AS HUGEINT) AS DOUBLE) AS a22,
         |         CAST(CAST(n AS HUGEINT) * CAST(s1y AS HUGEINT) -
         |              CAST(s1 AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) AS r1,
         |         CAST(CAST(n AS HUGEINT) * CAST(s2y AS HUGEINT) -
         |              CAST(s2 AS HUGEINT) * CAST(sy AS HUGEINT) AS DOUBLE) AS r2
         |  FROM m
         |), b AS (
         |  SELECT *, round(sign(r1) * greatest(abs(r1) - $LassoLambda, 0.0) / a11, 9) AS b1
         |  FROM f
         |), b2t AS (
         |  SELECT *, round(sign(r2 - b1 * a12) *
         |                  greatest(abs(r2 - b1 * a12) - $LassoLambda, 0.0) / a22, 9) AS b2
         |  FROM b
         |)
         |SELECT CAST(n AS BIGINT) AS n,
         |       b1 AS beta_qty, b2 AS beta_disc,
         |       CAST((CASE WHEN b1 <> 0.0 THEN 1 ELSE 0 END) +
         |            (CASE WHEN b2 <> 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS nnz,
         |       round((CAST(sy AS DOUBLE) - b1 * CAST(s1 AS DOUBLE) -
         |              b2 * CAST(s2 AS DOUBLE)) / (CAST(n AS DOUBLE) * 100.0), 4) AS intercept,
         |       $LassoLambda AS lambda
         |FROM b2t WHERE a11 > 0.0 AND a22 > 0.0""".stripMargin,

    "q_ml_stump" ->
      s"""WITH ord AS (
         |  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v,
         |         o_orderpriority = '1-URGENT' AS pos
         |  FROM orders
         |), span AS (SELECT min(v) AS vmin, max(v) AS vmax FROM ord),
         |buckets AS (
         |  SELECT $BucketSqlDuck AS bkt,
         |         sum(CASE WHEN pos THEN 1 ELSE 0 END) AS p,
         |         sum(CASE WHEN pos THEN 0 ELSE 1 END) AS q
         |  FROM ord CROSS JOIN span GROUP BY 1
         |), cum AS (
         |  SELECT b.bkt, sum(o.p) AS pl, sum(o.q) AS ql
         |  FROM buckets b JOIN buckets o ON o.bkt <= b.bkt
         |  GROUP BY 1
         |), tot AS (SELECT sum(p) AS tp, sum(q) AS tq FROM buckets),
         |g AS (
         |  SELECT bkt, pl, ql, tp - pl AS pr, tq - ql AS qr
         |  FROM cum CROSS JOIN tot
         |  WHERE pl + ql > 0 AND (tp - pl) + (tq - ql) > 0
         |), scored AS (
         |  SELECT bkt, pl, ql, pr, qr,
         |         round(CAST(pl + ql AS DOUBLE) / CAST(pl + ql + pr + qr AS DOUBLE) *
         |               (1.0 - (CAST(pl AS DOUBLE) / CAST(pl + ql AS DOUBLE)) *
         |                      (CAST(pl AS DOUBLE) / CAST(pl + ql AS DOUBLE)) -
         |                      (CAST(ql AS DOUBLE) / CAST(pl + ql AS DOUBLE)) *
         |                      (CAST(ql AS DOUBLE) / CAST(pl + ql AS DOUBLE))) +
         |               CAST(pr + qr AS DOUBLE) / CAST(pl + ql + pr + qr AS DOUBLE) *
         |               (1.0 - (CAST(pr AS DOUBLE) / CAST(pr + qr AS DOUBLE)) *
         |                      (CAST(pr AS DOUBLE) / CAST(pr + qr AS DOUBLE)) -
         |                      (CAST(qr AS DOUBLE) / CAST(pr + qr AS DOUBLE)) *
         |                      (CAST(qr AS DOUBLE) / CAST(pr + qr AS DOUBLE))), 6) AS gini,
         |         round(CAST(greatest(pl, ql) + greatest(pr, qr) AS DOUBLE) /
         |               CAST(pl + ql + pr + qr AS DOUBLE), 6) AS acc
         |  FROM g
         |)
         |SELECT bkt AS split_bucket, gini, acc,
         |       CAST(pl AS BIGINT) AS pos_left, CAST(ql AS BIGINT) AS neg_left,
         |       CAST(pr AS BIGINT) AS pos_right, CAST(qr AS BIGINT) AS neg_right
         |FROM scored ORDER BY gini, bkt LIMIT 1""".stripMargin)
}
