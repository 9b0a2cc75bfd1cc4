package graft.relational

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.{QueryPack, Tables}

/** Feature-engineering and multiple-testing operators — the supervised
  * feature-prep layer a training pipeline runs between raw joins and model
  * fitting: leave-one-out target encoding (Micci-Barreca 2001), Weight of
  * Evidence / Information Value binning (the credit-scoring standard), the
  * Benjamini–Hochberg step-up FDR correction over a family of per-group
  * tests, and the Brown–Forsythe (median-centered Levene) equal-variance
  * test.
  *
  * Scale discipline: every operator reduces the corpus to a DOMAIN-bounded
  * relation first (25 brands, 11 discount bands, 25 nations, 3 return
  * flags) with one map-side-combining aggregation; everything after runs
  * on those bounded relations via broadcast self-joins — no windows, no
  * driver loops. Group medians for Brown–Forsythe come from the shared
  * [[graft.operators.RadixSelect]] (no sort, no per-row rank) — the
  * 3-group iteration is a bounded driver literal, the same exception as
  * q_stats_median_ci. Doubles appear only after exact integer/DECIMAL
  * moments, with round(,9) pins ahead of any cross-engine argmin/rank.
  */
object FeatureQueries extends QueryPack {

  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)

  /** Smoothing pseudo-count for the target encoder. */
  val EncodeM = 10

  /** BH family-wise alpha = 1/Alpha20 (exact rational compare). */
  val FdrAlphaInv = 20

  /** Histogram width shared with q_ml_tree_depth2 (same bucketization). */
  val TreeBkts = DecisionQueries.TreeBkts

  /** a..z → consonant-class digit (soundex classes; vowel class = 0). */
  val PhoneticMap = "01230120022455012623010202"

  /** Permutation-test replicate count (a dial; p-resolution 1/(B+1)). */
  val PermB = 200

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Class-imbalance weights over the embedding labels — the reweighting
    // table a trainer consumes when the label distribution is skewed:
    // inverse-frequency (N / (K·n_c), the sklearn "balanced" convention)
    // and the gentler sqrt-inverse (√(N/n_c), the common LLM-data
    // mixture compromise that under-corrects rare classes instead of
    // exploding their variance). One label-sized aggregation + a 1-row
    // broadcast; counts are exact integers, the two released doubles are
    // identical-operand divisions (sqrt is IEEE correctly-rounded in
    // both engines) under round(,6) pins.
    "q_ml_class_weights" -> ((s, d) => {
      val cls = t(s, d, "embeddings").groupBy(col("label"))
        .agg(count(lit(1)).as("n"))
      val tot = cls.agg(sum(col("n")).as("nn"), count(lit(1)).as("k"))
      cls.crossJoin(broadcast(tot))
        .select(col("label"), col("n").as("n_samples"),
          round(col("nn").cast("double") /
            (col("k") * col("n")).cast("double"), 6).as("w_invfreq"),
          round(sqrt(col("nn").cast("double") / col("n").cast("double")), 6)
            .as("w_sqrtinv"))
    }),

    // Leave-one-out target encoding of part brand against the lineitem
    // return label, with m=10 prior smoothing: for a row with label y,
    // enc = (sum_y - y + prior·m) / (n - 1 + m). The category relation is
    // DOMAIN-bounded (25 brands), so the whole encoder is one shuffled
    // equi-join (lineitem ⋈ part, both sides corpus-sized — the one
    // unavoidable shuffle) + one bounded aggregation; the per-row encode
    // a consumer applies is then a broadcast map join against these 25
    // rows. Output: both LOO values per category (y=1 / y=0) — the full
    // encoder table.
    "q_ml_target_encode" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_partkey").as("pk"),
        (col("l_returnflag") === "R").cast("long").as("y"))
      val pt = t(s, d, "part").select(col("p_partkey").as("pk"), col("p_brand"))
      val cat = li.join(pt, "pk").groupBy("p_brand")
        .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
      val tot = cat.agg(sum(col("n")).as("nn"), sum(col("sy")).as("gg"))
      cat.crossJoin(broadcast(tot))
        .select(col("p_brand"), col("n"), col("sy"),
          round(col("sy").cast("double") / col("n").cast("double"), 6).as("raw_rate"),
          round((col("sy").cast("double") - 1.0 +
            col("gg").cast("double") / col("nn").cast("double") * EncodeM) /
            (col("n").cast("double") - 1.0 + EncodeM), 6).as("enc_pos"),
          round((col("sy").cast("double") +
            col("gg").cast("double") / col("nn").cast("double") * EncodeM) /
            (col("n").cast("double") - 1.0 + EncodeM), 6).as("enc_neg"))
    }),

    // Weight of Evidence / Information Value of the discount band against
    // the return flag: woe_b = ln((good_b/G)/(bad_b/B)), iv_b =
    // (good_b/G - bad_b/B)·woe_b, IV = Σ iv_b. Bands are the 11-value
    // discount domain; counts are exact longs, so the only doubles are
    // the final ratio/ln per band. Per-band iv is round(,9)-pinned into
    // DECIMAL before the exact total fold (the mm_phash lesson: never let
    // an unpinned double chain cross an aggregation the oracle re-runs).
    "q_ml_woe_iv" -> ((s, d) => {
      val bins = t(s, d, "lineitem")
        .groupBy(expr("CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)")
          .as("band"))
        .agg(sum((col("l_returnflag") =!= "R").cast("long")).as("g"),
          sum((col("l_returnflag") === "R").cast("long")).as("b"))
        .filter(col("g") > 0 && col("b") > 0)
        .transform(graft.CacheScope.persisted(_))
      val tot = bins.agg(sum(col("g")).as("gg"), sum(col("b")).as("bb"))
      val woed = bins.crossJoin(broadcast(tot))
        .withColumn("woe", round(
          log((col("g").cast("double") / col("gg").cast("double")) /
            (col("b").cast("double") / col("bb").cast("double"))), 9))
        .withColumn("iv_bin", round(
          (col("g").cast("double") / col("gg").cast("double") -
            col("b").cast("double") / col("bb").cast("double")) * col("woe"), 9)
          .cast(DecimalType(20, 9)))
        .transform(graft.CacheScope.persisted(_))
      val iv = woed.agg(sum(col("iv_bin")).as("ivt"))
      woed.crossJoin(broadcast(iv))
        .select(col("band"), (col("g") + col("b")).as("n"),
          round(col("woe"), 6).as("woe"),
          round(col("iv_bin").cast("double"), 6).as("iv_bin"),
          round(col("ivt").cast("double"), 6).as("iv_total"))
    }),

    // Benjamini–Hochberg step-up FDR over the per-nation urgent-rate
    // z-tests: p-values from the Abramowitz–Stegun 26.2.17 normal-tail
    // polynomial (explicit double constants, identical expression text in
    // both engines, round(,9)-pinned BEFORE ranking), ranks from a
    // broadcast self-join over the 25-row test relation (no window), and
    // the step-up threshold p_(k) ≤ k/(α⁻¹·m) compared EXACTLY as
    // p·α⁻¹·m ≤ k in DECIMAL — the cross-engine-fragile inequality never
    // touches floating point.
    "q_stats_fdr_bh" -> ((s, d) => {
      val ord = t(s, d, "orders").select(col("o_custkey").as("ck"),
        (col("o_orderpriority") === "1-URGENT").cast("long").as("x"))
      val cust = t(s, d, "customer")
        .select(col("c_custkey").as("ck"), col("c_nationkey").as("nation"))
      val per = ord.join(cust, "ck").groupBy("nation")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("x"))
      val tot = per.agg(sum(col("n")).as("nn"), sum(col("x")).as("xx"))
      val p0 = col("xx").cast("double") / col("nn").cast("double")
      val z = (col("x").cast("double") / col("n").cast("double") - p0) /
        sqrt(p0 * (lit(1.0) - p0) / col("n").cast("double"))
      val az = abs(z)
      val tt = lit(1.0) / (lit(1.0) + lit(0.2316419) * az)
      val phi = exp(az * az * lit(-0.5)) / lit(2.5066282746310002)
      val poly = tt * (lit(0.319381530) + tt * (lit(-0.356563782) +
        tt * (lit(1.781477937) + tt * (lit(-1.821255978) +
          tt * lit(1.330274429)))))
      val tests = per.crossJoin(broadcast(tot))
        .select(col("nation"), col("n"), col("x"),
          round(lit(2.0) * phi * poly, 9).cast(DecimalType(12, 9)).as("p"))
        .transform(graft.CacheScope.persisted(_))
      val ranked = tests.as("a")
        .join(broadcast(tests.select(col("nation").as("n2"), col("p").as("p2"))),
          col("p2") < col("p") || (col("p2") === col("p") && col("n2") <= col("nation")))
        .groupBy(col("nation")).agg(max(col("p")).as("p"),
          max(col("n")).as("n"), max(col("x")).as("x"),
          count(lit(1)).as("rank"))
        .transform(graft.CacheScope.persisted(_))
      val m = ranked.agg(count(lit(1)).as("m"))
      val withM = ranked.crossJoin(broadcast(m))
      val kstar = withM
        .filter(col("p") * FdrAlphaInv * col("m") <= col("rank"))
        .agg(max(col("rank")).as("kstar"))
      withM.crossJoin(broadcast(kstar))
        .select(col("nation"), col("n"), col("x"),
          round(col("p").cast("double"), 6).as("pval"), col("rank"),
          (col("kstar").isNotNull && col("rank") <= col("kstar")).as("rejected"))
    }),

    // Two rounds of AdaBoost with decision stumps over the tree_depth2
    // bucket pair (64-bin totalprice / orderdate histograms): round 1
    // searches all (threshold, polarity) stumps on exact counts; the
    // weight update never calls exp — exp(±α) = sqrt((1-e)/e)^{±1}
    // exactly, and sqrt IS correctly rounded, so the round-2 weighted
    // histogram folds cnt × round(w,9) in exact DECIMAL and the second
    // argmin compares exact decimals. Each round is one bounded
    // aggregation over the same persisted bucket scan + a ≤64-row prefix
    // self-join — the schoolbook boosting loop with zero re-scans.
    "q_ml_adaboost_round" -> ((s, d) => {
      val ord = t(s, d, "orders").select(
        expr("CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT)").as("v1"),
        expr("CAST(datediff(CAST(o_orderdate AS DATE), DATE'1990-01-01') AS BIGINT)")
          .as("v2"),
        (col("o_orderpriority") === "1-URGENT").as("pos"))
      val span = ord.agg(min(col("v1")).as("n1"), max(col("v1")).as("x1"),
        min(col("v2")).as("n2"), max(col("v2")).as("x2"))
      val bk = ord.crossJoin(broadcast(span))
        .select(expr(s"CAST((v1 - n1) * $TreeBkts AS BIGINT) div (x1 - n1 + 1)").as("b1"),
          expr(s"CAST((v2 - n2) * $TreeBkts AS BIGINT) div (x2 - n2 + 1)").as("b2"),
          col("pos"))
        .transform(graft.CacheScope.persisted(_))
      val c1 = bk.groupBy("b1")
        .agg(sum(when(col("pos"), 1L).otherwise(0L)).as("p"),
          sum(when(col("pos"), 0L).otherwise(1L)).as("q"))
      val tot1 = c1.agg(sum(col("p")).as("pp"), sum(col("q")).as("qq"))
      val cum1 = c1.as("b").join(broadcast(c1.as("o")), col("o.b1") <= col("b.b1"))
        .groupBy(col("b.b1").as("t"))
        .agg(sum(col("o.p")).as("pl"), sum(col("o.q")).as("ql"))
        .crossJoin(broadcast(tot1))
      // pol 0: left side predicts positive; pol 1: right side does
      val best1 = cum1.select(col("t"), col("pp"), col("qq"),
          least(struct((col("ql") + col("pp") - col("pl")).as("e"),
              col("t"), lit(0L).as("pol")),
            struct((col("pl") + col("qq") - col("ql")).as("e"),
              col("t"), lit(1L).as("pol"))).as("cand"))
        .agg(min(col("cand")).as("m"), max(col("pp") + col("qq")).as("nn"))
        .select(col("m.t").as("t1"), col("m.pol").as("pol1"),
          greatest(col("m.e"), lit(1L)).as("e1"), col("nn"))
        .withColumn("wr", round(sqrt((col("nn") - col("e1")).cast("double") /
          col("e1").cast("double")), 9).cast(DecimalType(16, 9)))
        .withColumn("wc", round(sqrt(col("e1").cast("double") /
          (col("nn") - col("e1")).cast("double")), 9).cast(DecimalType(16, 9)))
      val c2 = bk.crossJoin(broadcast(best1))
        .withColumn("correct",
          when(col("pol1") === 0, (col("b1") <= col("t1")) === col("pos"))
            .otherwise((col("b1") > col("t1")) === col("pos")))
        .groupBy("b2")
        .agg(sum(when(col("pos"),
            when(col("correct"), col("wc")).otherwise(col("wr")))
            .otherwise(lit(0).cast(DecimalType(16, 9)))).as("pw"),
          sum(when(!col("pos"),
            when(col("correct"), col("wc")).otherwise(col("wr")))
            .otherwise(lit(0).cast(DecimalType(16, 9)))).as("qw"))
      val tot2 = c2.agg(sum(col("pw")).as("ppw"), sum(col("qw")).as("qqw"))
      val cum2 = c2.as("b").join(broadcast(c2.as("o")), col("o.b2") <= col("b.b2"))
        .groupBy(col("b.b2").as("t"))
        .agg(sum(col("o.pw")).as("pwl"), sum(col("o.qw")).as("qwl"))
        .crossJoin(broadcast(tot2))
      val best2 = cum2.select(
          least(struct((col("qwl") + col("ppw") - col("pwl")).as("e"),
              col("t"), lit(0L).as("pol")),
            struct((col("pwl") + col("qqw") - col("qwl")).as("e"),
              col("t"), lit(1L).as("pol"))).as("cand"))
        .agg(min(col("cand")).as("m"))
        .crossJoin(broadcast(tot2))
        .select(col("m.t").as("t2"), col("m.pol").as("pol2"),
          col("m.e").cast("double").as("e2w"),
          (col("ppw") + col("qqw")).cast("double").as("ww"))
      val r1 = best1.select(lit(1L).as("round"), lit("totalprice").as("feature"),
        col("t1").as("threshold"), col("pol1").as("polarity"),
        round(col("e1").cast("double") / col("nn").cast("double"), 6).as("err_rate"),
        round(log((col("nn") - col("e1")).cast("double") /
          col("e1").cast("double")) * 0.5, 6).as("alpha"))
      val r2 = best2.select(lit(2L).as("round"), lit("orderdate").as("feature"),
        col("t2").as("threshold"), col("pol2").as("polarity"),
        round(col("e2w") / col("ww"), 6).as("err_rate"),
        round(log((col("ww") - col("e2w")) / col("e2w")) * 0.5, 6).as("alpha"))
      r1.unionByName(r2)
    }),

    // Phonetic-key blocking for entity resolution over the part noun
    // (second word of p_name): a soundex-style code — first letter +
    // consonant-class digits with adjacent duplicates collapsed and
    // vowel-class zeros dropped, rpad'ed to 4 — built with translate()
    // plus ONE fold over the char array (no regex backreferences, which
    // RE2-based engines lack). Blocking reduces the candidate-pair space
    // from |parts|² to Σ_block C(n,2): the output reports exactly that
    // contraction per block. The oracle collapses duplicates with a
    // lag-window sweep instead of a fold — algorithmic diversity, same
    // answer.
    "q_er_phonetic" -> ((s, d) => {
      val words = t(s, d, "part")
        .select(element_at(split(col("p_name"), " "), 2).as("w"))
        .withColumn("coded", translate(expr("substr(w, 2)"),
          "abcdefghijklmnopqrstuvwxyz", PhoneticMap))
        .withColumn("dedup", expr(
          "aggregate(split(coded, ''), '', (acc, c) -> " +
            "CASE WHEN c = '' OR right(acc, 1) = c THEN acc " +
            "ELSE concat(acc, c) END)"))
        .withColumn("key", rpad(concat(upper(expr("substr(w, 1, 1)")),
          expr("substr(replace(dedup, '0', ''), 1, 3)")), 4, "0"))
      words.groupBy("key")
        .agg(count(lit(1)).as("n_parts"),
          countDistinct(col("w")).as("n_nouns"),
          min(col("w")).as("first_noun"), max(col("w")).as("last_noun"))
        .withColumn("n_pairs", expr("(n_parts * (n_parts - 1)) div 2"))
    }),

    // Exact per-group percentile bands (P10/P25/P50/P75/P90 of
    // extendedprice per return flag) — the grouped-quantile profile a
    // feature store materializes — via [[graft.operators.RadixSelect
    // .ranksByGroup]]: ALL 15 (group, rank) cursors narrow through the
    // SAME 5 bounded aggregations; no sort, no window, no percentile
    // state. Ranks are ceil(n·p/100) (a real data value, never an
    // average), so every band is reproducible to the cent.
    "q_stats_quartile_bands" -> ((s, d) => {
      import s.implicits._
      val v = t(s, d, "lineitem")
        .select(col("l_returnflag").as("flag"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("v"))
        .transform(graft.CacheScope.persisted(_))
      // Per-group n AND max in ONE pass over the cache (r16): the maxes
      // feed RadixSelect's per-group level skip, folding away its own
      // max job.
      val gstats = v.groupBy("flag")
        .agg(count(lit(1)).as("n"), max(col("v")).as("mx"))
        .collect()
        .map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Long]("mx")))
        .sortBy(_._1)
      val ns = gstats.map { case (g, (n, _)) => g -> n }
      val pcts = Seq(10L, 25L, 50L, 75L, 90L)
      val sel = graft.operators.RadixSelect.ranksByGroup(v, "flag", "v",
        ns.map { case (g, n) => g -> pcts.map(p => (n * p + 99) / 100) }.toMap,
        Some(gstats.map { case (g, (_, mx)) => g -> mx }.toMap))
      ns.toSeq.map { case (g, n) =>
        val Seq(p10, p25, p50, p75, p90) =
          pcts.map(p => sel((g, (n * p + 99) / 100)) / 100.0)
        (g, n, p10, p25, p50, p75, p90)
      }.toDF("flag", "n", "p10_usd", "p25_usd", "p50_usd", "p75_usd", "p90_usd")
    }),

    // Chi-square feature ranking against the return label — the filter
    // feature-selection pass a training pipeline runs before fitting:
    // five candidate categorical features are exploded out of ONE scan
    // (array-of-struct explode, so adding a feature never adds a scan),
    // each feature's 2×k contingency chi² is assembled from exact cell
    // counts with per-cell terms round(,9)-pinned into DECIMAL before
    // the fold, and the final ranking is a broadcast prefix-join over
    // the 5-row feature relation.
    "q_ml_chi2_rank" -> ((s, d) => {
      val li = t(s, d, "lineitem").join(
        t(s, d, "part").select(col("p_partkey").as("l_partkey"), col("p_brand")),
        "l_partkey")
      val cells = li.select(
          (col("l_returnflag") === "R").as("pos"),
          explode(array(
            struct(lit("brand").as("feature"), col("p_brand").as("cat")),
            struct(lit("discount_band").as("feature"),
              expr("CAST(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS STRING)")
                .as("cat")),
            struct(lit("quantity_band").as("feature"),
              expr("CAST(CAST(l_quantity AS BIGINT) div 5 AS STRING)").as("cat")),
            struct(lit("ship_month").as("feature"),
              expr("CAST(month(l_shipdate) AS STRING)").as("cat")),
            struct(lit("linestatus").as("feature"), col("l_linestatus").as("cat"))))
            .as("f"))
        .groupBy(col("f.feature").as("feature"), col("f.cat").as("cat"))
        .agg(count(lit(1)).as("n"), sum(when(col("pos"), 1L).otherwise(0L)).as("r"))
      val tot = cells.groupBy(col("feature").as("tf"))
        .agg(sum(col("n")).as("nn"), sum(col("r")).as("rr"))
      val nD = col("n").cast("double")
      val nnD = col("nn").cast("double")
      val rrD = col("rr").cast("double")
      val ePos = nD * rrD / nnD
      val eNeg = nD * (nnD - rrD) / nnD
      val rD = col("r").cast("double")
      val term = (rD - ePos) * (rD - ePos) / ePos +
        ((nD - rD) - eNeg) * ((nD - rD) - eNeg) / eNeg
      val byFeat = cells.join(broadcast(tot), col("feature") === col("tf"))
        .select(col("feature"),
          round(term, 9).cast(DecimalType(24, 9)).as("term"))
        .groupBy("feature")
        .agg(count(lit(1)).as("n_cells"), sum(col("term")).as("chi2d"))
        .select(col("feature"), col("n_cells"), (col("n_cells") - 1).as("dof"),
          round(col("chi2d").cast("double"), 6).as("chi2"))
        .transform(graft.CacheScope.persisted(_))
      byFeat.as("a")
        .join(broadcast(byFeat.select(col("feature").as("f2"), col("chi2").as("c2"))),
          col("c2") > col("chi2") ||
            (col("c2") === col("chi2") && col("f2") <= col("feature")))
        .groupBy(col("feature"))
        .agg(max(col("n_cells")).as("n_cells"), max(col("dof")).as("dof"),
          max(col("chi2")).as("chi2"), count(lit(1)).as("rank"))
    }),

    // Permutation test of the per-variant purchase-value difference:
    // the observed md5-parity split's mean gap is compared against
    // [[PermB]] label permutations, each a fresh deterministic hash
    // md5(user:b) — no RNG, both engines rebuild the identical null
    // distribution. The corpus collapses to the per-user (count, sum)
    // relation FIRST, so the B-fold replicate blowup multiplies |users|,
    // never |events| (and is a narrow broadcast-range nested loop, the
    // allowed bounded-broadcast shape); per-permutation gaps are
    // round(,9)-pinned into DECIMAL before the exceedance count, so the
    // p-value is a deterministic integer ratio.
    "q_stats_permutation" -> ((s, d) => {
      val perUser = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(count(lit(1)).as("k"),
          sum(expr("CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT)")).as("sv"))
        .transform(graft.CacheScope.persisted(_))
      def gap(v: Column): Column =
        round(
          sum(when(v === 0, col("sv"))).cast("double") /
            sum(when(v === 0, col("k"))).cast("double") -
          sum(when(v === 1, col("sv"))).cast("double") /
            sum(when(v === 1, col("k"))).cast("double"), 9)
          .cast(DecimalType(18, 9))
      val obsRow = perUser
        .select((conv(substring(md5(col("user_id").cast("string")), 1, 6), 16, 10)
          .cast("long") % 2).as("v"), col("k"), col("sv"))
        .agg(gap(col("v")).as("diff_obs"), count(lit(1)).as("n_users"))
      val permDiff = perUser
        .crossJoin(broadcast(s.range(1, PermB + 1).select(col("id").as("b"))))
        .select(col("b"),
          (conv(substring(md5(concat(col("user_id").cast("string"), lit(":"),
            col("b").cast("string"))), 1, 6), 16, 10).cast("long") % 2).as("v"),
          col("k"), col("sv"))
        .groupBy("b").agg(gap(col("v")).as("diff_b"))
      permDiff.crossJoin(broadcast(obsRow))
        .agg(max(col("n_users")).as("n_users"),
          max(col("diff_obs")).as("dobs"),
          sum(when(abs(col("diff_b")) >= abs(col("diff_obs")), 1L).otherwise(0L))
            .as("n_exceed"))
        .select(col("n_users"),
          round(col("dobs").cast("double") / 100.0, 6).as("diff_obs_usd"),
          lit(PermB.toLong).as("n_perms"), col("n_exceed"),
          round((lit(1.0) + col("n_exceed").cast("double")) / (PermB + 1.0), 6)
            .as("p_value"))
    }),

    // Brown–Forsythe equal-variance test of extendedprice across the 3
    // return-flag groups: center each group at its exact LOWER median
    // (rank (n+1)/2 via RadixSelect.kthByGroup — ALL groups narrowed in
    // the same 5 bounded aggregations over the persisted cents column,
    // no sort, no window; measured 4.15 s -> per-group kth replaced),
    // then one-way ANOVA on the absolute deviations from exact DECIMAL
    // moments. Doubles enter only in the final F assembly.
    "q_stats_levene" -> ((s, d) => {
      val v = t(s, d, "lineitem")
        .select(col("l_returnflag").as("flag"),
          expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)")
            .as("v"))
        .transform(graft.CacheScope.persisted(_))
      // Per-group n AND max in one pass (r16) — see q_stats_quartile_bands.
      val gstats = v.groupBy("flag")
        .agg(count(lit(1)).as("n"), max(col("v")).as("mx"))
        .collect()
        .map(r => r.getString(0) -> (r.getAs[Long]("n"), r.getAs[Long]("mx")))
        .sortBy(_._1)
      val groups = gstats.map { case (g, (n, _)) => g -> n }
      val meds = graft.operators.RadixSelect.kthByGroup(v, "flag", "v",
        groups.map { case (g, n) => g -> (n + 1) / 2 }.toMap,
        Some(gstats.map { case (g, (_, mx)) => g -> mx }.toMap))
      val medCol = groups.map(_._1).foldRight(lit(-1L): Column) { (g, acc) =>
        when(col("flag") === g, lit(meds(g))).otherwise(acc)
      }
      val zg = v.select(col("flag"), abs(col("v") - medCol).as("z"))
        .groupBy("flag")
        .agg(count(lit(1)).as("n"),
          sum(col("z").cast(DecimalType(14, 0))).cast(DecimalType(24, 0)).as("sz"),
          sum((col("z").cast(DecimalType(14, 0)) * col("z").cast(DecimalType(14, 0)))
            .cast(DecimalType(28, 0))).cast(DecimalType(34, 0)).as("szz"))
        .transform(graft.CacheScope.persisted(_))
      val g = zg.agg(count(lit(1)).as("k"), sum(col("n")).as("nn"),
        sum(col("sz")).cast(DecimalType(30, 0)).as("tsz"),
        sum(col("szz")).cast(DecimalType(38, 0)).as("tszz"),
        sum(round(col("sz").cast("double") * col("sz").cast("double") /
          col("n").cast("double"), 4).cast(DecimalType(30, 4))).as("szn"))
      val f = g.select(col("k"), col("nn"),
        round(((col("szn").cast("double") -
          col("tsz").cast("double") * col("tsz").cast("double") /
            col("nn").cast("double")) / (col("k").cast("double") - 1.0)) /
          ((col("tszz").cast("double") - col("szn").cast("double")) /
            (col("nn").cast("double") - col("k").cast("double"))), 6).as("f_stat"),
        (col("k") - 1).as("df1"), (col("nn") - col("k")).as("df2"))
      zg.crossJoin(broadcast(f))
        .select(col("flag"), col("n"),
          round(medCol.cast("double") / 100.0, 2).as("med_usd"),
          round(col("sz").cast("double") / col("n").cast("double") / 100.0, 4)
            .as("zbar_usd"),
          col("f_stat"), col("df1"), col("df2"))
    }))

  /** The A&S normal-tail p-value SQL over a DOUBLE column expr `z` —
    * identical constant text to the Spark builder.
    */
  private def pvalSql(z: String): String =
    s"""round(2.0 * exp(($z) * ($z) * -0.5) / 2.5066282746310002 *
       |  ((1.0 / (1.0 + 0.2316419 * ($z))) * (0.319381530 +
       |   (1.0 / (1.0 + 0.2316419 * ($z))) * (-0.356563782 +
       |   (1.0 / (1.0 + 0.2316419 * ($z))) * (1.781477937 +
       |   (1.0 / (1.0 + 0.2316419 * ($z))) * (-1.821255978 +
       |   (1.0 / (1.0 + 0.2316419 * ($z))) * 1.330274429))))), 9)""".stripMargin

  override val oracles: Map[String, String] = Map(

    "q_ml_class_weights" ->
      """WITH cls AS (SELECT label, count(*) AS n FROM embeddings GROUP BY 1),
        |tot AS (SELECT CAST(sum(n) AS BIGINT) AS nn, count(*) AS k FROM cls)
        |SELECT label, n AS n_samples,
        |       round(CAST(nn AS DOUBLE) / CAST(k * n AS DOUBLE), 6) AS w_invfreq,
        |       round(sqrt(CAST(nn AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS w_sqrtinv
        |FROM cls, tot""".stripMargin,

    "q_ml_target_encode" ->
      s"""WITH cat AS (
         |  SELECT p_brand, count(*) AS n,
         |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
         |              AS BIGINT) AS sy
         |  FROM lineitem JOIN part ON p_partkey = l_partkey
         |  GROUP BY 1
         |), tot AS (SELECT sum(n) AS nn, sum(sy) AS gg FROM cat)
         |SELECT p_brand, n, sy,
         |       round(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 6) AS raw_rate,
         |       round((CAST(sy AS DOUBLE) - 1.0 +
         |              CAST(gg AS DOUBLE) / CAST(nn AS DOUBLE) * $EncodeM) /
         |             (CAST(n AS DOUBLE) - 1.0 + $EncodeM), 6) AS enc_pos,
         |       round((CAST(sy AS DOUBLE) +
         |              CAST(gg AS DOUBLE) / CAST(nn AS DOUBLE) * $EncodeM) /
         |             (CAST(n AS DOUBLE) - 1.0 + $EncodeM), 6) AS enc_neg
         |FROM cat, tot""".stripMargin,

    "q_ml_woe_iv" ->
      """WITH bins AS (
        |  SELECT CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT) AS band,
        |         CAST(sum(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS g,
        |         CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS b
        |  FROM lineitem GROUP BY 1
        |  HAVING g > 0 AND b > 0
        |), tot AS (SELECT sum(g) AS gg, sum(b) AS bb FROM bins),
        |woed AS (
        |  SELECT band, g + b AS n,
        |         round(ln((CAST(g AS DOUBLE) / CAST(gg AS DOUBLE)) /
        |                  (CAST(b AS DOUBLE) / CAST(bb AS DOUBLE))), 9) AS woe,
        |         CAST(round((CAST(g AS DOUBLE) / CAST(gg AS DOUBLE) -
        |                     CAST(b AS DOUBLE) / CAST(bb AS DOUBLE)) *
        |                    round(ln((CAST(g AS DOUBLE) / CAST(gg AS DOUBLE)) /
        |                             (CAST(b AS DOUBLE) / CAST(bb AS DOUBLE))), 9), 9)
        |              AS DECIMAL(20,9)) AS iv_bin
        |  FROM bins, tot
        |), iv AS (SELECT sum(iv_bin) AS ivt FROM woed)
        |SELECT band, n, round(woe, 6) AS woe,
        |       round(CAST(iv_bin AS DOUBLE), 6) AS iv_bin,
        |       round(CAST(ivt AS DOUBLE), 6) AS iv_total
        |FROM woed, iv""".stripMargin,

    "q_stats_fdr_bh" ->
      s"""WITH per AS (
         |  SELECT c_nationkey AS nation, count(*) AS n,
         |         CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)
         |              AS BIGINT) AS x
         |  FROM orders JOIN customer ON c_custkey = o_custkey
         |  GROUP BY 1
         |), tot AS (SELECT sum(n) AS nn, sum(x) AS xx FROM per),
         |tests AS (
         |  SELECT nation, n, x,
         |         CAST(${pvalSql(
        """abs((CAST(x AS DOUBLE) / CAST(n AS DOUBLE) -
          |   CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE)) /
          |  sqrt(CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE) *
          |       (1.0 - CAST(xx AS DOUBLE) / CAST(nn AS DOUBLE)) /
          |       CAST(n AS DOUBLE)))""".stripMargin)} AS DECIMAL(12,9)) AS p
         |  FROM per, tot
         |), ranked AS (
         |  SELECT a.nation, max(a.p) AS p, max(a.n) AS n, max(a.x) AS x,
         |         count(*) AS rank
         |  FROM tests a JOIN tests b
         |    ON b.p < a.p OR (b.p = a.p AND b.nation <= a.nation)
         |  GROUP BY 1
         |), m AS (SELECT count(*) AS m FROM ranked),
         |kstar AS (
         |  SELECT max(rank) AS kstar FROM ranked, m
         |  WHERE p * $FdrAlphaInv * m <= rank
         |)
         |SELECT nation, n, x, round(CAST(p AS DOUBLE), 6) AS pval, rank,
         |       kstar IS NOT NULL AND rank <= kstar AS rejected
         |FROM ranked, kstar""".stripMargin,

    "q_ml_adaboost_round" ->
      s"""WITH ord AS (
         |  SELECT CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v1,
         |         CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE))
         |              AS BIGINT) AS v2,
         |         o_orderpriority = '1-URGENT' AS pos
         |  FROM orders
         |), span AS (
         |  SELECT min(v1) AS n1, max(v1) AS x1, min(v2) AS n2, max(v2) AS x2 FROM ord
         |), bk AS (
         |  SELECT CAST((v1 - n1) * $TreeBkts AS BIGINT) // (x1 - n1 + 1) AS b1,
         |         CAST((v2 - n2) * $TreeBkts AS BIGINT) // (x2 - n2 + 1) AS b2, pos
         |  FROM ord, span
         |), c1 AS (
         |  SELECT b1, CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS p,
         |         CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT) AS q
         |  FROM bk GROUP BY 1
         |), tot1 AS (
         |  SELECT CAST(sum(p) AS BIGINT) AS pp, CAST(sum(q) AS BIGINT) AS qq FROM c1
         |), cum1 AS (
         |  SELECT b.b1 AS t, CAST(sum(o.p) AS BIGINT) AS pl,
         |         CAST(sum(o.q) AS BIGINT) AS ql
         |  FROM c1 b JOIN c1 o ON o.b1 <= b.b1 GROUP BY 1
         |), s1 AS (
         |  SELECT t, CAST(0 AS BIGINT) AS pol, ql + pp - pl AS e, pp, qq
         |  FROM cum1, tot1
         |  UNION ALL
         |  SELECT t, 1, pl + qq - ql, pp, qq FROM cum1, tot1
         |), best1 AS (
         |  SELECT t AS t1, pol AS pol1, greatest(e, 1) AS e1, pp + qq AS nn,
         |         CAST(round(sqrt(CAST(pp + qq - greatest(e, 1) AS DOUBLE) /
         |                         CAST(greatest(e, 1) AS DOUBLE)), 9)
         |              AS DECIMAL(16,9)) AS wr,
         |         CAST(round(sqrt(CAST(greatest(e, 1) AS DOUBLE) /
         |                         CAST(pp + qq - greatest(e, 1) AS DOUBLE)), 9)
         |              AS DECIMAL(16,9)) AS wc
         |  FROM s1 ORDER BY e, t, pol LIMIT 1
         |), c2 AS (
         |  SELECT b2,
         |         sum(CASE WHEN pos THEN (CASE WHEN correct THEN wc ELSE wr END)
         |                  ELSE CAST(0 AS DECIMAL(16,9)) END) AS pw,
         |         sum(CASE WHEN NOT pos THEN (CASE WHEN correct THEN wc ELSE wr END)
         |                  ELSE CAST(0 AS DECIMAL(16,9)) END) AS qw
         |  FROM (SELECT b2, pos,
         |               CASE WHEN pol1 = 0 THEN (b1 <= t1) = pos
         |                    ELSE (b1 > t1) = pos END AS correct,
         |               wc, wr
         |        FROM bk, best1)
         |  GROUP BY 1
         |), tot2 AS (SELECT sum(pw) AS ppw, sum(qw) AS qqw FROM c2),
         |cum2 AS (
         |  SELECT b.b2 AS t, sum(o.pw) AS pwl, sum(o.qw) AS qwl
         |  FROM c2 b JOIN c2 o ON o.b2 <= b.b2 GROUP BY 1
         |), s2 AS (
         |  SELECT t, CAST(0 AS BIGINT) AS pol, qwl + ppw - pwl AS e, ppw, qqw
         |  FROM cum2, tot2
         |  UNION ALL
         |  SELECT t, 1, pwl + qqw - qwl, ppw, qqw FROM cum2, tot2
         |), best2 AS (
         |  SELECT t AS t2, pol AS pol2, CAST(e AS DOUBLE) AS e2w,
         |         CAST(ppw + qqw AS DOUBLE) AS ww
         |  FROM s2 ORDER BY e, t, pol LIMIT 1
         |)
         |SELECT CAST(1 AS BIGINT) AS round, 'totalprice' AS feature,
         |       t1 AS threshold, pol1 AS polarity,
         |       round(CAST(e1 AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS err_rate,
         |       round(ln(CAST(nn - e1 AS DOUBLE) / CAST(e1 AS DOUBLE)) * 0.5, 6)
         |         AS alpha
         |FROM best1
         |UNION ALL
         |SELECT 2, 'orderdate', t2, pol2, round(e2w / ww, 6),
         |       round(ln((ww - e2w) / e2w) * 0.5, 6)
         |FROM best2""".stripMargin,

    "q_er_phonetic" ->
      s"""WITH words AS (
         |  SELECT p_partkey AS pk, string_split(p_name, ' ')[2] AS w FROM part
         |), coded AS (
         |  SELECT pk, w, translate(substr(w, 2), 'abcdefghijklmnopqrstuvwxyz',
         |                          '$PhoneticMap') AS coded
         |  FROM words
         |), seq AS (
         |  SELECT pk, coded, unnest(generate_series(1, length(coded))) AS i FROM coded
         |), chars AS (
         |  SELECT pk, i, substr(coded, i, 1) AS c FROM seq
         |), filt AS (
         |  SELECT pk, i, c FROM (
         |    SELECT pk, i, c, lag(c) OVER (PARTITION BY pk ORDER BY i) AS lc
         |    FROM chars)
         |  WHERE lc IS NULL OR lc <> c
         |), ded AS (
         |  SELECT pk, string_agg(c, '' ORDER BY i) AS dedup FROM filt GROUP BY 1
         |), keyed AS (
         |  SELECT w.pk, w.w,
         |         rpad(upper(substr(w.w, 1, 1)) ||
         |              substr(replace(coalesce(ded.dedup, ''), '0', ''), 1, 3),
         |              4, '0') AS key
         |  FROM words w LEFT JOIN ded ON ded.pk = w.pk
         |)
         |SELECT key, count(*) AS n_parts, count(DISTINCT w) AS n_nouns,
         |       min(w) AS first_noun, max(w) AS last_noun,
         |       CAST(count(*) * (count(*) - 1) // 2 AS BIGINT) AS n_pairs
         |FROM keyed GROUP BY 1""".stripMargin,

    "q_stats_quartile_bands" ->
      """WITH v AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        |  FROM lineitem
        |), r AS (
        |  SELECT flag, v, row_number() OVER (PARTITION BY flag ORDER BY v) AS rn
        |  FROM v
        |), k AS (
        |  SELECT flag, count(*) AS n FROM v GROUP BY 1
        |)
        |SELECT k.flag, k.n,
        |       CAST((SELECT min(r.v) FROM r WHERE r.flag = k.flag
        |             AND rn = (k.n * 10 + 99) // 100) AS DOUBLE) / 100.0 AS p10_usd,
        |       CAST((SELECT min(r.v) FROM r WHERE r.flag = k.flag
        |             AND rn = (k.n * 25 + 99) // 100) AS DOUBLE) / 100.0 AS p25_usd,
        |       CAST((SELECT min(r.v) FROM r WHERE r.flag = k.flag
        |             AND rn = (k.n * 50 + 99) // 100) AS DOUBLE) / 100.0 AS p50_usd,
        |       CAST((SELECT min(r.v) FROM r WHERE r.flag = k.flag
        |             AND rn = (k.n * 75 + 99) // 100) AS DOUBLE) / 100.0 AS p75_usd,
        |       CAST((SELECT min(r.v) FROM r WHERE r.flag = k.flag
        |             AND rn = (k.n * 90 + 99) // 100) AS DOUBLE) / 100.0 AS p90_usd
        |FROM k""".stripMargin,

    "q_ml_chi2_rank" ->
      """WITH li AS (
        |  SELECT l_returnflag = 'R' AS pos, p_brand,
        |         CAST(CAST(CAST(l_discount AS DECIMAL(12,2)) * 100 AS BIGINT)
        |              AS VARCHAR) AS dband,
        |         CAST(CAST(l_quantity AS BIGINT) // 5 AS VARCHAR) AS qband,
        |         CAST(month(l_shipdate) AS VARCHAR) AS smonth,
        |         l_linestatus
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |), cells AS (
        |  SELECT feature, cat, count(*) AS n,
        |         CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS r
        |  FROM (
        |    SELECT 'brand' AS feature, p_brand AS cat, pos FROM li
        |    UNION ALL SELECT 'discount_band', dband, pos FROM li
        |    UNION ALL SELECT 'quantity_band', qband, pos FROM li
        |    UNION ALL SELECT 'ship_month', smonth, pos FROM li
        |    UNION ALL SELECT 'linestatus', l_linestatus, pos FROM li)
        |  GROUP BY 1, 2
        |), tot AS (
        |  SELECT feature AS tf, CAST(sum(n) AS BIGINT) AS nn,
        |         CAST(sum(r) AS BIGINT) AS rr
        |  FROM cells GROUP BY 1
        |), terms AS (
        |  SELECT feature,
        |         CAST(round(
        |           (CAST(r AS DOUBLE) - CAST(n AS DOUBLE) * CAST(rr AS DOUBLE) /
        |              CAST(nn AS DOUBLE)) *
        |           (CAST(r AS DOUBLE) - CAST(n AS DOUBLE) * CAST(rr AS DOUBLE) /
        |              CAST(nn AS DOUBLE)) /
        |           (CAST(n AS DOUBLE) * CAST(rr AS DOUBLE) / CAST(nn AS DOUBLE)) +
        |           ((CAST(n AS DOUBLE) - CAST(r AS DOUBLE)) -
        |            CAST(n AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(rr AS DOUBLE)) /
        |              CAST(nn AS DOUBLE)) *
        |           ((CAST(n AS DOUBLE) - CAST(r AS DOUBLE)) -
        |            CAST(n AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(rr AS DOUBLE)) /
        |              CAST(nn AS DOUBLE)) /
        |           (CAST(n AS DOUBLE) * (CAST(nn AS DOUBLE) - CAST(rr AS DOUBLE)) /
        |              CAST(nn AS DOUBLE)), 9) AS DECIMAL(24,9)) AS term
        |  FROM cells JOIN tot ON tf = feature
        |), byfeat AS (
        |  SELECT feature, count(*) AS n_cells, CAST(count(*) - 1 AS BIGINT) AS dof,
        |         round(CAST(sum(term) AS DOUBLE), 6) AS chi2
        |  FROM terms GROUP BY 1
        |)
        |SELECT a.feature, max(a.n_cells) AS n_cells, max(a.dof) AS dof,
        |       max(a.chi2) AS chi2, count(*) AS rank
        |FROM byfeat a JOIN byfeat b
        |  ON b.chi2 > a.chi2 OR (b.chi2 = a.chi2 AND b.feature <= a.feature)
        |GROUP BY 1""".stripMargin,

    "q_stats_permutation" ->
      s"""WITH pu AS (
         |  SELECT user_id, count(*) AS k,
         |         CAST(sum(CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT))
         |              AS BIGINT) AS sv
         |  FROM events WHERE event_type = 'purchase' GROUP BY 1
         |), obs AS (
         |  SELECT CAST(round(
         |           CAST(sum(CASE WHEN v = 0 THEN sv END) AS DOUBLE) /
         |           CAST(sum(CASE WHEN v = 0 THEN k END) AS DOUBLE) -
         |           CAST(sum(CASE WHEN v = 1 THEN sv END) AS DOUBLE) /
         |           CAST(sum(CASE WHEN v = 1 THEN k END) AS DOUBLE), 9)
         |         AS DECIMAL(18,9)) AS diff_obs,
         |         count(*) AS n_users
         |  FROM (SELECT ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 6))
         |                 ::BIGINT % 2 AS v, k, sv
         |        FROM pu)
         |), bs AS (SELECT unnest(generate_series(1, $PermB)) AS b),
         |pd AS (
         |  SELECT b, CAST(round(
         |           CAST(sum(CASE WHEN v = 0 THEN sv END) AS DOUBLE) /
         |           CAST(sum(CASE WHEN v = 0 THEN k END) AS DOUBLE) -
         |           CAST(sum(CASE WHEN v = 1 THEN sv END) AS DOUBLE) /
         |           CAST(sum(CASE WHEN v = 1 THEN k END) AS DOUBLE), 9)
         |         AS DECIMAL(18,9)) AS diff_b
         |  FROM (SELECT b,
         |               ('0x' || substring(md5(CAST(user_id AS VARCHAR) || ':' ||
         |                                      CAST(b AS VARCHAR)), 1, 6))
         |                 ::BIGINT % 2 AS v, k, sv
         |        FROM pu, bs)
         |  GROUP BY b
         |), ex AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_exceed
         |  FROM pd, obs WHERE abs(diff_b) >= abs(diff_obs)
         |)
         |SELECT CAST(obs.n_users AS BIGINT) AS n_users,
         |       round(CAST(obs.diff_obs AS DOUBLE) / 100.0, 6) AS diff_obs_usd,
         |       CAST($PermB AS BIGINT) AS n_perms, ex.n_exceed,
         |       round((1.0 + CAST(ex.n_exceed AS DOUBLE)) / (1.0 * $PermB + 1.0), 6)
         |         AS p_value
         |FROM obs, ex""".stripMargin,

    "q_stats_levene" ->
      """WITH v AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS v
        |  FROM lineitem
        |), r AS (
        |  SELECT flag, v, row_number() OVER (PARTITION BY flag ORDER BY v) AS rn,
        |         count(*) OVER (PARTITION BY flag) AS n
        |  FROM v
        |), med AS (
        |  SELECT flag, min(v) AS med FROM r WHERE rn = (n + 1) // 2 GROUP BY 1
        |), zg AS (
        |  SELECT v.flag, count(*) AS n,
        |         CAST(sum(CAST(abs(v.v - med.med) AS DECIMAL(14,0)))
        |              AS DECIMAL(24,0)) AS sz,
        |         CAST(sum(CAST(CAST(abs(v.v - med.med) AS DECIMAL(14,0)) *
        |                       CAST(abs(v.v - med.med) AS DECIMAL(14,0))
        |                       AS DECIMAL(28,0))) AS DECIMAL(34,0)) AS szz,
        |         max(med.med) AS med
        |  FROM v JOIN med ON med.flag = v.flag
        |  GROUP BY 1
        |), g AS (
        |  SELECT count(*) AS k, sum(n) AS nn,
        |         CAST(sum(sz) AS DECIMAL(30,0)) AS tsz,
        |         CAST(sum(szz) AS DECIMAL(38,0)) AS tszz,
        |         sum(CAST(round(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) /
        |                        CAST(n AS DOUBLE), 4) AS DECIMAL(30,4))) AS szn
        |  FROM zg
        |), f AS (
        |  SELECT k, nn,
        |         round(((CAST(szn AS DOUBLE) -
        |                 CAST(tsz AS DOUBLE) * CAST(tsz AS DOUBLE) /
        |                   CAST(nn AS DOUBLE)) / (CAST(k AS DOUBLE) - 1.0)) /
        |               ((CAST(tszz AS DOUBLE) - CAST(szn AS DOUBLE)) /
        |                (CAST(nn AS DOUBLE) - CAST(k AS DOUBLE))), 6) AS f_stat,
        |         k - 1 AS df1, CAST(nn - k AS BIGINT) AS df2
        |  FROM g
        |)
        |SELECT zg.flag, zg.n, round(CAST(zg.med AS DOUBLE) / 100.0, 2) AS med_usd,
        |       round(CAST(zg.sz AS DOUBLE) / CAST(zg.n AS DOUBLE) / 100.0, 4)
        |         AS zbar_usd,
        |       f.f_stat, f.df1, f.df2
        |FROM zg, f""".stripMargin)
}
