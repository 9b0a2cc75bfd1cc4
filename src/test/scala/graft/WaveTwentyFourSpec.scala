package graft

/** Semantics checks for the round-13 wave. The DuckDB hash compare proves
  * cross-engine parity; these prove the MEANING a twin-implementation bug
  * could preserve: the balanced-weight identity Σ n_c·w_c = N, split
  * fractions that partition each split, cosine bounds + full pair
  * coverage for the source-similarity audit, and the containment chain
  * of the leakage counters.
  */
class WaveTwentyFourSpec extends SparkSpec {

  test("class weights satisfy the balanced identity and sqrt ordering") {
    val rows = SparkEntry.queries("q_ml_class_weights")(spark, sfDir).collect()
    CacheScope.releaseAll()
    assert(rows.nonEmpty)
    val n = rows.map(_.getLong(rows.head.fieldIndex("n_samples"))).sum
    // sklearn "balanced": Σ_c n_c · N/(K·n_c) = N (up to the 6dp pins)
    val weighted = rows.map(r =>
      r.getLong(r.fieldIndex("n_samples")) *
        r.getDouble(r.fieldIndex("w_invfreq"))).sum
    assert(math.abs(weighted - n) <= 0.01 * n,
      s"balanced identity broken: $weighted vs $n")
    // sqrt-inverse must under-correct relative to inverse-frequency on
    // rare classes and over-correct on common ones — i.e. the two
    // rankings agree but sqrt compresses the range.
    val byN = rows.sortBy(_.getLong(rows.head.fieldIndex("n_samples")))
    val inv = byN.map(_.getDouble(byN.head.fieldIndex("w_invfreq")))
    val sq = byN.map(_.getDouble(byN.head.fieldIndex("w_sqrtinv")))
    assert(inv.zip(inv.tail).forall { case (a, b) => a >= b - 1e-9 })
    assert(sq.zip(sq.tail).forall { case (a, b) => a >= b - 1e-9 })
    assert((inv.head / inv.last) >= (sq.head / sq.last) - 1e-9,
      "sqrt weighting must compress the imbalance range")
  }

  test("stratified-split fractions partition each split and the corpus") {
    val rows = SparkEntry.queries("text_split_stratified")(spark, sfDir).collect()
    CacheScope.releaseAll()
    val splits = rows.groupBy(_.getString(rows.head.fieldIndex("split")))
    assert(splits.keySet.subsetOf(Set("train", "val", "test")))
    splits.foreach { case (sp, rs) =>
      val f = rs.map(_.getDouble(rs.head.fieldIndex("frac_in_split"))).sum
      assert(math.abs(f - 1.0) < 1e-3, s"split $sp fractions sum to $f")
    }
    // skew is exactly the difference of the two released fractions
    rows.foreach { r =>
      val got = r.getDouble(r.fieldIndex("skew"))
      val want = r.getDouble(r.fieldIndex("frac_in_split")) -
        r.getDouble(r.fieldIndex("frac_overall"))
      assert(math.abs(got - want) < 2e-6)
    }
  }

  test("source TF-cosines cover every pair once, inside (0, 1]") {
    val rows = SparkEntry.queries("text_source_similarity")(spark, sfDir).collect()
    CacheScope.releaseAll()
    val pairs = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.size == rows.length, "duplicate pair")
    assert(rows.forall(r => r.getString(0) < r.getString(1)), "unordered pair")
    val sources = pairs.flatMap(p => Set(p._1, p._2))
    assert(pairs.size == sources.size * (sources.size - 1) / 2,
      "missing pairs — every source shares vocabulary on this corpus")
    rows.foreach { r =>
      val c = r.getDouble(r.fieldIndex("tf_cosine"))
      assert(c > 0.0 && c <= 1.0 + 1e-9, s"cosine out of range: $c")
    }
  }

  test("leakage counters nest: leaked <= touching-eval <= total") {
    val r = SparkEntry.queries("dedup_split_leakage")(spark, sfDir).collect().head
    CacheScope.releaseAll()
    val total = r.getLong(r.fieldIndex("n_candidate_pairs"))
    val leaked = r.getLong(r.fieldIndex("n_leaked_pairs"))
    val touching = r.getLong(r.fieldIndex("n_pairs_touching_eval"))
    assert(total > 0, "LSH proposes candidates on this corpus")
    assert(leaked <= touching && touching <= total)
    assert(math.abs(r.getDouble(r.fieldIndex("leak_rate")) -
      leaked.toDouble / total) < 2e-6)
  }
}
