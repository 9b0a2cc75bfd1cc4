package graft

import graft.text.BpeQueries

/** Planted-corpus behavior of the BPE training loop — the oracled query
  * proves cross-engine parity; these prove the GREEDY MERGE SEMANTICS on
  * hand-computable corpora, including the overlap cases where a naive
  * space-delimited string replace would diverge from left-to-right BPE
  * ("a a a" merges once, "ab ab ab" merges all three).
  */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  private def train(texts: Seq[String], merges: Int) =
    BpeQueries
      .bpeTrainOf(texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"), merges = merges)
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("learns the classic abab merge chain") {
    // vocab: "abab" x3, "ab" x2. Round 1 pairs: (a b) from abab twice
    // each + ab once each = 3*2+2 = 8; (b a) = 3. Merge "a b" -> ab.
    // Round 2: abab is now [ab, ab] -> pair (ab ab) n=3; merge.
    // Round 3: states "abab" and "ab" are single tokens -> exhausted.
    val out = train(Seq("abab abab abab ab ab"), merges = 5)
    assert(out == Seq(
      (1, "a b", "ab", 8L),
      (2, "ab ab", "abab", 3L)), out.toString)
  }

  test("odd repeat chain merges greedily left-to-right") {
    // "aaa": pairs (a a) twice -> n = 2. Greedy left-to-right merge
    // yields [aa, a] (ONE merge applied), so round 2 sees pair (aa a)
    // with n = 1 — a string replace that re-matched the shared boundary
    // would instead produce zero remaining (a a) structure and a
    // different round-2 winner.
    val out = train(Seq("aaa aaa bb"), merges = 2)
    assert(out(0) == ((1, "a a", "aa", 4L)), out.toString)
    // round 2 candidates: (aa a) n=2 vs (b b) n=1 -> "aa a" wins.
    assert(out(1) == ((2, "aa a", "aaa", 2L)), out.toString)
  }

  test("frequency-weighted by word count, ties broken by pair text") {
    // "cd" appears 3 times, "xy" twice: (c d) n=3 beats (x y) n=2.
    val out = train(Seq("cd cd cd xy xy"), merges = 1)
    assert(out == Seq((1, "c d", "cd", 3L)), out.toString)
    // exact tie: (c d) and (x y) both n=2 -> lexicographic pair order.
    val tie = train(Seq("cd cd xy xy"), merges = 1)
    assert(tie == Seq((1, "c d", "cd", 2L)), tie.toString)
  }

  test("apply encodes with merges in rank order") {
    val docs = Seq((7L, "the then xyz"), (8L, ""), (9L, "thethe"))
      .toDF("doc_id", "text")
    val out = BpeQueries
      .bpeApplyOf(docs, Seq(("t h", "th"), ("th e", "the")))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2))))
      .toMap
    // "the" -> [the] (1), "then" -> [the, n] (2), "xyz" -> 3 chars (3).
    assert(out(7L) == ((3L, 6L)), out.toString)
    // empty doc: no clean words -> no row (matches the oracle's GROUP BY).
    assert(!out.contains(8L), out.toString)
    // "thethe": both merges apply twice -> [the, the] (2).
    assert(out(9L) == ((1L, 2L)), out.toString)
  }

  test("exhausts cleanly when no pairs remain") {
    // single-char vocab: no adjacent pairs at all -> empty merge table.
    val out = train(Seq("a b c a b"), merges = 3)
    assert(out.isEmpty, out.toString)
  }

  test("merged symbols participate in later rounds across words") {
    // "the" x4, "then" x2, "them" x2: round 1 ties (h e) and (t h) at
    // n = 8 -> lexicographic winner "h e". Round 2: states t|he|[n|m]
    // give (t he) n=8 over (he n)/(he m) n=2. Round 3: (the m) and
    // (the n) tie at n=2 -> "the m".
    val out = train(Seq("the the the the then then them them"), merges = 3)
    assert(out(0) == ((1, "h e", "he", 8L)), out.toString)
    assert(out(1) == ((2, "t he", "the", 8L)), out.toString)
    assert(out(2) == ((3, "the m", "them", 2L)), out.toString)
  }

  test("eval scorecard is internally consistent on the corpus") {
    val r = try SparkEntry.queries("text_bpe_eval")(spark, sfDir)
      .collect().head
    finally CacheScope.releaseAll()
    val (docs, words, letters, bpe) = (r.getAs[Long]("n_docs"),
      r.getAs[Long]("n_words"), r.getAs[Long]("n_letters"),
      r.getAs[Long]("n_bpe_tokens"))
    // the merges must have bought SOMETHING (bpe < chars) but each word
    // still needs >= 1 token (bpe >= words).
    assert(docs > 0 && words >= docs && bpe >= words && letters > bpe,
      r.toString)
    def r6(x: Double) =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("fertility") == r6(bpe.toDouble / words))
    assert(r.getAs[Double]("chars_per_token") == r6(letters.toDouble / bpe))
    assert(r.getAs[Double]("merge_savings") == r6(1.0 - bpe.toDouble / letters))
  }
}
