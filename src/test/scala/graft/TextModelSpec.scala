package graft

import org.apache.spark.sql.functions._

import graft.text.TextModelQueries

/** Behavioral guarantees of the text-model operators that the DuckDB hash
  * compare can't see: the winnowing DETECTION contract (shared runs must
  * share a fingerprint) and naive Bayes actually LEARNING separable
  * languages from the labels.
  */
class TextModelSpec extends SparkSpec {
  import spark.implicits._

  private def fingerprints(docs: org.apache.spark.sql.DataFrame) =
    try TextModelQueries.winnowingOf(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    finally CacheScope.releaseAll()

  test("winnowing guarantee: a shared run of >= w+k-1 tokens shares a fingerprint") {
    // w=4 windows over k=3 word grams: any common substring of
    // w+k-1 = 6 tokens spans a full gram window in BOTH documents, and
    // winnowing must select the same (minimum) gram hash from it. The
    // shared 8-token run sits at different offsets inside different
    // surrounding text.
    val run = "alpha beta gamma delta epsilon zeta eta theta"
    val docs = Seq(
      (1L, s"one two three $run nine ten"),
      (2L, s"completely different prefix words here $run and other suffix material"))
      .toDF("doc_id", "text")
    val fp = fingerprints(docs)
    val shared = fp.filter(_._1 == 1L).map(_._2).toSet
      .intersect(fp.filter(_._1 == 2L).map(_._2).toSet)
    assert(shared.nonEmpty, s"no shared fingerprint despite an 8-token shared run: $fp")
  }

  test("winnowing density: every complete window is covered; short docs drop out") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 8 grams, windows end at pos 4..8
      (2L, "too short here"), //  1 gram < w — no complete window
      (3L, "x y")) //              <3 tokens — no grams at all
      .toDF("doc_id", "text")
    val fp = fingerprints(docs)
    assert(fp.forall(_._1 == 1L), s"short docs must yield nothing: $fp")
    // Coverage: consecutive selected positions can be at most w apart —
    // the winnowing guarantee's density half.
    val pos = fp.filter(_._1 == 1L).map(_._3).sorted.toSeq
    assert(pos.nonEmpty && pos.head <= TextModelQueries.WinnowW)
    assert(pos.sliding(2).forall {
      case Seq(a, b) => b - a <= TextModelQueries.WinnowW
      case _ => true
    }, s"gap larger than the window: $pos")
  }

  test("naive Bayes separates planted languages and tie-breaks unseen docs by prior") {
    // Languages with disjoint vocabularies: the learned likelihoods must
    // classify every doc correctly — including the doc whose tokens the
    // classifier saw only under its own label.
    val docs = Seq(
      (1L, "aa", "foo bar baz foo bar"),
      (2L, "aa", "foo baz baz bar foo"),
      (3L, "aa", "bar bar foo baz qux"),
      (4L, "bb", "uno dos tres uno dos"),
      (5L, "bb", "tres tres uno dos uno"))
      .toDF("doc_id", "lang", "text")
    val got =
      try TextModelQueries.naiveBayesOf(docs)
        .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      finally CacheScope.releaseAll()
    assert(got == Map(("aa", "aa") -> 3L, ("bb", "bb") -> 2L), s"got $got")
  }
}
