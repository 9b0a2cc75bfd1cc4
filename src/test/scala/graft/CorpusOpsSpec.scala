package graft

import org.apache.spark.sql.functions._

import graft.text.CorpusOpsQueries

/** Planted-corpus behavior of the corpus-hygiene operators: span dedup,
  * benchmark containment, and PII scrubbing. The oracled queries prove
  * cross-engine parity on the synthetic tables; these specs prove the
  * operators bind on the structures they exist for (repeated spans,
  * contaminated eval docs, planted PII) — which the synthetic corpus
  * lacks.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  private val ten = (1 to 10).map(i => s"w$i").mkString(" ") // one exact span

  test("span dedup: cross-doc repeats, in-doc repeats, and short docs") {
    val docs = Seq(
      // doc 1 and 2 share the same 10-token span (plus distinct tails)
      (1L, s"$ten alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, s"$ten omega psi unique1 unique2 unique3 unique4 unique5 unique6 unique7 unique8"),
      // doc 3 repeats ITS OWN span twice (in-doc duplication also counts)
      (3L, s"$ten $ten"),
      // doc 4: 9 tokens -> no spans -> no output row
      (4L, (1 to 9).map(i => s"x$i").mkString(" ")),
      // doc 5: all-unique spans
      (5L, (1 to 20).map(i => s"u$i").mkString(" "))
    ).toDF("doc_id", "text")
    val out = CorpusOpsQueries.spanDedupOf(docs)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    CacheScope.releaseAll()
    // doc 1: 11 spans (20 tokens), only the first (positions 1..1) matches
    // doc 2/3's copy of `ten` — spans 2..11 slide into the distinct tail.
    assert(out(1L)._1 == 11 && out(1L)._2 == 1)
    assert(out(2L)._1 == 11 && out(2L)._2 == 1)
    // doc 3: 20 tokens of two copies -> 11 spans; every span that equals
    // `ten` (positions 1 and 11) is duplicated; the 9 bridge spans are
    // unique corpus-wide.
    assert(out(3L)._1 == 11 && out(3L)._2 == 2)
    assert(!out.contains(4L), "doc with < 10 tokens must yield no row")
    assert(out(5L)._2 == 0)
  }

  test("containment: planted eval doc inside a training doc") {
    val evalDoc = "the quick brown fox jumps over the lazy dog tonight"
    val docs = Seq(
      (100L, evalDoc), // benchmark doc
      (200L, s"prefix words here $evalDoc and a suffix tail"), // contains it
      (300L, "completely different content with no overlap at all whatsoever")
    ).toDF("doc_id", "text")
    val bench = Seq(100L).toDF("doc_id")
    val out = CorpusOpsQueries.containmentOf(docs, bench, 0.5)
      .select("bench_doc", "corpus_doc", "containment")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    CacheScope.releaseAll()
    // All 8 of the eval doc's shingles appear verbatim in doc 200.
    assert(out.toSeq == Seq((100L, 200L, 1.0)), out.toSeq.toString)
  }

  test("pii scrub: emails, urls, long digit runs; 8-digit numbers survive") {
    val df = Seq(
      (1L, "contact alice.smith+tag@example.co.uk or visit https://ex.com/a?b=1 ref 123456789"),
      (2L, "short number 12345678 stays, card 4111111111111111 goes"),
      (3L, "mail inside url https://api.io/u/bob@corp.net/profile stays one URL")
    ).toDF("doc_id", "text")
    val out = df.select(col("doc_id"),
      size(regexp_extract_all(col("text"), lit(CorpusOpsQueries.EmailPat), lit(0))).as("e"),
      size(regexp_extract_all(col("text"), lit(CorpusOpsQueries.UrlPat), lit(0))).as("u"),
      size(regexp_extract_all(col("text"), lit(CorpusOpsQueries.LongNumPat), lit(0))).as("n"),
      CorpusOpsQueries.scrub(col("text")).as("s"))
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getInt(1) == 1 && out(1L).getInt(2) == 1 && out(1L).getInt(3) == 1)
    assert(out(1L).getString(4) ==
      "contact <EMAIL> or visit <URL> ref <NUM>")
    // 12345678 is below the 9-digit threshold; the 16-digit card is not.
    assert(out(2L).getInt(3) == 1)
    assert(out(2L).getString(4) == "short number 12345678 stays, card <NUM> goes")
    // URL-first redaction order: the email inside the URL is consumed by
    // the URL token (the count still sees it pre-scrub — that's the
    // documented contract: counts are over the ORIGINAL text).
    assert(out(3L).getString(4) == "mail inside url <URL> stays one URL")
    assert(out(3L).getInt(1) == 1 && out(3L).getInt(2) == 1)
  }
}
