package graft

import org.apache.spark.sql.functions._

import graft.text.{Stopwords, Tokenize}
import graft.tfidf.TfIdf

/** Tokenizer quirk parity (SURVEY.md §2.2 P1-P3), stopword-set semantics
  * (P5), and the TF-IDF dataflow on a hand-computed mini corpus (§5 item 5).
  */
class TextPipelineSpec extends SparkSpec {
  import spark.implicits._

  private def tokensOf(line: String): Seq[String] =
    Seq(line).toDF("text")
      .select(Tokenize.tokens(col("text")).as("t"))
      .as[Seq[String]].head()

  test("P2 deletes digits/punctuation: tokens can merge (abc123def)") {
    assert(tokensOf("abc123def ghi").filter(_.nonEmpty) == Seq("abcdef", "ghi"))
  }

  test("P2 strips apostrophes before stopword matching (don't -> dont)") {
    assert(tokensOf("don't worry").filter(_.nonEmpty) == Seq("dont", "worry"))
  }

  test("leading separator yields an empty first token (filtered by stopset)") {
    val t = tokensOf(" leading space")
    assert(t.head == "")
    assert(t.filter(_.nonEmpty) == Seq("leading", "space"))
  }

  test("P1 lowercases by default, preserves case when caseSensitive") {
    assert(tokensOf("MiXeD Case") == Seq("mixed", "case"))
    val cs = Seq("MiXeD Case").toDF("text")
      .select(Tokenize.tokens(col("text"), caseSensitive = true).as("t"))
      .as[Seq[String]].head()
    assert(cs == Seq("MiXeD", "Case"))
  }

  test("stopword set has the reference's exact loader semantics") {
    val s = Stopwords.set
    assert(s.contains(""), "blank lines must contribute the empty entry")
    assert(s.contains("the") && s.contains("a") && s.contains("ourselves"))
    // entries unreachable post-cleaning are still present, verbatim
    assert(s.exists(w => w.contains("'")), "apostrophe entries kept")
    // 355 non-empty lines, one duplicate ("would" appears twice), plus "".
    assert(s.size == 355, s"354 distinct non-empty + '' (got ${s.size})")
  }

  test("TF-IDF end-to-end on a hand-computed corpus") {
    // 3 docs; vocabulary chosen outside the stopword list.
    val docs = Seq(
      (1L, "spark engine spark"),
      (2L, "engine of queries"),
      (3L, "spark")).toDF("doc_id", "text")
    val out = TfIdf.pipeline(docs, TfIdf.Config(corpusConstant = 10000.0, topK = 100))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4))).toSet
    // stems: spark->spark, engine->engin, queries->queri; "of" is a stopword.
    def score(tf: Long, df: Long): Double = tf * math.log(10000.0 / (df + 1))
    val expect = Set(
      (1L, "spark", 2L, 2L, score(2, 2)),
      (1L, "engin", 1L, 2L, score(1, 2)),
      (2L, "engin", 1L, 2L, score(1, 2)),
      (2L, "queri", 1L, 1L, score(1, 1)),
      (3L, "spark", 1L, 2L, score(1, 2)))
    assert(out == expect)
  }

  test("top-k ties break deterministically by term ascending") {
    val docs = Seq((1L, "zebra apple"), (2L, "zebra apple")).toDF("doc_id", "text")
    val top1 = TfIdf.topTerms(
      TfIdf.documentFrequency(TfIdf.terms(docs)), 1).collect()
    assert(top1.map(_.getString(0)).toSeq == Seq("appl")) // df tie -> term asc
  }

  test("DF counts distinct documents, not occurrences") {
    val docs = Seq((1L, "word word word"), (2L, "word")).toDF("doc_id", "text")
    val df = TfIdf.documentFrequency(TfIdf.terms(docs)).collect()
    assert(df.map(r => (r.getString(0), r.getLong(1))).toMap == Map("word" -> 2L))
  }
}
