package graft

import org.apache.spark.sql.functions._

import graft.text.Stopwords
import graft.tfidf.TfIdf

/** Property-style invariants (SURVEY.md §5 item 3) over seeded random
  * corpora: tokenizer output alphabet, DF bounds, TF conservation, score
  * sign, and the pairs≡stripes equivalence (PosSpec covers the latter).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(20260812L)
  private val alphabet =
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789.,!?'- \n"

  private def randomDoc(): String =
    Seq.fill(20 + rnd.nextInt(200))(alphabet(rnd.nextInt(alphabet.length))).mkString

  private lazy val corpus =
    (1L to 40L).map(i => (i, randomDoc())).toDF("doc_id", "text")

  test("terms alphabet ⊆ [a-z] in case-insensitive mode, and never stopwords") {
    val terms = TfIdf.terms(corpus, TfIdf.Default.copy(stem = false))
      .as[(Long, String)].collect()
    terms.foreach { case (_, t) =>
      assert(t.nonEmpty && t.forall(c => c >= 'a' && c <= 'z'), s"bad term '$t'")
      assert(!Stopwords.set.contains(t), s"stopword leaked: '$t'")
    }
  }

  test("DF(term) is within [1, corpus size]") {
    val n = corpus.count()
    val df = TfIdf.documentFrequencyFromTf(
      TfIdf.termFrequencyAll(TfIdf.terms(corpus)))
      .as[(String, Long)].collect()
    df.foreach { case (t, d) => assert(d >= 1 && d <= n, s"df($t)=$d") }
  }

  test("TF sums to the per-doc surviving token count") {
    val t = TfIdf.terms(corpus)
    val direct = t.groupBy("doc_id").count()
      .as[(Long, Long)].collect().toMap
    val viaTf = TfIdf.termFrequencyAll(t)
      .groupBy("doc_id").agg(sum(col("tf")).as("s"))
      .as[(Long, Long)].collect().toMap
    assert(direct == viaTf)
  }

  test("score >= 0 iff df+1 <= corpusConstant (always, here)") {
    val scores = TfIdf.pipeline(corpus).select(col("score"), col("df"))
      .as[(Double, Long)].collect()
    scores.foreach { case (s, df) =>
      assert(df + 1 <= 10000 && s >= 0, s"negative score $s at df=$df")
    }
  }

  test("stemming never lengthens a term and stays in-alphabet") {
    // one collect; the Scala stemmer IS the engine's stem (StemExpr wraps
    // it), so pairing raw->stem locally avoids relying on row order being
    // identical across two separate query plans
    val raw = TfIdf.terms(corpus, TfIdf.Default.copy(stem = false))
      .as[(Long, String)].collect()
    assert(raw.nonEmpty)
    raw.foreach { case (_, r) =>
      val s = graft.text.PorterStemmer.stem(r)
      assert(s.length <= r.length, s"'$r' -> '$s' grew")
      assert(s.forall(c => c >= 'a' && c <= 'z'), s"bad stem '$s'")
    }
    // and the engine's stemmed term count matches (no tokens dropped)
    assert(TfIdf.terms(corpus).count() == raw.length)
  }
}
