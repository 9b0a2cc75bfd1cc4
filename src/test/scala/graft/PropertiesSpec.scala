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

  test("repetition ratios live in [0,1]; planted corpora hit the extremes") {
    import graft.text.TextAnalysisQueries
    TextAnalysisQueries.queries("text_repetition")(spark, sfDir)
      .collect().foreach { r =>
        Seq(2, 3, 4).foreach { i =>
          val v = r.getDouble(i)
          assert(v >= 0.0 && v <= 1.0, s"ratio out of range: $r")
        }
      }
    val planted = Seq(
      (1L, Seq.fill(10)("spam").mkString(" ")), // maximal repetition
      (2L, ('a' to 'j').map(_.toString).mkString(" "))) // all distinct
      .toDF("doc_id", "text")
    val m = TextAnalysisQueries.repetitionOf(planted)
      .collect()
      .map(r => r.getLong(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(m(1L) == ((0.9, 1.0, 0.888889))) // bigrams: 1 distinct of 9
    assert(m(2L) == ((0.0, 0.1, 0.0)))
  }

  test("stratified sample is reproducible and bounded per stratum") {
    import graft.text.CorpusOpsQueries
    val q = CorpusOpsQueries.queries("text_sample_stratified")
    val a = q(spark, sfDir).collect().map(_.toSeq).toSet
    assert(a == q(spark, sfDir).collect().map(_.toSeq).toSet,
      "sampling must be reproducible run-over-run")
    a.foreach { row =>
      val (total, sampled) = (row(2).asInstanceOf[Long], row(3).asInstanceOf[Long])
      assert(sampled >= 0 && sampled <= total)
    }
  }

  test("clean-pipeline survivors are documents that pass the quality gate") {
    import graft.text.TextAnalysisQueries
    val out = TextAnalysisQueries.queries("text_clean_pipeline")(spark, sfDir).collect()
    val docIds = Tables.load(spark, sfDir, "documents")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(docIds.contains(r.getLong(0)))
      assert(r.getDouble(3) >= 0.5, s"survivor below quality gate: $r")
    }
  }

  test("budget selection over random corpora is always the exact greedy prefix") {
    // The distributed prefix sum behind text_budget_select must equal a
    // sequential replay on ANY corpus — random doc lengths (including
    // repeated quality scores across bucket boundaries) and several
    // budgets, not just the registered dial.
    import graft.text.CorpusOpsQueries
    val docs = (1L to 60L).map { i =>
      val words = 1 + rnd.nextInt(120)
      (i, Seq.fill(words)(alphabet(rnd.nextInt(alphabet.length - 2)).toString)
        .mkString(" "))
    }.toDF("doc_id", "text")
    for (budget <- Seq(1L, 500L, 2500L, 1000000L)) {
      val out =
        try CorpusOpsQueries.budgetSelect(docs, budget).collect()
          .map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
            r.getLong(3), r.getBoolean(4)))
        finally CacheScope.releaseAll()
      val ordered = out.sortBy { case (id, q, _, _, _) =>
        (-math.round(q * 1e6), id)
      }
      var cum = 0L
      ordered.foreach { case (id, _, n, cumBefore, selected) =>
        assert(cumBefore == cum, s"budget=$budget doc=$id cum mismatch")
        assert(selected == (cum < budget), s"budget=$budget doc=$id flag")
        cum += n
      }
    }
  }
}
