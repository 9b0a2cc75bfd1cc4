package graft

import org.apache.spark.ml.feature.{CountVectorizer, IDF}
import org.apache.spark.ml.linalg.SparseVector
import org.apache.spark.sql.functions._

import graft.tfidf.TfIdf

/** SURVEY.md §5 item 4: cross-check our TF-IDF against MLlib's
  * CountVectorizer + IDF. MLlib computes tf * ln((m+1)/(df+1)) with m =
  * fitted corpus size; the reference hardcodes 10000 (IDF.java:164) — so
  * running our pipeline with corpusConstant = m+1 must reproduce MLlib's
  * values exactly (same tokens, same counts, same natural log).
  */
class MllibCrossCheckSpec extends SparkSpec {

  test("our scores == MLlib CountVectorizer+IDF with m+1 substituted") {
    val docs = Tables.load(spark, sfDir, "documents")
    val terms = TfIdf.terms(docs)
    val termArrays = terms.groupBy("doc_id")
      .agg(collect_list(col("term")).as("terms"))
    val m = termArrays.count()

    val cv = new CountVectorizer()
      .setInputCol("terms").setOutputCol("tf_vec")
      .setMinDF(1).setVocabSize(1 << 18)
      .fit(termArrays)
    val idfModel = new IDF().setInputCol("tf_vec").setOutputCol("tfidf_vec")
      .fit(cv.transform(termArrays))
    val mllib = idfModel.transform(cv.transform(termArrays))
      .select(col("doc_id"), col("tfidf_vec"))
      .collect()
      .flatMap { r =>
        val doc = r.getLong(0)
        val v = r.getAs[SparseVector](1)
        v.indices.zip(v.values).map { case (i, s) => (doc, cv.vocabulary(i)) -> s }
      }.toMap

    val ours = TfIdf.pipeline(docs,
      TfIdf.Config(corpusConstant = (m + 1).toDouble, topK = 1 << 20))
      .select(col("doc_id"), col("term"), col("score"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap

    assert(ours.nonEmpty && ours.size == mllib.size,
      s"cardinality: ours=${ours.size} mllib=${mllib.size}")
    val worst = ours.map { case (k, v) =>
      math.abs(v - mllib(k)) / math.max(1e-12, math.abs(mllib(k)))
    }.max
    assert(worst < 1e-9, s"worst relative diff $worst")
  }
}
