package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.dedup.{DedupQueries, Shingles}

/** Exactness + recall of the prefix-filter threshold-Jaccard join:
  * (1) it must return EXACTLY the brute-force all-pairs answer (the
  * prefix/length pruning is a candidate filter, never a result filter),
  * and (2) it must find near-dup pairs that straddle the blocked
  * variant's length buckets — the false negatives blocking accepts by
  * design and prefix filtering provably doesn't.
  */
class PrefixJaccardRecallSpec extends SparkSpec {

  private val T = DedupQueries.PrefixJaccardT

  private def docsDf(texts: Seq[String]): DataFrame = {
    val rows = texts.zipWithIndex.map { case (t, i) => Row(i + 1L, t) }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 3),
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType))))
  }

  /** Implementation-free ground truth: all pairs sharing >= 1 shingle,
    * exact jaccard, threshold filter — the spec-local twin of the DuckDB
    * oracle.
    */
  private def bruteForce(dd: DataFrame): Set[(Long, Long, Double)] = {
    val sh = Shingles.docShingles(dd)
    val sz = sh.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    sh.as("a")
      .join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
      .join(sz.as("za"), col("doc_a") === col("za.doc_id"))
      .join(sz.as("zb"), col("doc_b") === col("zb.doc_id"))
      .select(col("doc_a"), col("doc_b"),
        round(col("inter").cast("double") /
          (col("za.sz") + col("zb.sz") - col("inter")), 6).as("jaccard"))
      .filter(col("jaccard") >= T)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
  }

  private def prefixJoin(dd: DataFrame): Set[(Long, Long, Double)] =
    try DedupQueries.prefixJaccardPairs(dd, T)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    finally CacheScope.releaseAll() // drop this thread's builder pins

  test("prefix join equals brute force on a mixed corpus") {
    val base = "the quick brown fox jumps over the lazy dog while rain " +
      "falls on the quiet town square at dusk tonight"
    val texts = Seq(
      base,
      base.replace("quick", "sly").replace("dusk", "dawn"),   // near-dup
      base.split(" ").take(10).mkString(" "),                  // half overlap
      "entirely different content about spark shuffles and partitions " +
        "with no common trigrams at all here",
      "entirely different content about spark shuffles and partitions " +
        "with no common trigrams at all there",                // 2nd pair
      "tiny doc",                                              // no shingles
      base.split(" ").reverse.mkString(" "))                   // same tokens, new order
    val expected = bruteForce(docsDf(texts))
    val got = prefixJoin(docsDf(texts))
    assert(got === expected)
    assert(expected.exists(p => p._1 == 1L && p._2 == 2L),
      "planted near-dup pair must be above threshold for the test to bite")
  }

  test("finds a cross-length-bucket pair the blocked variant would miss") {
    // Two near-identical docs whose n_chars land in DIFFERENT floor(n/64)
    // buckets — dedup_ngram_jaccard's blocking key separates them, so it
    // can never emit this pair; prefix filtering must.
    val a = "alpha beta gamma delta epsilon zeta eta theta iota kappa xx"
    val b = "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    assert(a.length / 64 != b.length / 64,
      s"test precondition: lengths ${a.length}/${b.length} must straddle a bucket")
    val got = prefixJoin(docsDf(Seq(a, b)))
    val expected = bruteForce(docsDf(Seq(a, b)))
    assert(expected.nonEmpty, "pair must be above threshold for the test to bite")
    assert(got === expected)
  }
}
