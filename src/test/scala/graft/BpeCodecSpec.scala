package graft

import org.apache.spark.sql.functions._

import graft.text.{BpeCodec, BpeQueries}

/** The vocab-scale BPE encode path (VERDICT r10 next-round #5) must be
  * bit-equivalent to the compiled replace-chain expression the oracle
  * mirrors — including on the input where the CLASSIC min-rank-first
  * encode diverges from the chain.
  */
class BpeCodecSpec extends SparkSpec {

  test("codec reproduces the replace-chain semantics, not classic BPE") {
    // Rank 0's pair only EXISTS after rank 1 creates the "ab" token. The
    // chain never revisits rank 0, so "xab" stays 2 tokens; classic
    // min-rank-first would merge to 1. The oracle unrolls the chain, so
    // the chain answer is the correct one.
    val merges = IndexedSeq(("x ab", "xab"), ("a b", "ab"))
    val codec = new BpeCodec(merges)
    assert(codec.encode("xab").toSeq == Seq("x", "ab"))
    // Non-overlapping left-to-right within a rank: "aaa" -> [aa, a];
    // resume-after-replacement: "abab" under (a b) -> [ab, ab].
    val aa = new BpeCodec(IndexedSeq(("a a", "aa")))
    assert(aa.encode("aaa").toSeq == Seq("aa", "a"))
    assert(aa.encode("a").toSeq == Seq("a"))
    assert(new BpeCodec(IndexedSeq(("a b", "ab"))).encode("abab").toSeq ==
      Seq("ab", "ab"))
  }

  test("mapPartitions path == expression path on the trained corpus merges") {
    val docs = Tables.load(spark, sfDir, "documents")
    val merges =
      try BpeQueries.bpeTrainOf(docs).collect()
        .sortBy(_.getInt(0)).toSeq.map(r => (r.getString(1), r.getString(2)))
      finally CacheScope.releaseAll()
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // exprMergeCap = -1 forces the scalable path on the same ~50 merges.
    val viaExpr = rows(BpeQueries.bpeApplyOf(docs, merges))
    val viaCodec = rows(BpeQueries.bpeApplyOf(docs, merges,
      exprMergeCap = -1))
    CacheScope.releaseAll()
    assert(viaExpr.nonEmpty && viaExpr == viaCodec,
      s"paths diverge: ${(viaExpr -- viaCodec).take(3)} vs ${(viaCodec -- viaExpr).take(3)}")
  }

  test("scalable path is one narrow stage — no shuffle") {
    val docs = Tables.load(spark, sfDir, "documents")
    val plan = BpeQueries
      .bpeApplyScalable(docs, Seq(("a b", "ab"), ("t h", "th")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n${plan.take(2000)}")
  }
}
