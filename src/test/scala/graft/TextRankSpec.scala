package graft

import org.apache.spark.sql.functions._

import graft.text.TextModelQueries

/** Planted-structure checks for TextRank: a hub word co-occurring with
  * every other word must out-rank the periphery, and rank mass is
  * conserved up to integer truncation (the graph pack's PageRank
  * contract, inherited by the weighted variant).
  */
class TextRankSpec extends SparkSpec {

  test("planted hub word wins the ranking") {
    import spark.implicits._
    // "core" is adjacent to every satellite word twice (passes the
    // min-cooc gate); satellites never touch each other.
    val sats = Seq("alpha", "beta", "gamma", "delta", "epsilon")
    val docs = sats.zipWithIndex.map { case (w, i) =>
      (i.toLong, s"core $w core $w core")
    }.toDF("doc_id", "text")
    val out = TextModelQueries.textrankOf(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)))
    assert(out.nonEmpty)
    assert(out.head._1 == "core", s"hub lost to ${out.head._1}")
    // strictly above every satellite
    val coreR = out.head._2
    out.tail.foreach { case (w, r) => assert(r < coreR, s"$w >= hub") }
    // satellites are symmetric -> identical ranks, alphabetical order
    val satRanks = out.filter(o => sats.contains(o._1)).map(_._2).distinct
    assert(satRanks.length == 1)
  }

  test("corpus ranking is deterministic and bounded") {
    val a = TextModelQueries.queries("text_textrank")(spark, sfDir).collect()
    val b = TextModelQueries.queries("text_textrank")(spark, sfDir).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
    assert(a.length <= TextModelQueries.TrTopK)
    // descending with word tiebreak
    val pairs = a.map(r => (r.getAs[Long]("tr_fixed"), r.getAs[String]("word")))
    assert(pairs.sliding(2).forall {
      case Array((r1, w1), (r2, w2)) => r1 > r2 || (r1 == r2 && w1 < w2)
      case _ => true
    })
  }
}
