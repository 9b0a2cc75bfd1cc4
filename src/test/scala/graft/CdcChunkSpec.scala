package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.text.CorpusOpsQueries

/** THE content-defined-chunking property: an insertion invalidates only
  * the chunk containing the edit (boundaries are content-anchored), where
  * fixed-offset chunking shifts and invalidates every chunk after it.
  */
class CdcChunkSpec extends SparkSpec {

  private def chunksOf(texts: Map[Long, String]): Map[Long, Seq[String]] = {
    val rows = texts.toSeq.map { case (id, t) => Row(id, t) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    CorpusOpsQueries.cdcChunks(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(3)))
      .groupBy(_._1)
      .map { case (id, cs) => id -> cs.sortBy(_._2).map(_._3).toSeq }
  }

  test("an insertion invalidates only the edited chunk's hashes") {
    // 600 deterministic pseudo-words -> ~9 chunks at the 64-token modulus.
    val words = (0 until 600).map(i => s"w${i * 2654435761L % 100003}")
    val original = words.mkString(" ")
    val edited = (words.take(300) ++ Seq("INSERTED", "TOKENS", "HERE") ++
      words.drop(300)).mkString(" ")
    val cs = chunksOf(Map(1L -> original, 2L -> edited))
    val (a, b) = (cs(1L), cs(2L))
    assert(a.size >= 5, s"need several chunks for the test to bite: ${a.size}")
    val shared = a.intersect(b).size
    // Everything except the edited chunk (and, if the insertion lands on
    // a boundary, one neighbor) must survive byte-identically.
    assert(shared >= a.size - 2,
      s"CDC must localize the edit: only $shared of ${a.size} chunks survived")
    assert(b.size >= a.size, "insertion cannot reduce the chunk count")
    // Contrast: FIXED 64-token chunking after a 3-token insertion at
    // token 300 shifts every later chunk — at most ceil(300/64) survive.
    val fixedSurvivors = a.size min (300 / 64 + 1)
    assert(shared > fixedSurvivors,
      s"CDC ($shared survivors) must beat fixed chunking (<= $fixedSurvivors)")
  }
}
