package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.text.CorpusOpsQueries

/** The distributed prefix sum behind text_pack_sequences must compute the
  * same function as a sequential scan: exact global offsets in doc_id
  * order, regardless of partitioning, including doc_ids that are sparse /
  * far apart (shards of wildly different populations).
  */
class PackSequencesSpec extends SparkSpec {

  private def docsDf(rows: Seq[(Long, String)], parts: Int): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, t) => Row(i, t) }, parts),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))

  private def run(df: DataFrame): Seq[(Long, Long, Long, Long, Long)] =
    try CorpusOpsQueries.packSequences(df)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    finally CacheScope.releaseAll() // drop this thread's builder pins

  test("offsets equal a sequential scan; straddling docs are split") {
    // Token counts 1000, 1500, 900, 2048, 1 -> offsets 0, 1000, 2500,
    // 3400, 5448; with PackLen=2048 doc 2 straddles packs 0/1 and doc 4
    // straddles packs 1/2.
    val sizes = Seq(1000, 1500, 900, 2048, 1)
    val rows = sizes.zipWithIndex.map { case (n, i) =>
      ((i + 1).toLong, Seq.fill(n)("w").mkString(" "))
    }
    val got = run(docsDf(rows, 3))
    var off = 0L
    sizes.zipWithIndex.foreach { case (n, i) =>
      val (_, nt, go, pid, poff) = got(i)
      assert(nt == n.toLong)
      assert(go == off, s"doc ${i + 1}: offset $go != sequential $off")
      assert(pid == off / CorpusOpsQueries.PackLen)
      assert(poff == off % CorpusOpsQueries.PackLen)
      off += n
    }
  }

  test("sparse, skewed doc_ids and any partitioning give identical results") {
    // IDs straddle shard-block boundaries unevenly: most docs land in the
    // first block, a few in the last — the prefix sum must not care.
    val ids = Seq(1L, 2L, 3L, 4L, 5L, 6L, 7L, 1000000L, 2000000L, 2000001L)
    val rows = ids.zipWithIndex.map { case (id, i) =>
      (id, Seq.fill(i * 37 + 1)("w").mkString(" "))
    }
    val a = run(docsDf(rows, 1))
    val b = run(docsDf(rows.reverse, 7))
    assert(a == b, "prefix sum must be partitioning/order independent")
    val offs = a.map(_._3)
    assert(offs == offs.sorted, "offsets must be monotone in doc_id order")
  }
}
