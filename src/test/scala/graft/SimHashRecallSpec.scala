package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.dedup.SimHash

/** Recall guarantee of the block-collision simhash pair search: every pair
  * within the advertised hamming radius MUST be found, including the
  * adversarial case where the differing bits are spread across different
  * blocks (exactly the pairs the old two-half bucketing silently missed).
  */
class SimHashRecallSpec extends SparkSpec {

  private def pairsOf(values: Map[Long, Long]): Set[(Long, Long)] = {
    val rows = values.toSeq.map { case (id, sh) => Row(id, sh) }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(Seq(StructField("doc_id", LongType), StructField("simhash", LongType))))
    SimHash.candidatePairs(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("every pair at hamming <= 3 is found, bits split across blocks") {
    val base = 0x5A3C96E1L & 0xFFFFFFFFL
    // Flip sets chosen so the differing bits land in 1, 2, and 3 DIFFERENT
    // 8-bit blocks — the pigeonhole-adversarial placements.
    val flips = Seq(
      Seq(5),           // hamming 1, one block
      Seq(3, 11),       // hamming 2, blocks 0 and 1
      Seq(7, 15, 23),   // hamming 3, blocks 0, 1, 2
      Seq(0, 14, 31),   // hamming 3, blocks 0, 1, 3
      Seq(6, 13, 22)    // hamming 3, blocks 0, 1, 2
    )
    val values = Map(1L -> base) ++ flips.zipWithIndex.map { case (fs, i) =>
      (i + 2L) -> fs.foldLeft(base)((v, b) => v ^ (1L << b))
    }
    val found = pairsOf(values)
    flips.zipWithIndex.foreach { case (fs, i) =>
      assert(found.contains((1L, i + 2L)),
        s"pair at hamming ${fs.size} with bits in blocks ${fs.map(_ / 8).distinct} missed")
    }
  }

  test("pairs beyond the radius are excluded even when they share a block") {
    val base = 0x00FF00FFL
    // hamming 4, one bit per block: shares NO untouched block's guarantee
    // and fails the radius filter regardless of bucketing.
    val far = base ^ 0x01010101L
    // hamming 4 concentrated in one block: collides in three buckets but
    // must still be filtered out by the exact hamming check.
    val near = base ^ 0x0000000FL
    val found = pairsOf(Map(1L -> base, 2L -> far, 3L -> near))
    assert(!found.contains((1L, 2L)) && !found.contains((1L, 3L)),
      s"radius filter leaked: $found")
  }

  test("exhaustive: random fingerprints, found == brute force at radius") {
    val rnd = new scala.util.Random(42)
    val values = (1L to 60L).map { id =>
      // Cluster fingerprints around 4 seeds so small-hamming pairs exist.
      val seed = Seq(0x12345678L, 0x0F0F0F0FL, 0xDEADBEEFL, 0x00FF77AAL)(id.toInt % 4)
      val flipped = (0 until rnd.nextInt(5)).foldLeft(seed)((v, _) =>
        v ^ (1L << rnd.nextInt(32)))
      id -> (flipped & 0xFFFFFFFFL)
    }.toMap
    val vs = values.toSeq
    val expected = (for {
      (ia, va) <- vs; (ib, vb) <- vs
      if ia < ib && java.lang.Long.bitCount(va ^ vb) <= SimHash.GuaranteedRadius
    } yield (ia, ib)).toSet
    assert(pairsOf(values) == expected)
  }
}
