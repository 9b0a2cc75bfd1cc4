package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.dedup.SimHash

/** Recall guarantee of the block-collision simhash pair search: every pair
  * within the advertised hamming radius MUST be found, including the
  * adversarial case where the differing bits are spread across different
  * blocks (exactly the pairs a coarser bucketing would silently miss).
  * 64-bit fingerprints, 8 blocks, guaranteed radius 7.
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

  test("every pair at hamming <= 7 is found, bits split across blocks") {
    val base = 0x5A3C96E1_0F77CC21L
    // Flip sets chosen so the differing bits land in up to 7 DIFFERENT
    // 8-bit blocks — the pigeonhole-adversarial placements — including the
    // sign bit (63) and both ends of the word.
    val flips = Seq(
      Seq(5),                          // hamming 1, one block
      Seq(3, 11),                      // hamming 2, blocks 0 and 1
      Seq(7, 15, 23),                  // hamming 3, blocks 0, 1, 2
      Seq(0, 14, 31, 63),              // hamming 4, blocks 0, 1, 3, 7
      Seq(6, 13, 22, 37, 45),          // hamming 5, blocks 0, 1, 2, 4, 5
      Seq(1, 9, 17, 25, 33, 41),       // hamming 6, blocks 0-5
      Seq(2, 10, 18, 26, 34, 42, 50),  // hamming 7, blocks 0-6
      Seq(8, 16, 24, 32, 40, 48, 56),  // hamming 7, blocks 1-7
      Seq(57, 58, 59, 60, 61, 62, 63)  // hamming 7, all in the sign block
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
    val base = 0x00FF00FF_00FF00FFL
    // hamming 8, one bit per block: shares NO untouched block's guarantee
    // and fails the radius filter regardless of bucketing.
    val far = base ^ 0x01010101_01010101L
    // hamming 8 concentrated in one block: collides in seven buckets but
    // must still be filtered out by the exact hamming check.
    val near = base ^ 0x00000000_000000FFL
    val found = pairsOf(Map(1L -> base, 2L -> far, 3L -> near))
    assert(!found.contains((1L, 2L)) && !found.contains((1L, 3L)),
      s"radius filter leaked: $found")
  }

  test("exhaustive: random fingerprints, found == brute force at radius") {
    val rnd = new scala.util.Random(42)
    val values = (1L to 60L).map { id =>
      // Cluster fingerprints around 4 seeds so small-hamming pairs exist
      // (random 64-bit pairs sit at hamming ~32, far outside the radius).
      val seed = Seq(0x12345678_9ABCDEF0L, 0x0F0F0F0F_F0F0F0F0L,
        0xDEADBEEF_CAFEBABEL, 0x00FF77AA_5533CC99L)(id.toInt % 4)
      id -> (0 until rnd.nextInt(9)).foldLeft(seed)((v, _) =>
        v ^ (1L << rnd.nextInt(64)))
    }.toMap
    val vs = values.toSeq
    val expected = (for {
      (ia, va) <- vs; (ib, vb) <- vs
      if ia < ib && java.lang.Long.bitCount(va ^ vb) <= SimHash.GuaranteedRadius
    } yield (ia, ib)).toSet
    assert(pairsOf(values) == expected)
  }
}
