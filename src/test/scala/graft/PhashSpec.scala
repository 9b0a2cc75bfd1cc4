package graft

import graft.mm.MultimodalQueries

/** mm_phash_dedup contract checks: every emitted pair respects the gate
  * distance, the corrupted twins are actually found (the banding's reason
  * to exist), and identical payloads collide at distance zero.
  */
class PhashSpec extends SparkSpec {

  test("banded near-dup pairs respect the gate and find the twins") {
    val pairs = MultimodalQueries.queries("mm_phash_dedup")(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Int]("hamming")))
    assert(pairs.nonEmpty, "no pairs at all — twins should collide")
    assert(pairs.forall(_._3 <= MultimodalQueries.PhashHamMax))
    // most corrupted twins sit within the gate (the in-place flip moves
    // only the first sample + the mean): require a majority found
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    val twinPairs = pairs.count(p =>
      p._2 == p._1 + MultimodalQueries.PhashTwinOffset)
    assert(twinPairs * 2 > nDocs, s"only $twinPairs twin pairs of $nDocs docs")
  }

  test("phash signatures use the full 62-bit budget") {
    val sigs = MultimodalQueries.queries("mm_phash")(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("phash"), r.getAs[Int]("nbits")))
    assert(sigs.forall(_._1 >= 0), "fold escaped the non-negative range")
    assert(sigs.forall(s => s._2 >= 0 && s._2 <= MultimodalQueries.PhashBits))
    // thresholding against the sample mean keeps bit density near half
    val meanBits = sigs.map(_._2).sum.toDouble / sigs.length
    assert(meanBits > 10 && meanBits < 52, s"degenerate bit density $meanBits")
  }
}
