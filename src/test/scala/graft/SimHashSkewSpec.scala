package graft

import graft.dedup.SimHash

/** The skew story for dedup_simhash_pairs (VERDICT r10 next-round #3):
  * the 8x8-bit block-collision join's known hazard is a DEGENERATE block —
  * a block value constant across the corpus (e.g. a shared template makes
  * some lanes uniformly negative) puts every document in ONE bucket, and
  * the bucket self-join becomes the quadratic straggler partition. The
  * designed mitigation is AQE skew-join splitting (SimHash.candidatePairs'
  * scaladoc); this spec EXECUTES that claim: block 0 is planted constant
  * over the whole corpus while blocks 1-7 stay pseudo-random, and the
  * finished adaptive plan must show the skewed partition split
  * (SortMergeJoin(skew=true)) while the planted hamming-1 near-dup is
  * still recalled through the degenerate bucket.
  */
class SimHashSkewSpec extends SparkSpec {

  test("degenerate constant block: AQE splits the bucket join, recall intact") {
    // Isolated SQLConf (shared SparkContext): the skew dials below must
    // not leak into parallel suites' plan asserts.
    val s = spark.newSession()
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.shuffle.partitions", "64")
    import s.implicits._
    val n = 3000
    // Low byte zero for EVERY doc -> block 0's bucket holds the whole
    // corpus; the multiply scrambles blocks 1-7 so only block 0 is
    // degenerate (a plain i << 8 would zero blocks 3-7 too and plant SIX
    // quadratic buckets).
    def fp(i: Long): Long = (i * -7046029254386353131L) & ~0xffL
    val base = (0L until n.toLong).map(i => (i, fp(i)))
    // Planted near-dup through the degenerate bucket: differs from doc 0
    // in exactly one bit.
    val planted = Seq((n.toLong, fp(0L) ^ (1L << 62)))
    val sh = (base ++ planted).toDF("doc_id", "simhash").repartition(8)
    val pairs = SimHash.candidatePairs(sh)
    val got = pairs.collect()
    assert(got.exists(r => r.getLong(0) == 0L && r.getLong(1) == n.toLong &&
      r.getInt(2) == 1), s"planted hamming-1 pair not recalled (${got.length} pairs)")
    val plan = pairs.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"AQE did not split the degenerate bucket:\n${plan.take(3000)}")
  }
}
