package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.dedup.Shingles.hash60
import graft.sketch.{KmvAgg, SketchQueries}

/** Sketch semantics beyond the DuckDB hash-match: the KMV estimator's
  * accuracy and partitioning-independence (the merge path), and the CMS
  * one-sided error with its theoretical bound.
  */
class SketchSpec extends SparkSpec {

  test("KMV below k is EXACT and the registered query says so") {
    // sf0.001 lineitem has 200 distinct part keys < k=256: the sketch
    // degenerates to the exact distinct set.
    val row = SparkEntry.queries("q_sketch_kmv")(spark, sfDir).collect().head
    assert(row.getAs[Long]("n_kept") == 200L)
    assert(row.getAs[Double]("est_distinct") == 200.0)
    CacheScope.releaseAll()
  }

  test("KMV estimate is within 3 RSE of truth and partitioning-invariant") {
    // l_orderkey at sf0.001: ~1500 distinct > k=256 — the estimator path.
    val kmv = udaf(new KmvAgg(SketchQueries.K), Encoders.scalaLong)
    val hashed = Tables.load(spark, sfDir, "lineitem")
      .select(hash60(col("l_orderkey").cast("string")).as("hv"))
    val exact = hashed.distinct().count().toDouble
    def est(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(kmv(col("hv")).as("s")).select(col("s.est_distinct"))
        .collect().head.getDouble(0)
    val e1 = est(hashed.repartition(1))
    val e32 = est(hashed.repartition(32))
    // Same input SET => identical bottom-k whatever the partitioning: the
    // merge path must not change the answer.
    assert(e1 == e32, s"KMV not merge-invariant: $e1 vs $e32")
    val rse = 1.0 / math.sqrt(SketchQueries.K - 2)
    assert(math.abs(e1 - exact) / exact <= 3 * rse,
      s"KMV est $e1 vs exact $exact outside 3*RSE")
  }

  test("CMS estimates are one-sided and within the epsilon-N bound") {
    val rows = SparkEntry.queries("q_sketch_cms_topk")(spark, sfDir).collect()
    // One output row per probed user PRESENT in the data (inner join with
    // the exact side) — at sf0.001 only 14 of the 20 probe ids have events.
    val present = Tables.load(spark, sfDir, "events")
      .filter(col("user_id").between(1, 20))
      .select("user_id").distinct().count()
    assert(rows.length == present && present > 0)
    val n = Tables.load(spark, sfDir, "events").count()
    // Overestimate-only is a STRUCTURAL property (cells only add counts);
    // the magnitude bound e*N/W holds per row with prob 1-2^-D, and the
    // data+hashes are fixed, so a pass is stable. Slack 2x for the union
    // over 20 probes.
    val bound = 2.0 * math.E * n / SketchQueries.W
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact"); val e = r.getAs[Long]("n_est")
      assert(e >= exact, s"CMS underestimated user ${r.get(0)}: $e < $exact")
      assert(e - exact <= bound,
        s"CMS error ${e - exact} for user ${r.get(0)} above bound $bound")
    }
    CacheScope.releaseAll()
  }
}
