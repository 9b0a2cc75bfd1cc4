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

  test("HLL estimate is within 3 sigma of truth and partitioning-invariant") {
    import spark.implicits._
    // 5000 planted distinct values (each duplicated 3x in shuffled
    // interleave) — well past linear-counting, the raw-estimator path.
    val vals = (1L to 5000L).flatMap(v => Seq(v, v, v))
    def hll(parts: Int) = SketchQueries
      .hllOf(vals.toDF("v").repartition(parts), lit("all"), col("v"))
      .collect().head
    val r1 = hll(1); val r32 = hll(32)
    // Registers are max-of-rank over the input SET: any partitioning,
    // same sketch.
    assert(r1 == r32, s"HLL not merge-invariant: $r1 vs $r32")
    val est = r1.getAs[Double]("est_distinct")
    val sigma = 1.04 / math.sqrt(SketchQueries.HllM)
    assert(math.abs(est - 5000.0) / 5000.0 <= 3 * sigma,
      s"HLL est $est vs exact 5000 outside 3 sigma")
    CacheScope.releaseAll()
  }

  test("HLL small cardinalities take the linear-counting branch") {
    import spark.implicits._
    // 20 distinct values in m=64 registers: raw HLL underestimates badly
    // here; the V>0 linear-counting branch must engage and land close.
    val r = SketchQueries
      .hllOf((1L to 20L).toDF("v"), lit("all"), col("v"))
      .collect().head
    assert(r.getAs[Long]("v_zero") > 0)
    val est = r.getAs[Double]("est_distinct")
    assert(math.abs(est - 20.0) <= 6.0,
      s"linear-counting est $est too far from 20")
    CacheScope.releaseAll()
  }

  test("KMV overlap estimate degenerates to EXACT jaccard when union <= k") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    // Three-word docs carry exactly one 3-gram each: srcA's shingle set is
    // {g1..g40}, srcB's {g21..g60} — exact jaccard 20/60. The union (60)
    // is below k=256, so the sketch IS the set and the "estimate" must be
    // exact.
    def doc(i: Int) = s"w${i}a w${i}b w${i}c"
    val rows =
      (1 to 40).map(i => Row(i.toLong, doc(i), "srcA")) ++
        (21 to 60).map(i => Row(100L + i, doc(i), "srcB"))
    val dd = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 4),
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("source", StringType))))
    // Same builder as the registered query, just over the planted docs.
    val kmvKeep = udaf(new graft.sketch.KmvKeepAgg(SketchQueries.K), Encoders.scalaLong)
    val sk = dd
      .select(col("source"), graft.dedup.Shingles.tokens(col("text")).as("tk"))
      .select(col("source"),
        explode(graft.dedup.Shingles.shingleHashes3(col("tk"))).as("h"))
      .groupBy("source").agg(kmvKeep(col("h")).as("s"))
      .select(col("source"), col("s.hs").as("hs"))
    val got = sk.as("a").join(sk.as("b"), col("a.source") < col("b.source"))
      .select(
        slice(array_sort(array_union(col("a.hs"), col("b.hs"))),
          lit(1), lit(SketchQueries.K)).as("mk"),
        col("a.hs").as("ha"), col("b.hs").as("hb"))
      .select(size(col("mk")).as("k_union"),
        size(array_intersect(array_intersect(col("mk"), col("ha")),
          col("hb"))).as("n_both"))
      .collect().head
    assert(got.getInt(0) == 60, s"union must be exact below k: $got")
    assert(got.getInt(1) == 20, s"intersection must be exact below k: $got")
  }

  test("bloom pruning is one-sided and within the FP-rate bound") {
    val row = SparkEntry.queries("q_sketch_bloom")(spark, sfDir).collect().head
    val (nb, nt, fp) = (row.getAs[Long]("n_keys_bloom"),
      row.getAs[Long]("n_keys_true"), row.getAs[Long]("n_false_pos"))
    assert(nt > 0)
    // One-sided: a bloom filter can never drop a true match.
    assert(fp >= 0 && nb == nt + fp, s"bloom lost true matches: $row")
    // FP magnitude: q_sketch_bloom builds a PARTITIONED filter — D
    // independent hash rows, each its own W-bit array — so a
    // non-matching probe passes with p = (1 - e^(-n/W))^D, NOT the
    // single-shared-array formula (1 - e^(-D*n/W))^D (which would be ~25x
    // looser here at sf0.1). Slack 3x + 5 for the small-count regime.
    val nBuild = Tables.load(spark, sfDir, "orders")
      .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      .count().toDouble
    val nProbe = Tables.load(spark, sfDir, "lineitem")
      .select("l_orderkey").distinct().count().toDouble
    val p = math.pow(1 - math.exp(-nBuild / SketchQueries.BloomW),
      SketchQueries.D)
    assert(fp <= 3 * p * (nProbe - nt) + 5,
      s"false positives $fp above bound ${3 * p * (nProbe - nt) + 5}")
    CacheScope.releaseAll()
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
