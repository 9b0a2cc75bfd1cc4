package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.dedup.{DedupQueries, SemanticDedupQueries}

/** dedup_semdedup's contract on planted geometry. EXACT duplicate vectors
  * are guaranteed to co-locate (identical vectors have identical distances
  * to every centroid, and the argmin tie-breaks deterministically), so the
  * planted near-dup groups use identical directions; filler vectors push
  * n above SemK so the quantizer actually partitions.
  */
class SemdedupSpec extends SparkSpec {

  private val Dim = 8

  private def embDf(rows: Seq[(Long, Seq[Float])], parts: Int = 3): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v) }, parts),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))

  private def axis(i: Int, scale: Float): Seq[Float] =
    Seq.tabulate(Dim)(j => if (j == i) scale else 0.0f)

  private def run(rows: Seq[(Long, Seq[Float])]): Map[Long, (Long, Boolean)] =
    try SemanticDedupQueries.semdedupOf(embDf(rows)).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    finally CacheScope.releaseAll()

  test("duplicate groups co-locate; only the lowest id survives; dissimilar cell-mates all survive") {
    // Group A: ids 0,2,4 identical (axis 0). Group B: ids 1,3 identical
    // (axis 1). Fillers 6..17: +/- axes 2..7 — every cross-group cosine
    // is 0 or -1, far below SemTau, so NO filler may ever be dropped no
    // matter which cells the quantizer forms.
    val rows =
      Seq(0L -> axis(0, 1.0f), 2L -> axis(0, 1.0f), 4L -> axis(0, 1.0f),
        1L -> axis(1, 1.0f), 3L -> axis(1, 1.0f)) ++
        (0 until 12).map { k =>
          (6L + k) -> axis(2 + k % 6, if (k < 6) 1.0f else -1.0f)
        }
    val out = run(rows)
    assert(out.keySet == rows.map(_._1).toSet, "every vector exactly once")
    val cell = out.view.mapValues(_._1).toMap
    val kept = out.view.mapValues(_._2).toMap
    assert(cell(0L) == cell(2L) && cell(0L) == cell(4L),
      s"identical vectors split across cells: $cell")
    assert(cell(1L) == cell(3L), s"identical vectors split across cells: $cell")
    assert(kept(0L) && !kept(2L) && !kept(4L), s"group A keep rule: $kept")
    assert(kept(1L) && !kept(3L), s"group B keep rule: $kept")
    (6L to 17L).foreach(id =>
      assert(kept(id), s"dissimilar filler $id dropped: $kept"))
  }

  test("eval: planted exact-duplicate truth is fully recalled (duplicates always co-locate)") {
    // Truth pairs are exact duplicates only — guaranteed same-cell — so
    // recall must be exactly 1.0; fillers (orthogonal) contribute no
    // truth pairs but do contribute within-cell candidates, so precision
    // is <= 1 and the counts must be internally consistent.
    val rows =
      Seq(0L -> axis(0, 1.0f), 2L -> axis(0, 1.0f), 4L -> axis(0, 1.0f),
        1L -> axis(1, 1.0f), 3L -> axis(1, 1.0f)) ++
        (0 until 12).map { k =>
          (6L + k) -> axis(2 + k % 6, if (k < 6) 1.0f else -1.0f)
        }
    val r =
      try SemanticDedupQueries.semdedupEvalOf(embDf(rows)).collect()(0)
      finally CacheScope.releaseAll()
    val (nVecs, nTruth, nCand, nHit) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    val (recall, precision) = (r.getDouble(4), r.getDouble(5))
    assert(nVecs == rows.size)
    assert(nTruth == 4, s"expected the 3+1 duplicate pairs, got $nTruth")
    assert(recall == 1.0, s"exact duplicates must always share a cell: $r")
    assert(nHit <= nCand && precision <= 1.0)
  }

  test("n <= k degenerate regime: duplicates still co-locate and dedup") {
    // Fewer vectors than SemK seeds — cells collapse toward singletons,
    // but an exact duplicate pair still shares its cell and dedups, and
    // orthogonal vectors survive wherever they land.
    val rows = Seq(0L -> axis(0, 1.0f), 1L -> axis(1, 1.0f),
      2L -> axis(0, 1.0f))
    val out = run(rows)
    assert(out(0L)._1 == out(2L)._1, s"duplicate pair split: $out")
    assert(out(0L)._2 && !out(2L)._2 && out(1L)._2, s"keep rule: $out")
  }
}
