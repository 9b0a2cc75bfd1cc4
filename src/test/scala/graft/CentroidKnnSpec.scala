package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, IntegerType, LongType, StructField, StructType}

import graft.sim.{KnnGraphQueries, SimilarityQueries, VecMath}

/** Planted-geometry checks for the nearest-centroid confusion matrix and
  * the LSH knn graph: separable clusters classify to the diagonal, a
  * planted mislabel lands off-diagonal exactly where it should, and
  * identical-direction vectors are each other's top neighbors.
  */
class CentroidKnnSpec extends SparkSpec {

  private def embDf(rows: Seq[(Long, Int, Array[Float])]): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (id, l, e) =>
        Row(id, l, e.toSeq) }, 2),
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("label", IntegerType),
        StructField("embedding", ArrayType(FloatType)))))

  // 8 dims: signBucket hashes the first 8 components' signs.
  private def vec(axis: Int, mag: Float): Array[Float] = {
    val a = Array.fill(8)(0.0f); a(axis) = mag; a
  }

  test("separable clusters produce a diagonal confusion matrix") {
    // Label 0 hugs axis 0, label 1 hugs axis 1; one PLANTED MISLABEL:
    // vec 99 sits on axis 0 but carries label 1.
    val rows = Seq[(Long, Int, Array[Float])](
      (1L, 0, vec(0, 1.0f)), (2L, 0, vec(0, 0.9f)), (3L, 0, vec(0, 0.8f)),
      (11L, 1, vec(1, 1.0f)), (12L, 1, vec(1, 0.9f)), (13L, 1, vec(1, 0.8f)),
      (99L, 1, vec(0, 1.0f)))
    val got =
      try KnnGraphQueries.centroidConfusionOf(embDf(rows))
        .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
      finally CacheScope.releaseAll()
    // The mislabel drags label-1's centroid slightly off axis 1, but the
    // three true members still sit closer to it; vec 99 itself is nearer
    // the label-0 centroid -> one (1, 0) off-diagonal count.
    assert(got == Map((0, 0) -> 3L, (1, 1) -> 3L, (1, 0) -> 1L), s"got $got")
  }

  test("identical-direction vectors are mutual top neighbors in the knn graph") {
    val rows = Seq[(Long, Int, Array[Float])](
      (0L, 0, vec(0, 1.0f)), (1L, 0, vec(0, 0.5f)),
      (2L, 0, vec(0, 0.25f)), (3L, 0, vec(0, 0.125f)))
    val e = embDf(rows).select(col("vec_id"), col("embedding"),
      VecMath.quantize(col("embedding")).as("qe"))
      .select(col("vec_id"), col("embedding"), col("qe"),
        VecMath.norm2Q(col("qe")).as("norm2"))
    val got =
      try KnnGraphQueries.knnGraphOf(e)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(3)).toMap
      finally CacheScope.releaseAll()
    // All four share direction (same sign bucket, pairwise cos 1.0), so
    // every vector lists the other three, ranked by n_id ascending.
    val expected = (0L to 3L).flatMap { a =>
      (0L to 3L).filter(_ != a).sorted.zipWithIndex.map {
        case (b, i) => (a, b) -> (i + 1)
      }
    }.toMap
    assert(got == expected, s"got $got")
  }
}
