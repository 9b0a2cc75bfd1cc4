package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.sim.Pca

/** sim_pca_power's contract on planted geometry: the two power steps from
  * the scatter matrix must recover a dominant variance axis — vectors
  * spread along one axis get the extreme projections, orthogonal noise
  * stays near zero — and the output is scale-normalized to max |pc1| = 1.
  */
class PcaPowerSpec extends SparkSpec {

  private val Dim = 8

  private def embDf(rows: Seq[(Long, Seq[Float])], parts: Int = 3): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v) }, parts),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))

  private def run(df: DataFrame): Map[Long, Double] =
    try Pca.project(df).collect()
      .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    finally CacheScope.releaseAll()

  test("dominant axis dominates the projection; output is max-normalized") {
    // Variance concentrated on axis 0 (values -4..4); small fixed jitter
    // on axis 1 so no dimension is degenerate.
    val rows = (0 until 9).map { i =>
      val x = (i - 4).toFloat
      i.toLong -> Seq.tabulate(Dim)(j =>
        if (j == 0) x else if (j == 1) 0.1f * (i % 2) else 0.0f)
    }
    val pc = run(embDf(rows))
    assert(pc.size == 9)
    assert(pc.values.forall(v => v >= -1.0 && v <= 1.0), s"out of range: $pc")
    assert(math.abs(pc.values.map(math.abs).max - 1.0) < 1e-9,
      s"not max-normalized: $pc")
    // the two ends of the dominant axis carry the extreme projections,
    // with opposite signs
    val ends = Seq(pc(0L), pc(8L))
    assert(ends.map(math.abs).min > 0.9, s"axis ends not extreme: $pc")
    assert(ends.head * ends.last < 0, s"axis ends not opposed: $pc")
    // the center of the axis projects near zero
    assert(math.abs(pc(4L)) < 0.2, s"axis center not near zero: $pc")
    // monotone along the planted axis
    val ordered = (0L to 8L).map(pc)
    assert(ordered == ordered.sorted || ordered == ordered.sorted.reverse,
      s"projection not monotone along the planted axis: $ordered")
  }

  test("projection is deterministic across recomputation") {
    val rows = (0 until 12).map { i =>
      i.toLong -> Seq.tabulate(Dim)(j =>
        (((i * 7 + j * 13) % 11) - 5).toFloat / 10f)
    }
    val a = run(embDf(rows, 2))
    val b = run(embDf(rows, 4)) // different partitioning, same data
    assert(a == b, "partitioning changed the exact projection")
  }
}
