package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.sim.SimilarityQueries

/** sim_rp_project's algebra: the sign matrix is fixed by (i, k) alone, so
  * the projection must be exactly linear in the quantized input and
  * bit-identical under repartitioning.
  */
class RpProjectSpec extends SparkSpec {

  private val Dim = 8

  private def embDf(rows: Seq[(Long, Seq[Float])], parts: Int = 3): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map { case (i, v) => Row(i, v) }, parts),
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))

  private def run(rows: Seq[(Long, Seq[Float])], parts: Int = 3): Map[(Long, Long), Long] =
    SimilarityQueries.rpProject(spark, embDf(rows, parts)).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap

  test("every vector gets RpDims exact components; basis vectors map to +/-1000") {
    val basis = (0 until Dim).map(j =>
      j.toLong -> Seq.tabulate(Dim)(i => if (i == j) 1.0f else 0.0f))
    val out = run(basis :+ (99L -> Seq.fill(Dim)(0.0f)))
    assert(out.keys.map(_._1).toSet == (basis.map(_._1).toSet + 99L))
    assert(out.count { case ((v, _), _) => v == 99L } == SimilarityQueries.RpDims)
    // zero vector projects to zero everywhere
    (0L until SimilarityQueries.RpDims.toLong).foreach(k =>
      assert(out((99L, k)) == 0L))
    // each basis vector hits exactly one matrix column: components are
    // exactly +/-1000 (quantized 1.0f times the +/-1 sign)
    basis.foreach { case (id, _) =>
      (0L until SimilarityQueries.RpDims.toLong).foreach { k =>
        assert(math.abs(out((id, k))) == 1000L,
          s"basis $id, k=$k got ${out((id, k))}")
      }
    }
  }

  test("projection is linear and partitioning-invariant") {
    val v = Seq.tabulate(Dim)(i => (i - 3).toFloat / 4f)
    val rows = Seq(0L -> v, 1L -> v.map(_ * 2))
    val a = run(rows, 2)
    val b = run(rows, 5)
    assert(a == b, "partitioning changed the exact projection")
    (0L until SimilarityQueries.RpDims.toLong).foreach(k =>
      assert(a((1L, k)) == 2 * a((0L, k)), s"not linear at k=$k: $a"))
  }
}
