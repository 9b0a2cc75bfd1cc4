package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import streaming.{Cusum, Ewma, StreamingQueries}

/** Real readStream runs of the [[streaming.Cusum]] stateful operator must
  * reproduce the registered `stream_cusum` batch fold exactly — including
  * a two-batch replay split WITHIN days, where (S, n, alarms) state
  * crosses the micro-batch boundary and must resume bit-for-bit.
  */
class CusumStreamSpec extends SparkSpec {

  private def batchExpected: Map[(String, java.sql.Date), (Long, Double, Long)] =
    StreamingQueries.queries("stream_cusum")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getDate(1)) ->
        ((r.getLong(2), r.getDouble(3), r.getLong(4)))).toMap

  private def pin(e: Double): Double =
    BigDecimal(e).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("streaming CUSUM (availableNow) == batch fold") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cusum").toString
    Tables.load(spark, sfDir, "events").write.mode("overwrite").parquet(tmp)
    val in = spark.readStream.schema(spark.read.parquet(tmp).schema).parquet(tmp)
    val q = Cusum.cusum(Ewma.fromRaw(in))
      .writeStream.format("memory").queryName("cusum_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    assert(q.awaitTermination(300000), "stream did not finish in time")
    val streamed = spark.table("cusum_out").collect()
      .map(r => ((r.getString(0), r.getDate(1)),
        (r.getLong(2), r.getDouble(3), r.getLong(4))))
      .groupBy(_._1)
      .map { case (k, vs) =>
        val (n, s, a) = vs.map(_._2).maxBy(_._1)
        k -> ((n, pin(s), a)) }
    assert(streamed == batchExpected)
    assert(streamed.nonEmpty)
    // the detector genuinely fired somewhere in this corpus
    assert(streamed.values.exists(_._3 > 0), "no alarms anywhere")
  }

  test("CUSUM state resumes exactly across an intra-day two-batch split") {
    val base = java.nio.file.Files.createTempDirectory("graft-cusum2")
    val d1 = base.resolve("b1").toString
    val d2 = base.resolve("b2").toString
    val ev = Tables.load(spark, sfDir, "events")
    ev.filter(hour(col("ts")) < 12).coalesce(1)
      .write.mode("overwrite").parquet(d1)
    ev.filter(hour(col("ts")) >= 12).coalesce(1)
      .write.mode("overwrite").parquet(d2)
    val ckpt = base.resolve("ckpt").toString
    val srcDir = base.resolve("src").toString
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(srcDir))
    var tag = 0
    def copyIn(from: String): Unit = {
      tag += 1
      val st = java.nio.file.Files.list(java.nio.file.Paths.get(from))
      try st.forEach { p =>
        if (p.toString.endsWith(".parquet"))
          java.nio.file.Files.copy(p,
            java.nio.file.Paths.get(srcDir, s"half$tag-${p.getFileName}"))
      } finally st.close()
    }
    val out = base.resolve("out").toString
    val schema = spark.read.parquet(d1).schema
    def runOnce(): Unit = {
      val in = spark.readStream.schema(schema).parquet(srcDir)
      val q = Cusum.cusum(Ewma.fromRaw(in))
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      assert(q.awaitTermination(300000), "stream did not finish in time")
    }
    copyIn(d1); runOnce()
    val firstRows = spark.read.parquet(out).collect()
    copyIn(d2); runOnce()
    val all = spark.read.parquet(out).collect()
    val streamed = all
      .map(r => ((r.getString(0), r.getDate(1)),
        (r.getLong(2), r.getDouble(3), r.getLong(4))))
      .groupBy(_._1)
      .map { case (k, vs) =>
        val (n, s, a) = vs.map(_._2).maxBy(_._1)
        k -> ((n, pin(s), a)) }
    assert(streamed == batchExpected)
    assert(streamed.nonEmpty)
    val k1 = firstRows.map(r => ((r.getString(0), r.getDate(1)), r.getLong(2))).toMap
    assert(all.exists(r =>
      k1.get((r.getString(0), r.getDate(1))).exists(_ < r.getLong(2))),
      "no key's state crossed the batch boundary")
  }
}
