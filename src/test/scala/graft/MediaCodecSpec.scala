package graft

import org.apache.spark.sql.functions._

import graft.mm.MediaCodecQueries

/** Real-codec decode keys (r15): the JDK's ImageIO / AudioSystem round
  * trips, checked against the closed-form metadata the oracle uses, plus
  * the lossless-pixel/lossless-sample invariants that only hold if the
  * decoder actually parsed the container format.
  */
class MediaCodecSpec extends SparkSpec {

  test("mm_decode_png: decoded dims/channels/pixel match the closed form") {
    val got = MediaCodecQueries.queries("mm_decode_png")(spark, sfDir)
    try {
      val bad = got.filter(
        col("width") =!= (lit(1) + pmod(col("doc_id"), lit(16))).cast("int") ||
          col("height") =!= (lit(1) + pmod(col("doc_id"), lit(13))).cast("int") ||
          col("channels") =!= 3 ||
          col("luma") =!= pmod(col("doc_id"), lit(256)).cast("int"))
      assert(bad.isEmpty, bad.limit(3).collect().mkString("; "))
      assert(got.count() ==
        Tables.load(spark, sfDir, "documents").count())
    } finally CacheScope.releaseAll()
  }

  test("mm_decode_wav: decoded format/frames/first-sample match the closed form") {
    val got = MediaCodecQueries.queries("mm_decode_wav")(spark, sfDir)
    try {
      val bad = got.filter(
        col("sample_rate") =!= 8000 || col("channels") =!= 1 ||
          col("n_frames") =!= lit(32L) + pmod(col("doc_id"), lit(64L)) ||
          col("amp0") =!= pmod(col("doc_id"), lit(1000L)).cast("int"))
      assert(bad.isEmpty, bad.limit(3).collect().mkString("; "))
    } finally CacheScope.releaseAll()
  }

  test("decode is a real parse: corrupt payload fails loudly, not quietly") {
    // ImageIO.read returns null on garbage — the mapPartitions decode
    // would NPE on metadata access. Verify the codec path distinguishes
    // real PNG bytes from the old text-bytes stand-in.
    val garbage = "not a png".getBytes("utf-8")
    assert(javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(garbage)) == null)
    intercept[Exception] {
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(garbage))
    }
  }
}
