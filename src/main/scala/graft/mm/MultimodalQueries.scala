package graft.mm

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{QueryPack, Tables}

/** Multimodal-column plumbing (BASELINE.json north star).
  *
  * The testdata has no real image/audio bytes and this container has no
  * codec libraries, so — as directed — the DECODE step is a deterministic
  * stub, while everything Spark-side is real: an opaque `binary` payload
  * column, per-partition batched decoding through `mapPartitions` (the
  * model-per-task pattern: one "codec" init per partition, not per row),
  * a typed metadata schema, and an explode for frame sampling.
  *
  * The stub derives (width, height, channels) from the payload length, so
  * the whole flow is still oracle-checkable in DuckDB — the plumbing is
  * verified end-to-end even though the codec is fake.
  *
  * Scale notes: payload stays in one column (parquet binary, never
  * exploded); decode is a narrow mapPartitions (no shuffle); frame
  * sampling explodes only the tiny index range, not the bytes.
  */
object MultimodalQueries extends QueryPack {

  /** Decoded-media metadata record (what a real image decode would yield). */
  final case class MediaMeta(doc_id: Long, n_bytes: Int,
      width: Int, height: Int, channels: Int)

  /** The deterministic stand-in for an image decoder. A real deployment
    * replaces ONLY this function (and initializes its codec in the
    * mapPartitions head below).
    */
  private def decodeStub(docId: Long, payload: Array[Byte]): MediaMeta = {
    val n = payload.length
    MediaMeta(docId, n, 1 + n % 64, 1 + (n / 64) % 64, 3)
  }

  private def media(s: SparkSession, d: String): DataFrame =
    Tables.load(s, d, "documents")
      .select(col("doc_id"), encode(col("text"), "utf-8").as("payload"))

  override val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Batched decode: binary column -> typed metadata via mapPartitions.
    "mm_decode" -> ((s, d) => {
      import s.implicits._
      media(s, d)
        .as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          // Real codepath would initialize the codec HERE, once per task.
          rows.map { case (id, bytes) => decodeStub(id, bytes) }
        }
        .toDF()
    }),

    // Resize: target 32x32x3 from the decoded dims (stub math; real path
    // swaps decodeStub + this arithmetic for a codec call, shape unchanged).
    "mm_resize" -> ((s, d) => {
      import s.implicits._
      media(s, d)
        .as[(Long, Array[Byte])]
        .mapPartitions { rows =>
          rows.map { case (id, bytes) =>
            val m = decodeStub(id, bytes)
            (m.doc_id, m.width, m.height, 32, 32,
              math.round(m.width.toDouble / 32 * 10000).toDouble / 10000,
              32 * 32 * 3)
          }
        }
        .toDF("doc_id", "src_w", "src_h", "dst_w", "dst_h", "scale_x", "n_bytes_out")
    }),

    // Feature extraction: a deterministic 4-dim "embedding" from the
    // payload digest (stands in for a vision encoder; SQL-checkable).
    "mm_features" -> ((s, d) => {
      val dig = md5(col("payload"))
      val feats = (0 until 4).map { i =>
        (conv(substring(dig, 1 + 2 * i, 2), 16, 10).cast("double") / 255.0)
          .as(s"f$i")
      }
      media(s, d).select(col("doc_id") +: feats: _*)
    }),

    // Frame sampling: every 10th frame index of a fake n_frames-long video.
    "mm_frame_sample" -> ((s, d) => {
      val nFrames = (length(col("payload")) % 96) + 1
      media(s, d)
        .select(col("doc_id"), nFrames.as("n_frames"))
        .select(col("doc_id"), col("n_frames"),
          explode(sequence(lit(0), col("n_frames") - 1, lit(10))).as("frame_idx"))
        .select(col("doc_id"), col("n_frames"), col("frame_idx"),
          round(col("frame_idx") / 24.0, 6).as("frame_ts"))
    })
  )

  override val oracles: Map[String, String] = Map(
    "mm_decode" ->
      """SELECT doc_id,
        |       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
        |       CAST(1 + octet_length(encode(text)) % 64 AS INT) AS width,
        |       CAST(1 + (octet_length(encode(text)) // 64) % 64 AS INT) AS height,
        |       3 AS channels
        |FROM documents""".stripMargin,

    "mm_resize" ->
      """WITH m AS (
        |  SELECT doc_id,
        |         CAST(1 + octet_length(encode(text)) % 64 AS INT) AS src_w,
        |         CAST(1 + (octet_length(encode(text)) // 64) % 64 AS INT) AS src_h
        |  FROM documents
        |)
        |SELECT doc_id, src_w, src_h, 32 AS dst_w, 32 AS dst_h,
        |       round(CAST(src_w AS DOUBLE) / 32, 4) AS scale_x,
        |       3072 AS n_bytes_out
        |FROM m""".stripMargin,

    "mm_features" ->
      s"""SELECT doc_id,
         |${(0 until 4).map(i =>
             s"       (('0x' || substring(md5(text), ${1 + 2 * i}, 2))::BIGINT / 255.0) AS f$i")
            .mkString(",\n")}
         |FROM documents""".stripMargin,

    "mm_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) % 96 + 1 AS INT) AS n_frames
        |  FROM documents
        |)
        |SELECT doc_id, n_frames, CAST(unnest(range(0, n_frames, 10)) AS INT) AS frame_idx,
        |       round(CAST(unnest(range(0, n_frames, 10)) AS INT) / 24.0, 6) AS frame_ts
        |FROM m""".stripMargin
  )
}
