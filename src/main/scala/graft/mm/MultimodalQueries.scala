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
  * verified end-to-end even though the codec is fake. The REAL-bytes
  * twin lives in [[MediaCodecQueries]] (r15): mm_decode_png /
  * mm_decode_wav run this same decode shape with the JDK's own ImageIO /
  * AudioSystem codecs over genuine PNG/WAV payloads.
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

  /** Signature bit width (62 keeps the MSB-first fold non-negative). */
  val PhashBits = 62

  /** Blur-detect scanline length and the variance gate (the corpus'
    * Laplacian variance spans ~600..11k with median ~5.6k, so 4000
    * genuinely splits it; a real deployment calibrates this on decoded
    * pixels).
    */
  val BlurSamples = 64
  val BlurVarThreshold = 4000L

  /** DCT cos basis for mm_phash_dct, 1e9-scaled integers: entry
    * [u*16 + x] = round(cos(π(2x+1)u/32) * 1e9) for u in 0..3, x in
    * 0..15 — computed ONCE here and embedded as the SAME literal array
    * in the Spark expression and the DuckDB oracle (the EwmaTaps
    * shared-constants pattern), so no libm call and no literal-parsing
    * divergence can reach the hot path.
    */
  val DctCosTab: IndexedSeq[Long] = graft.functions.Dct16.CosTab.toIndexedSeq

  /** The table as a Spark SQL array literal. */
  val DctCosTabSql: String = graft.ConstTab.sparkArray(DctCosTab)

  /** The same values as a DuckDB list literal. */
  val DctCosTabDuck: String = graft.ConstTab.duckList(DctCosTab)

  /** mm_phash_dedup gate distance; 4 bands pigeonhole-guarantee complete
    * candidate recall for hamming <= 3 (one clean band per true pair).
    */
  val PhashHamMax = 3

  /** doc_id offset of the corrupted twin in mm_phash_dedup's probe
    * corpus (far above any real doc_id at every SF).
    */
  val PhashTwinOffset = 10000000L

  /** mm_phash_dedup's probe corpus: the documents plus a one-"pixel"
    * corrupted twin of each (same length, first byte flipped) — the
    * testdata's natural near-dups are edit-SHIFTED (which moves every
    * sample position, the known aHash failure mode), so, like
    * stream_dedup's self-union, the twin is what gives the band join
    * true positives to find at the gate distance.
    */
  private def phashDocs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.load(s, d, "documents").select(col("doc_id"), col("text"))
    docs.union(docs.select(col("doc_id") + PhashTwinOffset,
      concat(lit("Z"), expr("substr(text, 2)"))))
  }

  /** The 62-sample average-hash signature per document (see mm_phash). */
  private def phashOf(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), length(col("text")).as("n"), col("text"))
      .withColumn("codes", expr(
        s"""transform(sequence(0, ${PhashBits - 1}),
           |  i -> ascii(substr(text, CAST(1 + (i * (n - 1)) div ${PhashBits - 1} AS INT), 1)))"""
          .stripMargin))
      .withColumn("scode", expr("aggregate(codes, 0L, (a, x) -> a + x)"))
      .withColumn("phash", expr(
        s"""aggregate(codes, 0L,
           |  (a, x) -> a * 2 + CASE WHEN x * $PhashBits > scode THEN 1L ELSE 0L END)"""
          .stripMargin))

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

    // Aspect-ratio bucketing (the SDXL/LAION training-batch prep step):
    // every image goes to the nearest standard aspect bucket so batches
    // share a shape and padding waste is bounded. The argmin is EXACT —
    // |w/h − a/b| ∝ |10⁴·w − bar·h| once the bucket ratio is the scaled
    // integer bar = round(10⁴·a/b), so bucket assignment can never flip
    // on a float ulp; per-image fit waste 1 − min(ar/bar', bar'/ar) is
    // one identical double division, round(,9)-pinned and decimal-summed
    // into the per-bucket mean. Scale shape: decode is the same narrow
    // mapPartitions as mm_decode; the 7-row bucket relation broadcasts;
    // output is |buckets|-bounded.
    "mm_aspect_bucket" -> ((s, d) => {
      import s.implicits._
      val dims = media(s, d)
        .as[(Long, Array[Byte])]
        .mapPartitions(_.map { case (id, bytes) =>
          val m = decodeStub(id, bytes)
          (m.doc_id, m.width, m.height)
        })
        .toDF("doc_id", "w", "h")
      val buckets = broadcast(AspectBuckets.toDF("bucket", "bar"))
      dims.crossJoin(buckets)
        .withColumn("dist", abs(lit(10000L) * col("w") - col("bar") * col("h")))
        .groupBy(col("doc_id"), col("w"), col("h"))
        .agg(min(struct(col("dist"), col("bar"), col("bucket"))).as("b"))
        .select(col("doc_id"), col("w"), col("h"),
          col("b.bucket").as("bucket"), col("b.bar").as("bar"),
          round(lit(1.0) - least(
            lit(10000.0) * col("w") / (col("b.bar") * col("h")),
            col("b.bar") * col("h") / (lit(10000.0) * col("w"))), 9).as("waste"))
        .groupBy(col("bucket"), col("bar"))
        .agg(count(lit(1)).as("n_images"),
          (sum(col("waste").cast(org.apache.spark.sql.types.DecimalType(20, 9)))
            .cast("double") / count(lit(1))).as("sw"))
        .select(col("bucket"), col("bar"), col("n_images"),
          round(col("sw"), 6).as("avg_waste"))
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

    // Perceptual hash (average-hash shape): 62 evenly-spaced "pixel"
    // samples from the payload, each thresholded against the sample mean,
    // folded MSB-first into one BIGINT signature. The codec stub stands in
    // for real pixel extraction (same contract as mm_decode); everything
    // downstream — the threshold compare (exact integer: code·62 > Σcodes,
    // no division), the bit fold, the signature column — is the real
    // plumbing a pHash pipeline ships. 62 bits keeps the fold inside a
    // non-negative BIGINT under ANSI overflow checking. Narrow map, no
    // shuffle; the oracle rebuilds the signature through an INDEPENDENT
    // unnest/sum formulation.
    "mm_phash" -> ((s, d) =>
      phashOf(Tables.load(s, d, "documents").select(col("doc_id"), col("text")))
        .select(col("doc_id"), col("phash"),
          bit_count(col("phash")).as("nbits"))),

    // Blur detection — variance of the Laplacian, the standard sharpness
    // gate an image-ingest pipeline runs right after decode (OpenCV's
    // cv2.Laplacian(img).var() recipe): low second-derivative variance =
    // no edges = blurry/empty frame, drop before it wastes training
    // tokens. Same decode stand-in as the hash family (the 64
    // deterministic payload samples are the "scanline"); the 1-D
    // Laplacian x[i-1] - 2x[i] + x[i+1], its variance n*Σl² - (Σl)², and
    // the gate compare are ALL exact int64 (one constant division reaches
    // the reported double) — a narrow zero-shuffle map at any scale.
    "mm_blur_detect" -> ((s, d) => {
      val m = BlurSamples - 2 // interior points carrying a Laplacian value
      Tables.load(s, d, "documents")
        .select(col("doc_id"), length(col("text")).as("n"), col("text"))
        .withColumn("codes", expr(
          s"""transform(sequence(0, ${BlurSamples - 1}),
             |  i -> ascii(substr(text, CAST(1 + (i * (n - 1)) div ${BlurSamples - 1} AS INT), 1)))"""
            .stripMargin))
        .withColumn("lap", expr(
          s"""transform(sequence(2, ${BlurSamples - 1}),
             |  i -> element_at(codes, i - 1) - 2 * element_at(codes, i) +
             |       element_at(codes, i + 1))""".stripMargin))
        .withColumn("sl", expr("aggregate(lap, 0L, (a, x) -> a + x)"))
        .withColumn("sq", expr("aggregate(lap, 0L, (a, x) -> a + x * x)"))
        .select(col("doc_id"), lit(m.toLong).as("n_samples"),
          round((lit(m.toLong) * col("sq") - col("sl") * col("sl"))
            .cast("double") / lit((m.toLong * m).toDouble), 6).as("lap_var"),
          when(lit(m.toLong) * col("sq") - col("sl") * col("sl") <
            lit(BlurVarThreshold * m * m), 1).otherwise(0).as("is_blurry"))
    }),

    // DCT perceptual hash — the REAL pHash algorithm shape next to
    // mm_phash's average-hash: the 256 deterministic payload samples
    // form a 16x16 "image", a 2D DCT projects it onto the 4x4 lowest
    // frequencies, and the 15 AC coefficients threshold against their
    // own mean into a 15-bit signature. Low-frequency energy is what
    // survives resizing/compression, which is why DCT hashes out-rank
    // average hashes on real media; here the transform, thresholding,
    // and bit packing are the real plumbing over the stub sampler.
    // Determinism is FULLY integer: the cos basis is a precomputed
    // 1e9-scaled BIGINT literal table ([[DctCosTab]] — the EwmaTaps
    // "same constants in both SQL texts" pattern, which also removes
    // libm from the hot path entirely; an earlier in-expression
    // cos(3.14...) form additionally hit Spark parsing the bare literal
    // as DECIMAL(16,15) and truncating the angle). The 2D transform is
    // SEPARABLE: 64 row sums r[x,v] = Σ_y m[x,y]·cos_v[y] (exact int64,
    // ≤ 2.1e12), sign-symmetrically truncated to 1e5 units (Spark `div`
    // truncates toward zero while DuckDB `//` floors — they only agree
    // on positives), then 16 column projections over the truncated rows
    // (≤ 3.3e17, int64-safe). Both stages now run inside ONE native
    // codegen expression ([[graft.functions.Dct16]] — a primitive loop
    // in whole-stage codegen; the r11 nested transform/aggregate HOF
    // form paid interpreted lambdas per element, measured 3.3 s isolated
    // at sf0.1 vs 1.7 s for this — the remainder is the interpreted
    // 256-sample transform, shared with the whole hash family). Only
    // the final /1e7 rounding stays in
    // the SQL layer (a 16-element transform) so the expression is pure
    // int64 — no rounding mode to keep in sync. Coefficients land as
    // round(/1e7) int64 so the threshold compare stays exact integer
    // arithmetic (ci*15 > Σci); the oracle is the unchanged independent
    // unnest/sum formulation over the same literal table, so the
    // expression swap is hash-checked, not trusted.
    "mm_phash_dct" -> ((s, d) => {
      val coefs = Tables.load(s, d, "documents")
        .select(col("doc_id"), length(col("text")).as("n"), col("text"))
        .withColumn("m", expr(
          """transform(sequence(0, 255),
            |  p -> ascii(substr(text, CAST(1 + (p * (n - 1)) div 255 AS INT), 1)))"""
            .stripMargin))
        .withColumn("raw", graft.functions.Dct16(col("m")))
        .select(col("doc_id"), col("n"), expr(
          """transform(raw,
            |  v -> CAST(round(CAST(v AS DOUBLE) / 10000000.0, 0) AS BIGINT))"""
            .stripMargin).as("coefs"))
        .transform(graft.CacheScope.persisted(_))
      coefs
        .withColumn("ac", expr("slice(coefs, 2, 15)"))
        .withColumn("stot", expr("aggregate(ac, CAST(0 AS BIGINT), (a, x) -> a + x)"))
        .withColumn("dct_hash", expr(
          """aggregate(transform(sequence(1, 15),
            |  i -> CASE WHEN element_at(ac, i) * 15 > stot
            |            THEN CAST(round(pow(2, 15 - i), 0) AS BIGINT)
            |            ELSE CAST(0 AS BIGINT) END),
            |  CAST(0 AS BIGINT), (a, x) -> a + x)""".stripMargin))
        .select(col("doc_id"), col("n").cast("long").as("n_chars"),
          col("dct_hash"), bit_count(col("dct_hash")).as("nbits"))
    }),

    // Near-duplicate media pairs by signature hamming distance <= 3,
    // found via 4-band LSH over the 62-bit phash: pigeonhole guarantees
    // any pair within distance 3 agrees exactly on at least one of the 4
    // bands, so candidate generation is a UNION of band equi-joins —
    // complete recall at the gate distance, never an all-pairs scan. The
    // oracle IS the all-pairs formulation (feasible at oracle scale),
    // so a banding bug that drops a true pair hash-fails. Same
    // band-join discipline as dedup_simhash_pairs, applied to the
    // multimodal lane.
    "mm_phash_dedup" -> ((s, d) => {
      val sigs = phashOf(phashDocs(s, d)).select(col("doc_id"), col("phash"))
        .transform(graft.CacheScope.persisted(_))
      val bands = sigs.select(col("doc_id"), col("phash"), explode(array(
        struct(lit(0).as("bk"), shiftright(col("phash"), 48).as("bv")),
        struct(lit(1).as("bk"),
          shiftright(col("phash"), 32).bitwiseAND(lit(0xFFFFL)).as("bv")),
        struct(lit(2).as("bk"),
          shiftright(col("phash"), 16).bitwiseAND(lit(0xFFFFL)).as("bv")),
        struct(lit(3).as("bk"),
          col("phash").bitwiseAND(lit(0xFFFFL)).as("bv")))).as("b"))
      val cand = bands.as("a").join(bands.as("c"),
          col("a.b.bk") === col("c.b.bk") && col("a.b.bv") === col("c.b.bv") &&
            col("a.doc_id") < col("c.doc_id"))
        .select(col("a.doc_id").as("doc_a"), col("c.doc_id").as("doc_b"),
          col("a.phash").as("pa"), col("c.phash").as("pb"))
        .distinct()
      cand.withColumn("hamming",
          bit_count(col("pa").bitwiseXOR(col("pb"))))
        .filter(col("hamming") <= PhashHamMax)
        .select(col("doc_a"), col("doc_b"), col("hamming"))
    }),

    // Media dedup CLUSTERS: connected components over the banded phash
    // pairs via the SAME generic [[graft.dedup.DedupClusters]] fixpoint
    // the lexical, embedding, and graph families run — a twin and its
    // original (and any transitive chain of within-gate neighbors)
    // collapse to one canonical cluster id; untouched media stay
    // singletons. Operator genericity across the multimodal lane; the
    // oracle is the recursive-reachability formulation over the
    // all-pairs phash relation.
    // The pair relation reads mm_phash_dedup's artifact through
    // [[graft.LabelsMemo]] (r15): the producer stays raw (its benched
    // cost is the honest phash + band-join pipeline); this consumer
    // profiles that artifact instead of replaying it — the same
    // managed-pair-table discipline as the lexical lane's lshPairsAll.
    "mm_dedup_clusters" -> ((s, d) => {
      val pairs = graft.LabelsMemo.getOrCompute(s"mm_phash_pairs:$d", s)(
          queries("mm_phash_dedup")(s, d))
        .select(col("doc_a"), col("doc_b"))
      graft.dedup.DedupClusters.clusters(pairs,
        phashDocs(s, d).select(col("doc_id")))
    }),

    // Cross-modal retrieval eval (the CLIP-alignment readout): each item
    // has a modality-A embedding and a derived modality-B embedding in
    // the SAME space (B = A + a deterministic per-(id, dim) integer
    // perturbation — the stand-in for a second encoder, exactly like the
    // decode stub stands in for a codec). For the query ids, rank ALL
    // B-vectors by exact quantized cosine and report recall@5 / MRR of
    // the true counterpart — the metric that gates whether paired
    // image-text data is aligned well enough to train on. Scale shape:
    // the query side broadcasts (bounded), the candidate scan is one
    // narrow map + a per-query bounded aggregation; per-query reciprocal
    // ranks are pinned at 9dp and DECIMAL-folded.
    "mm_crossmodal_recall" -> ((s, d) => {
      import graft.sim.VecMath._
      import org.apache.spark.sql.types.DecimalType
      val base = Tables.load(s, d, "embeddings")
        .select(col("vec_id"), quantize(col("embedding")).as("qa"))
        .select(col("vec_id"), col("qa"),
          transform(col("qa"), (x, i) =>
            x + ((col("vec_id") * 37 + i + 1) % 11 - 5) * CrossModalNoise).as("qb"))
        .transform(graft.CacheScope.persisted(_))
      val cand = base.select(col("vec_id").as("n_id"), col("qb"),
        norm2Q(col("qb")).as("nb"))
      val qs = base.filter(col("vec_id") < CrossModalQueries)
        .select(col("vec_id").as("q_id"), col("qa"), norm2Q(col("qa")).as("na"))
      val scored = cand.crossJoin(broadcast(qs))
        .select(col("q_id"), col("n_id"),
          round(cosine(dotQ(col("qa"), col("qb")), col("na"), col("nb")), 4)
            .as("cos"))
        .transform(graft.CacheScope.persisted(_))
      val truth = scored.filter(col("q_id") === col("n_id"))
        .select(col("q_id").as("tq"), col("cos").as("tcos"))
      val ranks = scored.join(broadcast(truth), col("q_id") === col("tq"))
        .groupBy(col("q_id"))
        .agg(sum(when(col("cos") > col("tcos") ||
            (col("cos") === col("tcos") && col("n_id") < col("q_id")), 1L)
          .otherwise(0L)).as("nbetter"))
        .select(col("q_id"), (col("nbetter") + 1).as("rank_true"))
      ranks.agg(count(lit(1)).as("n_queries"),
          sum(when(col("rank_true") <= 5, 1L).otherwise(0L)).as("n_hits"),
          sum(round(lit(1.0) / col("rank_true").cast("double"), 9)
            .cast(DecimalType(18, 9))).as("srr"))
        .select(col("n_queries"),
          round(col("n_hits").cast("double") /
            col("n_queries").cast("double"), 6).as("recall_at_5"),
          round(col("srr").cast("double") /
            col("n_queries").cast("double"), 6).as("mrr"))
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
    }),

    // Shot-boundary detection over the sampled frames: per-frame scalar
    // feature (stub: one sampled char code — a real pipeline plugs the
    // decoded frame's luma mean at this one site), then a boundary
    // wherever the feature jumps by more than [[ShotThreshold]] against
    // the previous sampled frame. The lag window is PARTITIONED by video
    // — per-partition state is ~10 sampled frames regardless of corpus
    // size — and the decision |Δfeat| > thr is pure integers.
    "mm_shot_detect" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("text"), length(col("text")).as("n"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("frame_idx")
      docs
        .select(col("doc_id"), col("text"), col("n"),
          explode(sequence(lit(0), (col("n") % 96 + 1) - 1, lit(10)))
            .as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          expr("ascii(substr(text, CAST(1 + (frame_idx * 7) % n AS INT), 1))")
            .as("feat"))
        .withColumn("pf", lag(col("feat"), 1).over(w))
        .select(col("doc_id"), col("frame_idx"), col("feat"),
          (col("pf").isNull ||
            abs(col("feat") - col("pf")) > ShotThreshold).as("is_boundary"))
    }),

    // Silence segmentation: gaps-and-islands over the audio frames —
    // consecutive frames whose energy (same stub PCM + Σv² as
    // mm_audio_energy) sits below [[SilenceThreshold]] merge into
    // (start, end, length) segments via the classic frame − row_number
    // island key. Both windows are partitioned by document; the segment
    // relation is bounded by frames/doc, never by corpus bytes.
    "mm_silence_runs" -> ((s, d) => {
      val en = Tables.load(s, d, "documents")
        .filter(length(col("text")) >= AudioFrame)
        .select(col("doc_id"),
          expr(s"transform(filter(split(text, ''), x -> x != ''), " +
            s"c -> CAST(ascii(c) - $AudioBias AS BIGINT))").as("v"))
        .select(col("doc_id"),
          explode(expr(s"sequence(0, size(v) div $AudioFrame - 1)")).as("frame"),
          col("v"))
        .select(col("doc_id"), col("frame").cast("long").as("frame"),
          expr(s"aggregate(slice(v, frame * $AudioFrame + 1, $AudioFrame), " +
            "CAST(0 AS BIGINT), (a, x) -> a + x * x)").as("energy"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("doc_id").orderBy("frame")
      en.filter(col("energy") < SilenceThreshold)
        .withColumn("grp", col("frame") - row_number().over(w))
        .groupBy("doc_id", "grp")
        .agg(min(col("frame")).as("start_frame"),
          max(col("frame")).as("end_frame"),
          count(lit(1)).as("n_frames"))
        .drop("grp")
    }),

    // MFCC-shaped cepstral features: per 64-sample frame, 16 sub-band
    // energies (filterbank stub: 4 adjacent samples per band) → log →
    // 4-coefficient DCT against the SAME shared integer cos table as
    // mm_phash_dct (one constant source for both engines — the EwmaTaps
    // discipline). Float determinism, measured the hard way: log
    // energies pin at round(,4) (a COARSE grid, so JVM-vs-libm ln ulp
    // differences can't straddle a boundary), each DCT term pins at
    // round(,4) into DECIMAL, the 16-term fold is exact, and the output
    // IS that exact 4dp sum cast to double — NO final re-round, because
    // re-rounding an exact ...xx50 decimal through doubles is where
    // Spark (shortest-repr HALF_UP) and DuckDB (binary-value nearest)
    // systematically disagree on ties. One narrow map per document
    // (array slices + folds), zero shuffle.
    "mm_audio_cepstrum" -> ((s, d) =>
      Tables.load(s, d, "documents")
        .filter(length(col("text")) >= AudioFrame)
        .select(col("doc_id"),
          expr(s"transform(filter(split(text, ''), x -> x != ''), " +
            s"c -> CAST(ascii(c) - $AudioBias AS BIGINT))").as("v"))
        .select(col("doc_id"),
          explode(expr(s"sequence(0, size(v) div $AudioFrame - 1)")).as("frame"),
          col("v"))
        .select(col("doc_id"), col("frame").cast("long").as("frame"),
          expr(s"slice(v, frame * $AudioFrame + 1, $AudioFrame)").as("w"))
        .withColumn("lb", expr(
          s"""transform(sequence(0, ${CepBands - 1}),
             |  j -> round(ln(CAST(aggregate(slice(w, j * ${AudioFrame / CepBands} + 1,
             |                                ${AudioFrame / CepBands}),
             |                     CAST(0 AS BIGINT), (a, x) -> a + x * x)
             |                + 1 AS DOUBLE)), 4))""".stripMargin))
        .select(Seq(col("doc_id"), col("frame")) ++
          (0 until CepCoefs).map { u =>
            expr(
              s"""CAST(aggregate(
                 |  zip_with(lb, slice($DctCosTabSql, ${u * 16} + 1, 16),
                 |    (a, b) -> CAST(round(a * b / 1.0E9, 4) AS DECIMAL(18,4))),
                 |  CAST(0 AS DECIMAL(28,4)),
                 |  (acc, t) -> CAST(acc + t AS DECIMAL(28,4))) AS DOUBLE)"""
                .stripMargin).as(s"c$u")
          }: _*)),

    // Audio-modality feature extraction: treat the opaque payload as a
    // PCM sample stream ("decoded" by the same documented stub
    // discipline as mm_decode — byte/char code minus a bias), frame it
    // into complete 64-sample windows, and emit the two classic frame
    // features — energy (Σ v²) and zero-crossing count — as exact
    // integers. The Spark shape is what a real librosa-style extractor
    // needs: ONE narrow map per document (array slice + two folds per
    // frame, no shuffle until nothing is left but (doc, frame, feature)
    // rows), with the frame width the batch dial. A real deployment
    // swaps the char-code sample for codec PCM at one site.
    // Pitch (fundamental-period) detection per audio frame by integer
    // autocorrelation — the classic F0 estimator (librosa/YIN's
    // zeroth-order ancestor): r(τ) = Σ v_i·v_{i+τ} over the frame for
    // τ ∈ [PitchMinLag, PitchMaxLag], period = argmax r (ties to the
    // SMALLEST lag — the fundamental, not a harmonic). Everything is
    // exact int64 (|v| ≤ ~60, so a frame's r(τ) ≤ ~2.3e5): the argmax is
    // one array_max over (r, -τ) structs, the whole query a single
    // narrow map per document — no shuffle, same scale shape as
    // mm_audio_energy. voiced = the peak is positive (an all-noise frame
    // anticorrelates at every lag).
    "mm_audio_pitch" -> ((s, d) =>
      Tables.load(s, d, "documents")
        .filter(length(col("text")) >= AudioFrame)
        .select(col("doc_id"),
          expr(s"transform(filter(split(text, ''), x -> x != ''), " +
            s"c -> CAST(ascii(c) - $AudioBias AS BIGINT))").as("v"))
        .select(col("doc_id"),
          explode(expr(s"sequence(0, size(v) div $AudioFrame - 1)")).as("frame"),
          col("v"))
        .select(col("doc_id"), col("frame").cast("long").as("frame"),
          expr(s"slice(v, frame * $AudioFrame + 1, $AudioFrame)").as("w"))
        .select(col("doc_id"), col("frame"),
          expr(s"""array_max(transform(sequence($PitchMinLag, $PitchMaxLag),
                  |  t -> struct(
                  |    aggregate(
                  |      zip_with(slice(w, 1, $AudioFrame - t),
                  |               slice(w, t + 1, $AudioFrame - t),
                  |               (a, b) -> a * b),
                  |      CAST(0 AS BIGINT), (acc, x) -> acc + x) AS r,
                  |    -t AS nt)))""".stripMargin).as("best"))
        .select(col("doc_id"), col("frame"),
          (-col("best.nt")).cast("long").as("period"),
          col("best.r").as("peak_r"),
          (col("best.r") > 0).as("voiced"))),

    "mm_audio_energy" -> ((s, d) =>
      Tables.load(s, d, "documents")
        .filter(length(col("text")) >= AudioFrame)
        .select(col("doc_id"),
          expr(s"transform(filter(split(text, ''), x -> x != ''), " +
            s"c -> CAST(ascii(c) - $AudioBias AS BIGINT))").as("v"))
        .select(col("doc_id"),
          explode(expr(s"sequence(0, size(v) div $AudioFrame - 1)")).as("frame"),
          col("v"))
        .select(col("doc_id"), col("frame"),
          expr(s"slice(v, frame * $AudioFrame + 1, $AudioFrame)").as("w"))
        .select(col("doc_id"), col("frame").cast("long").as("frame"),
          expr("aggregate(w, CAST(0 AS BIGINT), (a, x) -> a + x * x)").as("energy"),
          expr(s"""aggregate(
                  |  zip_with(slice(w, 1, ${AudioFrame - 1}), slice(w, 2, ${AudioFrame - 1}),
                  |    (a, b) -> CASE WHEN (a >= 0) != (b >= 0) THEN 1L ELSE 0L END),
                  |  CAST(0 AS BIGINT), (acc, x) -> acc + x)""".stripMargin).as("zcr")))
  )

  /** Audio-stub frame width (samples per analysis window). */
  val AudioFrame = 64

  /** Autocorrelation lag search range for mm_audio_pitch (min lag 2
    * rejects the trivial τ=1 self-similarity of any smooth signal; max
    * lag at half the frame keeps ≥32 product terms per estimate).
    */
  val PitchMinLag = 2
  val PitchMaxLag = AudioFrame / 2

  /** Shot-boundary feature-jump gate (char-code units in the stub). */
  val ShotThreshold = 24

  /** Cepstrum filterbank bands per frame (AudioFrame/CepBands samples
    * each) — sized so the DCT reuses the 16-point [[DctCosTab]] rows.
    */
  val CepBands = 16

  /** Cepstral coefficients kept (rows of [[DctCosTab]]). */
  val CepCoefs = 4

  /** Silence gate on the 64-sample frame energy (the synthetic corpus
    * ranges ~47k-70k; a real pipeline calibrates this dial per codec).
    */
  val SilenceThreshold = 55000L

  /** Audio-stub sample bias: char code minus this gives a signed sample
    * that actually crosses zero on the synthetic corpus (ASCII letters
    * sit at 97-122, space at 32).
    */
  val AudioBias = 96

  /** Shared signature CTE for the phash oracles: unnest/sum rebuild of
    * the Spark side's fold (independent formulation, identical bits),
    * over the given docs relation.
    */
  private def phashSigSql(docsCte: String): String =
    s"""WITH d0 AS ($docsCte),
       |bits AS (
       |  SELECT doc_id, i,
       |         ascii(substr(text,
       |           CAST(1 + (i * (length(text) - 1)) // ${PhashBits - 1} AS INT), 1)) AS code
       |  FROM d0, (SELECT unnest(generate_series(0, ${PhashBits - 1})) AS i)
       |), m AS (
       |  SELECT doc_id, sum(code) AS scode FROM bits GROUP BY 1
       |), sigs AS (
       |  SELECT b.doc_id,
       |         CAST(sum(CASE WHEN b.code * $PhashBits > m.scode
       |                       THEN (CAST(1 AS BIGINT) << (${PhashBits - 1} - b.i))
       |                       ELSE 0 END) AS BIGINT) AS phash
       |  FROM bits b JOIN m ON m.doc_id = b.doc_id
       |  GROUP BY 1
       |)""".stripMargin

  /** Standard training aspect buckets as (name, round(10⁴·w/h)). */
  val AspectBuckets: Seq[(String, Long)] = Seq(
    ("9:16", 5625L), ("2:3", 6667L), ("3:4", 7500L), ("1:1", 10000L),
    ("4:3", 13333L), ("3:2", 15000L), ("16:9", 17778L))

  private val AspectBucketsSql: String =
    AspectBuckets.map { case (n, r) => s"('$n', $r)" }.mkString(", ")

  /** Cross-modal eval query-set size (vec_id < this are the queries). */
  val CrossModalQueries = 32L

  /** Per-(id, dim) perturbation scale (quantized units) for the derived
    * modality-B encoder: 100 puts the true counterpart's rank genuinely
    * at risk (recall@5 ~ 0.8 at sf0.01) without burying it — the regime
    * where the metric discriminates between encoders.
    */
  val CrossModalNoise = 100L

  override val oracles: Map[String, String] = Map(

    "mm_crossmodal_recall" ->
      s"""WITH e AS (
         |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         |         CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000, 0) AS BIGINT) AS qa
         |  FROM embeddings
         |), eb AS (
         |  SELECT vec_id, i, qa,
         |         qa + ((vec_id * 37 + i) % 11 - 5) * $CrossModalNoise AS qb
         |  FROM e
         |), na AS (
         |  SELECT vec_id, CAST(sum(qa * qa) AS DOUBLE) / 1000000.0 AS na
         |  FROM eb GROUP BY 1
         |), nb AS (
         |  SELECT vec_id, CAST(sum(qb * qb) AS DOUBLE) / 1000000.0 AS nb
         |  FROM eb GROUP BY 1
         |), dots AS (
         |  SELECT q.vec_id AS q_id, c.vec_id AS n_id,
         |         CAST(sum(q.qa * c.qb) AS DOUBLE) / 1000000.0 AS dot
         |  FROM eb q JOIN eb c ON c.i = q.i
         |  WHERE q.vec_id < $CrossModalQueries
         |  GROUP BY 1, 2
         |), scored AS (
         |  SELECT d.q_id, d.n_id,
         |         round(d.dot / (sqrt(a.na) * sqrt(b2.nb)), 4) AS cos
         |  FROM dots d JOIN na a ON a.vec_id = d.q_id
         |  JOIN nb b2 ON b2.vec_id = d.n_id
         |), tr AS (
         |  SELECT q_id AS tq, cos AS tcos FROM scored WHERE q_id = n_id
         |), rk AS (
         |  SELECT s.q_id,
         |         1 + sum(CASE WHEN s.cos > t.tcos OR
         |               (s.cos = t.tcos AND s.n_id < s.q_id)
         |               THEN 1 ELSE 0 END) AS rank_true
         |  FROM scored s JOIN tr t ON t.tq = s.q_id GROUP BY 1
         |)
         |SELECT CAST(count(*) AS BIGINT) AS n_queries,
         |       round(CAST(sum(CASE WHEN rank_true <= 5 THEN 1 ELSE 0 END) AS DOUBLE) /
         |             CAST(count(*) AS DOUBLE), 6) AS recall_at_5,
         |       round(CAST(sum(CAST(round(1.0 / CAST(rank_true AS DOUBLE), 9)
         |                          AS DECIMAL(18,9))) AS DOUBLE) /
         |             CAST(count(*) AS DOUBLE), 6) AS mrr
         |FROM rk""".stripMargin,

    "mm_blur_detect" ->
      s"""WITH d AS (
         |  SELECT doc_id, text, length(text) AS n FROM documents
         |), c AS (
         |  SELECT doc_id,
         |         list_transform(generate_series(0, ${BlurSamples - 1}),
         |           i -> ascii(substr(text,
         |                  CAST(1 + (i * (n - 1)) // ${BlurSamples - 1} AS INT),
         |                  1))) AS codes
         |  FROM d
         |), l AS (
         |  SELECT doc_id,
         |         list_transform(generate_series(2, ${BlurSamples - 1}),
         |           i -> codes[i-1] - 2 * codes[i] + codes[i+1]) AS lap
         |  FROM c
         |), m AS (
         |  SELECT doc_id,
         |         CAST(list_aggregate(lap, 'sum') AS BIGINT) AS sl,
         |         CAST(list_aggregate(list_transform(lap, x -> x * x),
         |                             'sum') AS BIGINT) AS sq
         |  FROM l
         |)
         |SELECT doc_id, CAST(${BlurSamples - 2} AS BIGINT) AS n_samples,
         |       round(CAST(${BlurSamples - 2} * sq - sl * sl AS DOUBLE) /
         |             ${(BlurSamples - 2) * (BlurSamples - 2)}.0, 6) AS lap_var,
         |       CASE WHEN ${BlurSamples - 2} * sq - sl * sl <
         |                 ${BlurVarThreshold * (BlurSamples - 2) * (BlurSamples - 2)}
         |            THEN 1 ELSE 0 END AS is_blurry
         |FROM m""".stripMargin,

    "mm_aspect_bucket" ->
      s"""WITH dims AS (
         |  SELECT doc_id,
         |         CAST(1 + octet_length(encode(text)) % 64 AS INT) AS w,
         |         CAST(1 + (octet_length(encode(text)) // 64) % 64 AS INT) AS h
         |  FROM documents
         |), cand AS (
         |  SELECT d.doc_id, d.w, d.h, b.bucket, b.bar,
         |         abs(10000 * d.w - b.bar * d.h) AS dist
         |  FROM dims d CROSS JOIN (VALUES $AspectBucketsSql) b(bucket, bar)
         |), best AS (
         |  SELECT doc_id, w, h, bucket, bar FROM (
         |    SELECT doc_id, w, h, bucket, bar,
         |           row_number() OVER (PARTITION BY doc_id ORDER BY dist, bar) AS rn
         |    FROM cand) WHERE rn = 1
         |), scored AS (
         |  SELECT bucket, bar,
         |         round(1.0 - least(10000.0 * w / (bar * h),
         |                           bar * h / (10000.0 * w)), 9) AS waste
         |  FROM best
         |)
         |SELECT bucket, CAST(bar AS BIGINT) AS bar, count(*) AS n_images,
         |       round(CAST(sum(CAST(waste AS DECIMAL(20,9))) AS DOUBLE) / count(*), 6) AS avg_waste
         |FROM scored GROUP BY 1, 2""".stripMargin,
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

    "mm_phash" -> (phashSigSql("SELECT doc_id, text FROM documents") +
      """
        |SELECT doc_id, phash, CAST(bit_count(phash) AS INT) AS nbits
        |FROM sigs""".stripMargin),

    "mm_phash_dct" ->
      s"""WITH base AS (
        |  SELECT doc_id, length(text) AS n, text FROM documents
        |), sm AS (
        |  SELECT doc_id, n,
        |         list_transform(range(0, 256),
        |           p -> ascii(substr(text, CAST(1 + (p * (n - 1)) // 255 AS INT), 1))) AS m
        |  FROM base
        |), ct AS (SELECT $DctCosTabDuck AS tab),
        |rw AS (
        |  SELECT doc_id, n,
        |         list_transform(
        |           list_transform(range(0, 64), i ->
        |             CAST(list_sum(list_transform(range(0, 16),
        |               y -> CAST(m[(i // 4) * 16 + y + 1] AS BIGINT) *
        |                    CAST(tab[(i % 4) * 16 + y + 1] AS BIGINT))) AS BIGINT)),
        |           v -> CASE WHEN v >= 0 THEN v // 100000
        |                     ELSE -((-v) // 100000) END) AS r
        |  FROM sm, ct
        |), cf AS (
        |  SELECT doc_id, n,
        |         list_transform(range(0, 16), uv ->
        |           CAST(round(CAST(list_sum(list_transform(range(0, 16),
        |             x -> CAST(tab[(uv // 4) * 16 + x + 1] AS BIGINT) *
        |                  r[x * 4 + (uv % 4) + 1]))
        |             AS DOUBLE) / 10000000.0, 0) AS BIGINT)) AS coefs
        |  FROM rw, ct
        |), acr AS (
        |  SELECT doc_id, n, coefs[2:16] AS ac FROM cf
        |), st AS (
        |  SELECT doc_id, n, ac, CAST(list_sum(ac) AS BIGINT) AS stot FROM acr
        |)
        |SELECT doc_id, CAST(n AS BIGINT) AS n_chars,
        |       CAST(list_sum(list_transform(range(1, 16),
        |         i -> CASE WHEN ac[i] * 15 > stot
        |                   THEN CAST(round(pow(2, 15 - i), 0) AS BIGINT)
        |                   ELSE CAST(0 AS BIGINT) END)) AS BIGINT) AS dct_hash,
        |       CAST(bit_count(CAST(list_sum(list_transform(range(1, 16),
        |         i -> CASE WHEN ac[i] * 15 > stot
        |                   THEN CAST(round(pow(2, 15 - i), 0) AS BIGINT)
        |                   ELSE CAST(0 AS BIGINT) END)) AS BIGINT)) AS INT) AS nbits
        |FROM st""".stripMargin,

    // All-pairs formulation — deliberately different machinery from the
    // Spark side's 4-band LSH join (see the query comment): feasible at
    // oracle scale, and it proves the banding loses no true pair.
    "mm_phash_dedup" -> (phashSigSql(
        s"""SELECT doc_id, text FROM documents
           |     UNION ALL
           |     SELECT doc_id + $PhashTwinOffset, 'Z' || substr(text, 2)
           |     FROM documents""".stripMargin) +
      s"""
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
         |FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.phash, b.phash)) <= $PhashHamMax""".stripMargin),

    "mm_dedup_clusters" -> (phashSigSql(
        s"""SELECT doc_id, text FROM documents
           |     UNION ALL
           |     SELECT doc_id + $PhashTwinOffset, 'Z' || substr(text, 2)
           |     FROM documents""".stripMargin)
      .replaceFirst("^WITH ", "WITH RECURSIVE ") +
      s""",
         |pairs AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
         |  WHERE bit_count(xor(a.phash, b.phash)) <= $PhashHamMax
         |), edges AS (
         |  SELECT doc_a AS src, doc_b AS dst FROM pairs
         |  UNION ALL
         |  SELECT doc_b AS src, doc_a AS dst FROM pairs
         |), reach(node, r) AS (
         |  SELECT src, src FROM edges
         |  UNION
         |  SELECT e.src, reach.r FROM edges e JOIN reach ON reach.node = e.dst
         |), comp AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
         |SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
         |FROM d0 d LEFT JOIN comp c ON c.node = d.doc_id""".stripMargin),

    "mm_shot_detect" ->
      s"""WITH m AS (
         |  SELECT doc_id, text, length(text) AS n, length(text) % 96 + 1 AS nf
         |  FROM documents WHERE length(text) > 0
         |), fr AS (
         |  SELECT doc_id, text, n, CAST(unnest(range(0, nf, 10)) AS INT) AS frame_idx
         |  FROM m
         |), ft AS (
         |  SELECT doc_id, frame_idx,
         |         ascii(substr(text, CAST(1 + (frame_idx * 7) % n AS INT), 1)) AS feat
         |  FROM fr
         |)
         |SELECT doc_id, frame_idx, feat,
         |       pf IS NULL OR abs(feat - pf) > $ShotThreshold AS is_boundary
         |FROM (SELECT doc_id, frame_idx, feat,
         |             lag(feat) OVER (PARTITION BY doc_id ORDER BY frame_idx) AS pf
         |      FROM ft)""".stripMargin,

    "mm_audio_cepstrum" ->
      s"""WITH d0 AS (
         |  SELECT doc_id, text, length(text) // $AudioFrame AS nf
         |  FROM documents WHERE length(text) >= $AudioFrame
         |), fr AS (
         |  SELECT doc_id, text, unnest(generate_series(0, nf - 1)) AS frame FROM d0
         |), vals AS (
         |  SELECT doc_id, frame, j,
         |         CAST(ascii(substr(text, CAST(frame * $AudioFrame + j AS INT), 1))
         |              - $AudioBias AS BIGINT) AS v
         |  FROM fr, (SELECT unnest(generate_series(1, $AudioFrame)) AS j)
         |), bands AS (
         |  SELECT doc_id, frame, (j - 1) // ${AudioFrame / CepBands} AS band,
         |         CAST(sum(v * v) AS BIGINT) AS e
         |  FROM vals GROUP BY 1, 2, 3
         |), lb AS (
         |  SELECT doc_id, frame, band, round(ln(CAST(e + 1 AS DOUBLE)), 4) AS l
         |  FROM bands
         |), terms AS (
         |  SELECT doc_id, frame, u.u,
         |         CAST(round(l * ($DctCosTabDuck)
         |                          [CAST(u.u * $CepBands + band + 1 AS INT)]
         |                    / 1000000000.0, 4) AS DECIMAL(18,4)) AS t
         |  FROM lb, (SELECT unnest(generate_series(0, ${CepCoefs - 1})) AS u) u
         |)
         |SELECT doc_id, CAST(frame AS BIGINT) AS frame,
         |       CAST(sum(CASE WHEN u = 0 THEN t END) AS DOUBLE) AS c0,
         |       CAST(sum(CASE WHEN u = 1 THEN t END) AS DOUBLE) AS c1,
         |       CAST(sum(CASE WHEN u = 2 THEN t END) AS DOUBLE) AS c2,
         |       CAST(sum(CASE WHEN u = 3 THEN t END) AS DOUBLE) AS c3
         |FROM terms GROUP BY 1, 2""".stripMargin,

    "mm_silence_runs" ->
      s"""WITH d0 AS (
         |  SELECT doc_id, text, length(text) // $AudioFrame AS nf
         |  FROM documents WHERE length(text) >= $AudioFrame
         |), fr AS (
         |  SELECT doc_id, text, unnest(generate_series(0, nf - 1)) AS frame FROM d0
         |), vals AS (
         |  SELECT doc_id, frame,
         |         CAST(ascii(substr(text, CAST(frame * $AudioFrame + j AS INT), 1))
         |              - $AudioBias AS BIGINT) AS v
         |  FROM fr, (SELECT unnest(generate_series(1, $AudioFrame)) AS j)
         |), en AS (
         |  SELECT doc_id, CAST(frame AS BIGINT) AS frame,
         |         CAST(sum(v * v) AS BIGINT) AS energy
         |  FROM vals GROUP BY 1, 2
         |), sil AS (
         |  SELECT doc_id, frame,
         |         frame - row_number() OVER (PARTITION BY doc_id ORDER BY frame) AS grp
         |  FROM en WHERE energy < $SilenceThreshold
         |)
         |SELECT doc_id, min(frame) AS start_frame, max(frame) AS end_frame,
         |       count(*) AS n_frames
         |FROM sil GROUP BY doc_id, grp""".stripMargin,

    "mm_frame_sample" ->
      """WITH m AS (
        |  SELECT doc_id, CAST(octet_length(encode(text)) % 96 + 1 AS INT) AS n_frames
        |  FROM documents
        |)
        |SELECT doc_id, n_frames, CAST(unnest(range(0, n_frames, 10)) AS INT) AS frame_idx,
        |       round(CAST(unnest(range(0, n_frames, 10)) AS INT) / 24.0, 6) AS frame_ts
        |FROM m""".stripMargin,

    "mm_audio_pitch" ->
      s"""WITH d0 AS (
         |  SELECT doc_id, text, length(text) // $AudioFrame AS nf
         |  FROM documents WHERE length(text) >= $AudioFrame
         |), fr AS (
         |  SELECT doc_id, text, unnest(generate_series(0, nf - 1)) AS frame FROM d0
         |), vals AS (
         |  SELECT doc_id, frame, j,
         |         CAST(ascii(substr(text, CAST(frame * $AudioFrame + j AS INT), 1))
         |              - $AudioBias AS BIGINT) AS v
         |  FROM fr, (SELECT unnest(generate_series(1, $AudioFrame)) AS j)
         |), ac AS (
         |  SELECT a.doc_id, a.frame, t.tau,
         |         CAST(sum(a.v * b.v) AS BIGINT) AS r
         |  FROM (SELECT unnest(generate_series($PitchMinLag, $PitchMaxLag)) AS tau) t,
         |       vals a
         |  JOIN vals b ON b.doc_id = a.doc_id AND b.frame = a.frame
         |  WHERE b.j = a.j + t.tau
         |  GROUP BY 1, 2, 3
         |), best AS (
         |  SELECT doc_id, frame, tau, r,
         |         row_number() OVER (PARTITION BY doc_id, frame
         |                            ORDER BY r DESC, tau ASC) AS rn
         |  FROM ac
         |)
         |SELECT doc_id, CAST(frame AS BIGINT) AS frame,
         |       CAST(tau AS BIGINT) AS period, r AS peak_r, r > 0 AS voiced
         |FROM best WHERE rn = 1""".stripMargin,

    "mm_audio_energy" ->
      s"""WITH d0 AS (
         |  SELECT doc_id, text, length(text) // $AudioFrame AS nf
         |  FROM documents WHERE length(text) >= $AudioFrame
         |), fr AS (
         |  SELECT doc_id, text, unnest(generate_series(0, nf - 1)) AS frame FROM d0
         |), vals AS (
         |  SELECT doc_id, frame, j,
         |         CAST(ascii(substr(text, CAST(frame * $AudioFrame + j AS INT), 1))
         |              - $AudioBias AS BIGINT) AS v
         |  FROM fr, (SELECT unnest(generate_series(1, $AudioFrame)) AS j)
         |), en AS (
         |  SELECT doc_id, frame, CAST(sum(v * v) AS BIGINT) AS energy
         |  FROM vals GROUP BY 1, 2
         |), zc AS (
         |  SELECT a.doc_id, a.frame,
         |         CAST(sum(CASE WHEN (a.v >= 0) != (b.v >= 0) THEN 1 ELSE 0 END)
         |              AS BIGINT) AS zcr
         |  FROM vals a JOIN vals b
         |    ON b.doc_id = a.doc_id AND b.frame = a.frame AND b.j = a.j + 1
         |  GROUP BY 1, 2
         |)
         |SELECT en.doc_id, CAST(en.frame AS BIGINT) AS frame, en.energy, zc.zcr
         |FROM en JOIN zc ON zc.doc_id = en.doc_id AND zc.frame = en.frame""".stripMargin
  )
}
