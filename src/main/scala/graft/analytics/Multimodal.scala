package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, IntegerType, LongType}

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct alongside.
  *
  * The decode step itself (JPEG/WAV/MP4 parsing) would run native libraries
  * via `mapPartitions` over Arrow batches on a real cluster; those libs are
  * not in this container, so decode is STUBBED with a deterministic fake
  * (clearly marked below). Everything Spark-side — schema, batch shape,
  * partition-parallel structure, frame-sampling arithmetic — is real and
  * tested.
  */
object Multimodal {

  /** Attach an opaque binary payload column (here: the UTF-8 bytes of the
    * text column stand in for real media bytes) plus a declared modality.
    */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("payload", col(textCol).cast(BinaryType))
      .withColumn("modality",
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType)))

  /** ===== STUB ===== deterministic fake image decode.
    * A real implementation decodes the payload with an image library inside
    * `mapPartitions` (one decoder instance per partition, vectorized over
    * the batch). The fake derives plausible metadata purely from the byte
    * length so results are reproducible and oracle-checkable.
    */
  def decodeImageStub(payload: Column): Column = struct(
    (lit(16) + pmod(length(payload), lit(64))).cast(IntegerType).as("width"),
    (lit(16) + pmod(length(payload) * 7, lit(64))).cast(IntegerType).as("height"),
    lit(3).cast(IntegerType).as("channels"))

  /** ===== STUB ===== deterministic fake audio decode (sample count ∝ bytes). */
  def decodeAudioStub(payload: Column): Column = struct(
    lit(16000).cast(IntegerType).as("sample_rate"),
    (length(payload) * lit(100L)).cast(LongType).as("n_samples"),
    lit(1).cast(IntegerType).as("channels"))

  /** Chunking plan for an audio payload: fixed `chunkSeconds` windows over
    * the decoded sample count — the segmentation arithmetic a real splitter
    * (e.g. for ASR batch inference) would follow. Integer ceil-division;
    * the last chunk carries the remainder (a full `chunk` when the length
    * divides exactly). Pure per-row arithmetic, shuffle-free.
    */
  def audioChunkPlan(meta: Column, chunkSeconds: Int = 1): Column = {
    val chunk = meta.getField("sample_rate").cast(LongType) * lit(chunkSeconds.toLong)
    val n = meta.getField("n_samples")
    // exact for any realistic sample count (< 2^53)
    val nChunks = floor((n + chunk - lit(1L)) / chunk).cast(LongType)
    // zero-length audio is 0 chunks with NO remainder — the naive formula
    // would report a phantom full last chunk
    struct(
      nChunks.as("n_chunks"),
      when(n === 0, lit(0L))
        .otherwise(n - (nChunks - lit(1L)) * chunk).as("last_chunk_samples"))
  }

  /** Frame-sampling plan for a video payload: n evenly spaced byte offsets —
    * this arithmetic is the real scheduling logic a decoder would follow.
    */
  def frameSampleOffsets(payload: Column, n: Int): Column =
    transform(sequence(lit(0), lit(n - 1)),
      i => ((i.cast(LongType) * length(payload).cast(LongType)) / lit(n.toLong)).cast(LongType))

  /** "Resize": the stub recomputes metadata for a target box, preserving the
    * fake aspect ratio via integer arithmetic (deterministic).
    */
  def resizeStub(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width").cast(LongType)
    val h = meta.getField("height").cast(LongType)
    val longest = greatest(w, h)
    struct(
      ((w * maxSide) / longest).cast(IntegerType).as("width"),
      ((h * maxSide) / longest).cast(IntegerType).as("height"),
      meta.getField("channels").as("channels"))
  }

  /** Full multimodal feature-extraction pass: payload → per-modality typed
    * metadata + a frame-sampling plan for videos. Pure projection —
    * partition-parallel, no shuffle.
    */
  def extractFeatures(docs: DataFrame): DataFrame = {
    val withBin = withPayload(docs)
    withBin.select(
      col("doc_id"), col("modality"),
      length(col("payload")).cast(LongType).as("n_bytes"),
      when(col("modality") === "image", decodeImageStub(col("payload"))).as("image_meta"),
      when(col("modality") === "audio", decodeAudioStub(col("payload"))).as("audio_meta"),
      when(col("modality") === "video", frameSampleOffsets(col("payload"), 4)).as("frame_offsets"))
  }
}
