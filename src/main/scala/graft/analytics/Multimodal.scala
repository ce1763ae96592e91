package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, DoubleType, IntegerType, LongType, StringType}

/** Multimodal-column plumbing: image/audio/video payloads ride as opaque
  * `binary` columns with a typed metadata struct alongside.
  *
  * The payload fixtures carry REAL container headers — a PNG signature +
  * IHDR chunk for images, a canonical 44-byte WAV RIFF header for audio —
  * synthesized from the document row, with the UTF-8 text bytes standing in
  * for the compressed body. Decode then actually PARSES those bytes
  * (signature check, big-endian IHDR fields, little-endian RIFF fields)
  * with codegen'd binary/hex expressions — no UDF, no image library. What
  * stays out of scope in this container: pixel/sample decode (zlib/codec
  * work), which on a real cluster runs native libs via `mapPartitions`
  * over Arrow batches; header parse, schema, batch shape, and the
  * chunking/frame-sampling arithmetic are the real thing.
  *
  * Layout references (public specs):
  *  - PNG: 8-byte signature, then IHDR chunk = len(4,BE) "IHDR" width(4,BE)
  *    height(4,BE) bitDepth(1) colorType(1) compression(1) filter(1)
  *    interlace(1) crc(4). The fixture zeroes the CRC — like most
  *    metadata-only probes, the parser reads fields and skips CRC checks.
  *  - WAV: "RIFF" size(4,LE) "WAVE" "fmt " 16(4,LE) fmt(2,LE) channels(2,LE)
  *    sampleRate(4,LE) byteRate(4,LE) blockAlign(2,LE) bits(2,LE) "data"
  *    dataSize(4,LE). The fixture's declared dataSize describes the
  *    (absent) sample body — header-only probing, the ffprobe access
  *    pattern.
  */
object Multimodal {

  /** value → fixed-width big-endian hex (PNG integer byte order). A value
    * wider than the declared field would silently lpad-TRUNCATE to the
    * high-order digits — a corrupt container header — so out-of-range
    * values fail loudly instead (in-repo callers are bounded: pmod 64
    * dims, n*200 sizes; the guard is for future callers).
    */
  private def beHex(v: Column, nBytes: Int): Column = {
    val lv = v.cast(LongType)
    val guarded =
      if (nBytes >= 8) lv
      else when(lv >= 0 && lv < (1L << (8 * nBytes)), lv)
        .otherwise(raise_error(concat(
          lit(s"multimodal header field out of range for $nBytes bytes: "),
          lv.cast("string"))))
    lpad(hex(guarded), nBytes * 2, "0")
  }

  /** value → fixed-width little-endian hex (RIFF byte order): big-endian
    * hex, byte pairs reversed.
    */
  private def leHex(v: Column, nBytes: Int): Column = {
    val be = beHex(v, nBytes)
    concat((nBytes to 1 by -1).map(i => substring(be, (i - 1) * 2 + 1, 2)): _*)
  }

  /** Parse an unsigned little-endian integer out of payload bytes
    * [off, off+nBytes): hex the slice (file order = LSB first), reverse the
    * byte pairs into big-endian hex, radix-convert. All codegen'd builtins.
    */
  private def leUint(payload: Column, off: Int, nBytes: Int): Column = {
    val h = hex(substring(payload, off, nBytes))
    val be = concat((nBytes to 1 by -1).map(i => substring(h, (i - 1) * 2 + 1, 2)): _*)
    conv(be, 16, 10).cast(LongType)
  }

  /** Parse an unsigned big-endian integer at byte offset `off` (1-based). */
  private def beUint(payload: Column, off: Int, nBytes: Int): Column =
    conv(hex(substring(payload, off, nBytes)), 16, 10).cast(LongType)

  private val PngSigHex = "89504E470D0A1A0A"

  /** Valid PNG prefix: signature + IHDR chunk (zeroed CRC) for an 8-bit
    * truecolor (colorType 2) image of the given dimensions.
    */
  def pngHeader(width: Column, height: Column): Column =
    unhex(concat(
      lit(PngSigHex),        // signature
      lit("0000000D49484452"), // IHDR length=13, type
      beHex(width, 4), beHex(height, 4),
      lit("0802000000"),     // bitDepth=8 colorType=2 compress/filter/interlace=0
      lit("00000000")))      // CRC (zeroed fixture; parsers read past it)

  /** Chunk-structured PNG with an ANCILLARY tEXt metadata chunk between
    * IHDR and the image data — the EXIF-analog a privacy scrub must
    * remove: sig + IHDR + tEXt("Author\0" + value) + IDAT(body) + IEND,
    * every chunk in the spec's len(4,BE) type(4) data crc(4, zeroed)
    * layout so a parser must WALK length fields (nothing ancillary sits
    * at a fixed offset in real files once chunk counts vary).
    */
  def taggedPng(width: Column, height: Column, metaValue: Column,
      body: Column): Column = {
    val meta = concat(lit("Author").cast(BinaryType), unhex(lit("00")),
      metaValue.cast(BinaryType))
    concat(
      pngHeader(width, height),
      unhex(beHex(length(meta).cast(LongType), 4)), lit("tEXt").cast(BinaryType),
      meta, unhex(lit("00000000")),
      unhex(beHex(length(body).cast(LongType), 4)), lit("IDAT").cast(BinaryType),
      body, unhex(lit("00000000")),
      unhex(lit("0000000049454E4400000000"))) // IEND
  }

  /** m12's fixture: image-modality docs carry [[taggedPng]] payloads with
    * a doc-derived Author value (length varies with doc_id so no field
    * is a constant-on-a-class); other modalities ride as in
    * [[withPayload]].
    */
  def withPayloadTagged(docs: DataFrame, textCol: String = "text"): DataFrame =
    withModalPayload(docs, textCol)(
      (body, n) =>
        taggedPng(lit(16) + pmod(n, lit(64)), lit(16) + pmod(n * 7, lit(64)),
          // doc_id DIV 3 varies WITHIN the image class (doc_id%3 == 0
          // would be a constant-on-a-residue-class — the m09 trap)
          concat(lit("user"), pmod(col("doc_id"), lit(7)).cast(StringType),
            repeat(lit("x"),
              pmod(call_function("div", col("doc_id"), lit(3L)), lit(3L))
                .cast(IntegerType))),
          body),
      (body, n) => concat(
        wavHeader(lit(16000), lit(1), lit(16), n.cast(LongType) * lit(100L)), body))

  /** Metadata scrub (m12): drop the LEADING ancillary tEXt chunk after
    * the 33-byte signature+IHDR prefix — the privacy strip a real
    * pipeline runs before payloads enter a training corpus
    * (location/author EXIF is the classic leak). Returns the parsed
    * evidence alongside the strip: original/stripped lengths, the
    * metadata KEY and value length recovered from the bytes (the
    * null-separator split the spec defines; the value length DERIVES
    * from the parsed key, so any keyword works), the first chunk type of
    * the STRIPPED stream, and the `clean` verdict. `clean` is
    * deliberately CONSERVATIVE: it certifies only a stream whose
    * post-strip structure is fully accounted for — first chunk the
    * critical IDAT and the chunk after it IEND (a two-chunk re-walk of
    * the stripped bytes). Residual metadata parked AFTER the image data,
    * a multi-IDAT stream, or an unchunked legacy body all read
    * clean=false — an honest refusal to certify what the bounded walk
    * did not cover, never a false pass. Pure per-row codegen'd byte
    * arithmetic — zero UDFs, no shuffle.
    */
  def stripAncillaryMeta(payload: Column): Column = {
    val c1len = beUint(payload, 34, 4)
    val c1type = substring(payload, 38, 4).cast(StringType)
    val isMeta = c1type === "tEXt"
    // chunk extent = 4 len + 4 type + data + 4 crc
    val stripped = when(isMeta,
      concat(substring(payload, 1, 33),
        payload.substr((lit(34L) + lit(12L) + c1len).cast(IntegerType),
          lit(Int.MaxValue))))
      .otherwise(payload)
    val data = payload.substr(lit(42), c1len.cast(IntegerType))
    val key = when(isMeta,
      element_at(split(data.cast(StringType), "\u0000", 2), 1))
    // re-walk the STRIPPED stream: its first chunk, and the chunk after
    val afterLen = beUint(stripped, 34, 4)
    val after = substring(stripped, 38, 4).cast(StringType)
    val after2 = stripped.substr(
      (lit(34L) + lit(12L) + afterLen + lit(4L)).cast(IntegerType), lit(4))
      .cast(StringType)
    struct(
      length(payload).cast(LongType).as("orig_len"),
      length(stripped).cast(LongType).as("stripped_len"),
      key.as("meta_key"),
      when(isMeta, c1len - (length(key) + lit(1L))).as("meta_vlen"),
      after.as("first_chunk_after"),
      (when(isMeta, length(stripped) === length(payload) - lit(12L) - c1len)
        .otherwise(lit(true)) &&
        after === "IDAT" && after2 === "IEND").as("clean"))
  }

  /** Canonical 44-byte WAV/RIFF PCM header. `nSamples` is per channel;
    * dataSize = nSamples * channels * bits/8.
    */
  def wavHeader(sampleRate: Column, channels: Column, bitsPerSample: Column,
                nSamples: Column): Column = {
    val blockAlign = (channels.cast(LongType) * bitsPerSample.cast(LongType) / lit(8L)).cast(LongType)
    val dataSize = nSamples.cast(LongType) * blockAlign
    unhex(concat(
      lit("52494646"), leHex(dataSize + lit(36L), 4), // "RIFF" chunkSize
      lit("57415645666D742010000000"),                // "WAVE" "fmt " subchunk1=16
      lit("0100"), leHex(channels, 2),                // PCM format tag, channels
      leHex(sampleRate, 4), leHex(sampleRate.cast(LongType) * blockAlign, 4),
      leHex(blockAlign, 2), leHex(bitsPerSample, 2),
      lit("64617461"), leHex(dataSize, 4)))           // "data" dataSize
  }

  /** Valid JPEG/JFIF prefix: SOI, an 18-byte APP0 (JFIF 1.1, no
    * thumbnail), then a baseline SOF0 for an 8-bit 3-component (YCbCr
    * 4:2:0) image of the given dimensions — 39 bytes total, the minimal
    * segment chain a dimension probe must WALK (the SOF is not at a fixed
    * offset in real files; [[decodeJpeg]] skips APP0 via its length field
    * exactly like a real parser).
    *
    * Layout reference (public specs — ITU T.81 §B.2, JFIF 1.02): segments
    * are marker(2) len(2,BE incl. itself) payload; SOF0 payload =
    * precision(1) height(2,BE) width(2,BE) nComponents(1) + 3 bytes per
    * component.
    */
  def jpegHeader(width: Column, height: Column): Column =
    unhex(concat(
      lit("FFD8"),                     // SOI
      lit("FFE000104A46494600010100000100010000"), // APP0 len=16 JFIF 1.1
      lit("FFC0001108"),               // SOF0 len=17 precision=8
      beHex(height, 2), beHex(width, 2),
      lit("03012200021101031101")))    // 3 components, 4:2:0 sampling

  /** MPEG-1 Layer III frame header (4 bytes): sync 0xFFE + version 11 +
    * layer 01 + no-CRC = 0xFFFB, then bitrateIdx(4 bits) srIdx(2)
    * padding(1) private(1), then an all-zero mode byte. The body that
    * follows stands in for the frame payload (codec work is the
    * documented stub; the header arithmetic is the real thing).
    */
  def mp3Header(bitrateIdx: Column, srIdx: Column, padding: Column): Column =
    unhex(concat(lit("FFFB"),
      beHex(bitrateIdx.cast(LongType) * 16 + srIdx.cast(LongType) * 4 +
        padding.cast(LongType) * 2, 1),
      lit("00")))

  /** Attach a binary payload column with a REAL container header per
    * modality (PNG for images, WAV for audio; video rides header-less as a
    * raw stream stand-in), body = the UTF-8 text bytes. Metadata encoded in
    * the headers derives deterministically from the body length so results
    * are reproducible and oracle-checkable; decode below recovers it from
    * the BYTES alone.
    */
  def withPayload(docs: DataFrame, textCol: String = "text"): DataFrame =
    withModalPayload(docs, textCol)(
      (body, n) => concat(pngHeader(lit(16) + pmod(n, lit(64)),
        lit(16) + pmod(n * 7, lit(64))), body),
      (body, n) => concat(
        wavHeader(lit(16000), lit(1), lit(16), n.cast(LongType) * lit(100L)), body))

  /** Shared fixture scaffolding of the three payload generators: the
    * modality class and the video fallthrough are defined ONCE; each
    * fixture injects only its image/audio payload builders (body, n) —
    * a modality-derivation change now has one home, not three.
    */
  private def withModalPayload(docs: DataFrame, textCol: String)(
      image: (Column, Column) => Column,
      audio: (Column, Column) => Column): DataFrame = {
    val body = col(textCol).cast(BinaryType)
    val n = length(body)
    val modality = element_at(array(lit("image"), lit("audio"), lit("video")),
      (pmod(col("doc_id"), lit(3)) + 1).cast(IntegerType))
    docs
      .withColumn("modality", modality)
      .withColumn("payload",
        when(modality === "image", image(body, n))
        .when(modality === "audio", audio(body, n))
        .otherwise(body))
  }

  /** The mixed-container sibling of [[withPayload]] (m09's fixture):
    * every other image is JPEG instead of PNG and every other audio
    * payload is MP3 instead of WAV — same deterministic metadata
    * derivations, so the oracle twin computes every decoded field
    * arithmetically while the Spark side must PARSE its way there.
    * Generator choices avoid constants-on-a-residue-class: modality is
    * doc_id mod 3, so any `doc_id mod 3k` split varies within a modality
    * while `pmod(doc_id, 3)` would not — the MP3 sample-rate index uses
    * doc_id DIV 3 for exactly that reason.
    */
  def withPayloadMixed(docs: DataFrame, textCol: String = "text"): DataFrame =
    withModalPayload(docs, textCol)(
      (body, n) => when(pmod(col("doc_id"), lit(6)) === 0,
          concat(jpegHeader(lit(16) + pmod(n, lit(64)),
            lit(16) + pmod(n * 7, lit(64))), body))
        .otherwise(concat(pngHeader(lit(16) + pmod(n, lit(64)),
          lit(16) + pmod(n * 7, lit(64))), body)),
      (body, n) => when(pmod(col("doc_id"), lit(6)) === 1,
          concat(mp3Header(lit(1) + pmod(col("doc_id"), lit(14)),
            pmod(floor(col("doc_id") / lit(3)).cast(LongType), lit(3)),
            pmod(col("doc_id"), lit(2))), body))
        .otherwise(concat(
          wavHeader(lit(16000), lit(1), lit(16), n.cast(LongType) * lit(100L)), body)))

  /** Image decode: verify the PNG signature + IHDR chunk type, then parse
    * width/height (big-endian) and map the spec's colorType byte to a
    * channel count. Null struct on a non-PNG payload — real parser
    * behavior, not a crash.
    */
  def decodeImage(payload: Column): Column = {
    val isPng = hex(substring(payload, 1, 8)) === PngSigHex &&
      hex(substring(payload, 13, 4)) === "49484452" // "IHDR"
    val colorType = beUint(payload, 26, 1)
    when(isPng, struct(
      beUint(payload, 17, 4).cast(IntegerType).as("width"),
      beUint(payload, 21, 4).cast(IntegerType).as("height"),
      // PNG spec: 0=grey, 2=RGB, 4=grey+alpha, 6=RGBA
      when(colorType === 0, 1).when(colorType === 2, 3)
        .when(colorType === 4, 2).when(colorType === 6, 4)
        .cast(IntegerType).as("channels")))
  }

  /** JPEG dimension decode — a REAL segment walk, not a fixed-offset
    * peek: verify SOI, then hop marker→marker via each segment's
    * big-endian length field (the JFIF APP0, and any other APPn/COM a
    * writer inserts, sit between SOI and the frame header at arbitrary
    * offsets) until an SOF0–SOF3 baseline/progressive frame marker;
    * parse height/width (big-endian) and the component count from its
    * payload. The walk is a bounded `aggregate` fold (`maxSegs` hops —
    * real dimension probes bound this too); a truncated chain, a
    * non-marker byte, or no SOF within the bound yields a null struct.
    * All codegen'd hex/substring arithmetic, per the family contract.
    */
  def decodeJpeg(payload: Column, maxSegs: Int = 6): Column = {
    val isJpeg = hex(substring(payload, 1, 2)) === "FFD8"
    def st(off: Column, w: Column, h: Column, c: Column): Column =
      struct(off.as("off"), w.as("w"), h.as("h"), c.as("c"))
    val walked = aggregate(
      sequence(lit(1), lit(maxSegs)),
      st(lit(3L), lit(-1L), lit(-1L), lit(-1L)),
      (acc, _) => {
        val off = acc.getField("off")
        val marker = hex(payload.substr(off, lit(2)))
        val segLen = conv(hex(payload.substr(off + 2, lit(2))), 16, 10)
          .cast(LongType)
        val stop = st(lit(-1L), acc.getField("w"), acc.getField("h"),
          acc.getField("c"))
        when(off < 0, acc)
          .when(length(marker) < 4 || substring(marker, 1, 2) =!= "FF", stop)
          .when(marker.isin("FFC0", "FFC1", "FFC2", "FFC3"),
            st(lit(-1L),
              conv(hex(payload.substr(off + 7, lit(2))), 16, 10).cast(LongType),
              conv(hex(payload.substr(off + 5, lit(2))), 16, 10).cast(LongType),
              conv(hex(payload.substr(off + 9, lit(1))), 16, 10).cast(LongType)))
          .otherwise(st(off + 2 + segLen, acc.getField("w"),
            acc.getField("h"), acc.getField("c")))
      })
    when(isJpeg && walked.getField("w") >= 0, struct(
      walked.getField("w").cast(IntegerType).as("width"),
      walked.getField("h").cast(IntegerType).as("height"),
      walked.getField("c").cast(IntegerType).as("channels")))
  }

  /** MPEG-1 Layer III bitrate table (kbps), index 1..14 (0 = free, 15 =
    * invalid — both rejected).
    */
  private val Mp3Bitrates =
    Seq(32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)

  /** MP3 frame-header decode: verify the 11-bit frame sync, require
    * MPEG-1 Layer III, then map the bitrate/sample-rate index fields
    * through the spec tables and derive the frame byte length
    * (⌊144·bitrate/sampleRate⌋ + padding — the ISO 11172-3 formula) and
    * the whole-frame count the payload can hold. Null struct when the
    * sync is absent, the version/layer differ, or an index is reserved —
    * real parser behavior.
    */
  def decodeMp3(payload: Column): Column = {
    val b12 = beUint(payload, 1, 2)
    val b3 = beUint(payload, 3, 1)
    val hasSync = length(payload) >= 4 &&
      b12.bitwiseAND(lit(0xFFE0L)) === lit(0xFFE0L)
    // version bits 4-3 of byte 2 must be 11 (MPEG-1), layer bits 2-1
    // must be 01 (Layer III)
    val isV1L3 = b12.bitwiseAND(lit(0x1EL)) === lit(0x1AL)
    val brIdx = shiftright(b3, 4).bitwiseAND(lit(0xFL))
    val srIdx = shiftright(b3, 2).bitwiseAND(lit(0x3L))
    val pad = shiftright(b3, 1).bitwiseAND(lit(0x1L))
    val bitrate = element_at(
      typedLit(Mp3Bitrates.map(_.toLong)), brIdx.cast(IntegerType))
    val sampleRate = element_at(
      typedLit(Seq(44100L, 48000L, 32000L)), (srIdx + 1).cast(IntegerType))
    val frameBytes = floor(lit(144000L) * bitrate / sampleRate)
      .cast(LongType) + pad
    when(hasSync && isV1L3 && brIdx.between(1, 14) && srIdx <= 2, struct(
      bitrate.cast(IntegerType).as("bitrate_kbps"), // brIdx 1..14 is 1-based into the table
      sampleRate.cast(IntegerType).as("sample_rate"),
      frameBytes.as("frame_bytes"),
      floor(length(payload).cast(LongType) / frameBytes)
        .cast(LongType).as("n_frames")))
  }

  /** Audio decode: verify RIFF/WAVE/fmt magics, then parse the
    * little-endian header fields; n_samples recovers from dataSize /
    * blockAlign. Null struct on a non-WAV payload.
    */
  def decodeAudio(payload: Column): Column = {
    val isWav = hex(substring(payload, 1, 4)) === "52494646" &&
      hex(substring(payload, 9, 8)) === "57415645666D7420" // "WAVEfmt "
    val channels = leUint(payload, 23, 2)
    val bits = leUint(payload, 35, 2)
    when(isWav, struct(
      leUint(payload, 25, 4).cast(IntegerType).as("sample_rate"),
      floor(leUint(payload, 41, 4) * lit(8L) / (channels * bits))
        .cast(LongType).as("n_samples"),
      channels.cast(IntegerType).as("channels")))
  }

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

  /** Shot-boundary detection over the video stream stand-in — m04's frame
    * schedule taken to the CONTENT level. At each of `frames` evenly
    * spaced character offsets of the decoded payload, a fixed
    * `window`-char sample reduces to a 4-class character histogram
    * ([a-m] / [n-z] / digit / other — the luminance-histogram analog a
    * real cut detector bins per frame), and consecutive frames mark a
    * boundary when their L1 histogram distance crosses `threshold` (the
    * pairwise histogram-difference family of Zhang/Kankanhalli/Smoliar
    * 1993 — the classic hard-cut detector). Frame PIXEL decode is the
    * documented container stub; the sampling schedule, histogram
    * arithmetic, and the delta test are the real Spark-side work, all
    * codegen'd string/integer expressions. Scale shape: one map-only
    * pass fans each video row to `frames` rows, and the lag window is
    * partitioned per doc_id (bounded `frames`-row partitions) — no
    * global sort, no shuffle beyond the per-doc window and final order.
    */
  def shotBoundaries(docs: DataFrame, frames: Int = 8, window: Int = 64,
      threshold: Int = 14): DataFrame = {
    // decode step: the video payload IS the raw byte stream (no
    // container), so the stand-in "frame read" is a UTF-8 decode + char
    // slice of the payload bytes — honest plumbing the twin replays from
    // the text column it was synthesized from
    // lowercase the WHOLE stream before slicing (not per window): Unicode
    // lowercasing can change string length, so lower∘substr ≠ substr∘lower
    // in general — the twin slices the pre-lowered stream, so must we
    val vids = withPayload(docs).where(col("modality") === "video")
      .select(col("doc_id"), lower(col("payload").cast(StringType)).as("s"))
    val fr = vids
      .select(col("doc_id"), length(col("s")).cast(LongType).as("len"), col("s"),
        explode(sequence(lit(0L), lit(frames - 1L))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        // INTEGRAL division (the twin's `//`): Column./ is double division,
        // which is only truncation-safe when `frames` is a power of two —
        // `div` (IntegralDivide) is exact for any frame count
        col("s").substr(
          (call_function("div", col("frame_idx") * col("len"), lit(frames.toLong))
            + lit(1L)).cast(IntegerType),
          lit(window)).as("w"))
    def cls(re: String): Column =
      (length(col("w")) - length(regexp_replace(col("w"), re, ""))).cast(LongType)
    val h = fr
      .select(col("doc_id"), col("frame_idx"),
        cls("[a-m]").as("c_am"), cls("[n-z]").as("c_nz"), cls("[0-9]").as("c_dg"),
        length(col("w")).cast(LongType).as("wl"))
      .select(col("doc_id"), col("frame_idx"), col("c_am"), col("c_nz"), col("c_dg"),
        (col("wl") - col("c_am") - col("c_nz") - col("c_dg")).as("c_ot"))
    val byFrame = Window.partitionBy(col("doc_id")).orderBy(col("frame_idx"))
    def lagAbs(c: String): Column = abs(col(c) - lag(col(c), 1).over(byFrame))
    h.select(col("doc_id"), col("frame_idx"),
        col("c_am"), col("c_nz"), col("c_dg"), col("c_ot"),
        (lagAbs("c_am") + lagAbs("c_nz") + lagAbs("c_dg") + lagAbs("c_ot")).as("delta"))
      // first frame has no predecessor: delta and the verdict stay null
      .withColumn("is_boundary",
        when(col("delta").isNotNull, col("delta") >= threshold))
  }

  /** Resize planning: recompute metadata for a target box, preserving the
    * parsed aspect ratio via integer arithmetic (deterministic).
    */
  def resizePlan(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width").cast(LongType)
    val h = meta.getField("height").cast(LongType)
    val longest = greatest(w, h)
    struct(
      ((w * maxSide) / longest).cast(IntegerType).as("width"),
      ((h * maxSide) / longest).cast(IntegerType).as("height"),
      meta.getField("channels").as("channels"))
  }

  /** Patch-grid plan for an image: the ViT-style tiling schedule — cover
    * the decoded width×height with a `patch`×`patch` grid, edge tiles
    * clipped to the image bounds. Returns the full tile array (row-major:
    * py, px, pixel origin, clipped extent); the caller explodes it into
    * the per-tile fan-out a distributed patch embedder consumes (m04's
    * frame-offset idiom, two dimensions up). Pure per-row arithmetic from
    * header metadata — the decode of tile PIXELS is exactly the stub the
    * container cannot host; the plan is the real Spark-side work.
    */
  def patchGridPlan(meta: Column, patch: Int): Column = {
    val p = lit(patch.toLong)
    val w = meta.getField("width").cast(LongType)
    val h = meta.getField("height").cast(LongType)
    val nx = floor((w + p - lit(1L)) / p).cast(LongType)
    val ny = floor((h + p - lit(1L)) / p).cast(LongType)
    flatten(transform(sequence(lit(0L), ny - 1), py =>
      transform(sequence(lit(0L), nx - 1), px =>
        struct(py.as("py"), px.as("px"),
          (px * p).as("x0"), (py * p).as("y0"),
          least(p, w - px * p).as("pw"),
          least(p, h - py * p).as("ph")))))
  }

  /** Full multimodal feature-extraction pass: payload → per-modality typed
    * metadata (parsed from the container headers) + a frame-sampling plan
    * for videos. Pure projection — partition-parallel, no shuffle.
    */
  def extractFeatures(docs: DataFrame): DataFrame = {
    val withBin = withPayload(docs)
    withBin.select(
      col("doc_id"), col("modality"),
      length(col("payload")).cast(LongType).as("n_bytes"),
      when(col("modality") === "image", decodeImage(col("payload"))).as("image_meta"),
      when(col("modality") === "audio", decodeAudio(col("payload"))).as("audio_meta"),
      when(col("modality") === "video", frameSampleOffsets(col("payload"), 4)).as("frame_offsets"))
  }

  /** Average-hash (aHash) perceptual fingerprint over the image BODY
    * bytes — the byte-level image near-dup signal next to the embedding-
    * cosine one (d06): 64 body bytes stand in for the 8×8 downsampled
    * grayscale grid (pixel decode is the documented stub; the hash
    * pipeline downstream of decode is the real thing), bit i = 1 iff
    * byte_i·64 > Σbytes (the strict integer form of "above the mean" —
    * NO division, so there is no boundary to disagree on cross-engine).
    * Short bodies zero-pad; the 64 bits fold into four 16-bit band
    * values, which are simultaneously the fingerprint (b0..b3) and the
    * Hamming-LSH blocking keys. Pigeonhole: at Hamming distance ≤ 3,
    * four bands cannot all contain a differing bit, so a shared band is
    * GUARANTEED; for d in 4..6 the differing bits can straddle all four
    * bands and band-collision becomes a recall heuristic — the standard
    * Hamming-LSH trade (more bands buy a higher guaranteed radius at
    * more candidate volume).
    *
    * Everything is a per-row projection (hex + integer folds) until the
    * band-keyed candidate join — counts-not-pairs, the d04 shape.
    */
  def aHashed(docs: DataFrame, bodyOffset: Int = 34): DataFrame = {
    val h = hex(substring(col("payload"), bodyOffset, 64))
    val bytes = transform(sequence(lit(1), lit(64)), i =>
      when(length(col("__h")) >= i * 2,
        conv(col("__h").substr(i * 2 - 1, lit(2)), 16, 10).cast(LongType))
        .otherwise(lit(0L)))
    val bits = transform(col("__bs"),
      b => when(b * 64 > col("__sum"), lit(1L)).otherwise(lit(0L)))
    def band(k: Int): Column =
      aggregate(slice(col("__bits"), k * 16 + 1, 16), lit(0L),
        (a, b) => a * 2 + b)
    withPayload(docs)
      .where(col("modality") === "image")
      .select(col("doc_id"), h.as("__h"))
      .select(col("doc_id"), bytes.as("__bs"))
      .select(col("doc_id"), col("__bs"),
        aggregate(col("__bs"), lit(0L), (a, b) => a + b).as("__sum"))
      .select(col("doc_id"), bits.as("__bits"))
      .select(col("doc_id"), band(0).as("b0"), band(1).as("b1"),
        band(2).as("b2"), band(3).as("b3"))
  }

  /** Cross-modal retrieval plumbing — the CLIP-style image↔caption pair
    * mining step: both modalities embed into ONE shared `dim`-wide space
    * and each caption retrieves its image by cosine top-1.
    *
    * The ENCODERS are deterministic STUBS (this container ships no
    * vision/text encoder): both sides use the same md5 token-hash
    * integer projection, v_j = Σ over tokens of
    * (md5_u32("j:" ++ token) % 2001 − 1000) — an order-free INTEGER
    * bag-of-tokens random projection, bit-exact in SQL. What is REAL and
    * under test is the plumbing a real encoder slots into:
    *  - the image side derives its tokens FROM THE PAYLOAD BYTES
    *    (container header stripped at the documented offset, body
    *    UTF-8-decoded — the vision-encoder seam; a real model replaces
    *    exactly this one projection),
    *  - embeddings ride as fixed-width integer vectors,
    *  - retrieval is the broadcast-probe cosine top-1 (s01's shape) with
    *    a deterministic (cos desc, image id) tie-break.
    * Dot/norm folds are j-ordered integer sums (exact); the only float
    * op is the final round(dot / sqrt(nu·nv), 6) — norms cast to double
    * BEFORE multiplying (the long product overflows).
    *
    * Scale: per-row projections to `dim` ints, then probes × images NLJ
    * on model-free vectors (at 100 TB: LSH/IVF-bucket the image side —
    * s02/s03's machinery applies unchanged to these vectors).
    */
  def crossModalTop1(docs: DataFrame, dim: Int = 8, captionTokens: Int = 8,
      maxProbeId: Long = 30L): DataFrame = {
    // the SIMPLE per-(dim, token) md5 fold is the measured fastest form:
    // two "optimizations" both LOST — tf-weighted distinct tokens
    // (array_distinct+filter outweigh saved hashes on wide vocabularies:
    // 4.7 s → 7.4 s at sf0.1) and digest-slicing (materializing dim/4
    // md5s per token as a nested array, then slicing per dim: 4.7 s →
    // 18.8 s — interpreted-HOF element access costs more than the md5
    // kernels it saves). In interpreted higher-order lambdas the hash IS
    // the cheap part.
    def hashTerm(j: Column, t: Column): Column =
      pmod(conv(substring(md5(concat(j.cast(StringType), lit(":"), t)), 1, 8),
        16, 10).cast(LongType), lit(2001L)) - lit(1000L)
    def embed(toks: Column): Column =
      transform(sequence(lit(0), lit(dim - 1)),
        j => aggregate(toks, lit(0L), (a, t) => a + hashTerm(j, t)))
    // dim×tokens md5 folds per image row — CPU-bound, and the corpus
    // file is byte-small (one split): spread before the encoder
    val imgs = Par.spreadForCpu(withPayload(docs))
      .where(col("modality") === "image")
      .select(col("doc_id").as("image_id"),
        // the vision-encoder seam: tokens from the DECODED BODY BYTES
        TextAnalysis.tokens(
          substring(col("payload"), 34, Int.MaxValue).cast(StringType)).as("ts"))
      .select(col("image_id"), embed(col("ts")).as("iv"))
    val caps = docs.where(pmod(col("doc_id"), lit(3)) === 0 &&
        col("doc_id") < maxProbeId)
      .select(col("doc_id").as("caption_id"),
        slice(TextAnalysis.tokens(col("text")), 1, captionTokens).as("ts"))
      .select(col("caption_id"), embed(col("ts")).as("cv"))
    val dot = aggregate(zip_with(col("cv"), col("iv"), (a, b) => a * b),
      lit(0L), (a, x) => a + x)
    def norm2(v: Column): Column =
      aggregate(transform(v, x => x * x), lit(0L), (a, x) => a + x)
    // Broadcast the BOUNDED probe set and stream the corpus: the former
    // shape (`caps.crossJoin(broadcast(imgs))`) shipped the corpus-sized
    // image-embedding table to the driver — fine at sf0.1, fatal at
    // 100×. With caps broadcast, imgs is scanned once in place and the
    // per-caption top-1 is a partial+final max_by HashAggregate
    // (Similarity.assignOrd's idiom): map-side combine collapses each
    // corpus partition to ≤|caps| rows BEFORE the exchange, so the
    // shuffle is probe-bounded regardless of corpus size — strictly
    // better than the former row_number window, which sorted all
    // |caps|×|imgs| scored rows.
    val scored = imgs.crossJoin(broadcast(caps))
      .select(col("caption_id"), col("image_id"),
        round(dot.cast(DoubleType) /
          sqrt(norm2(col("cv")).cast(DoubleType) *
            norm2(col("iv")).cast(DoubleType)), 6).as("cosine"))
    scored
      .groupBy(col("caption_id"))
      // ordering key = (cosine DESC NULLS LAST, image_id ASC): cosine is
      // in [-1,1] so -2 sinks a null (zero-norm) score; -image_id flips
      // the exact-tie break to the LOWEST image id — identical to the
      // former window order (cosine desc, image_id).
      .agg(max_by(struct(col("image_id"), col("cosine")),
        struct(coalesce(col("cosine"), lit(-2.0)), negate(col("image_id"))))
        .as("win"))
      .select(col("caption_id"), col("win.image_id").as("image_id"),
        col("win.cosine").as("cosine"),
        (col("caption_id") === col("win.image_id")).as("is_match"))
      .orderBy(col("caption_id"))
  }

  /** Near-duplicate image pairs at Hamming ≤ `maxHamming`, candidates
    * from the 4 band-equality equi-joins (unioned, deduped — never an
    * OR-join, which degrades to a nested loop). Hamming distance =
    * Σ bit_count(xor(band, band)) — sign-safe integer ops both engines.
    */
  def aHashNearDups(docs: DataFrame, maxHamming: Int = 6): DataFrame = {
    val hashes = aHashed(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val a = hashes.select(col("doc_id").as("id_a"), col("b0").as("a0"),
      col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3"))
    val b = hashes.select(col("doc_id").as("id_b"), col("b0").as("c0"),
      col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3"))
    val cands = (0 until 4).map { k =>
      a.join(b, col(s"a$k") === col(s"c$k") && col("id_a") < col("id_b"))
    }.reduce(_ unionByName _).distinct()
    def bc(x: Column, y: Column): Column = bit_count(x.bitwiseXOR(y)).cast(LongType)
    val out = cands
      .select(col("id_a"), col("id_b"),
        (bc(col("a0"), col("c0")) + bc(col("a1"), col("c1")) +
          bc(col("a2"), col("c2")) + bc(col("a3"), col("c3"))).as("hamming"))
      .where(col("hamming") <= maxHamming)
      .localCheckpoint(eager = false)
    out.count() // materialize before releasing the hash cache
    hashes.unpersist(blocking = false)
    out
  }

  /** Ingest-side payload triage — the binary DLQ (q55's dead-letter split
    * for multimodal columns): classify every payload from its BYTES, not
    * its claimed modality, and quarantine what a decoder would choke on.
    * Verdicts, in magic-sniff order:
    *  - PNG signature seen → `ok_image` if the full IHDR fits (≥ 33
    *    bytes), else `truncated`;
    *  - "RIFF" seen → `truncated` if cut before the WAVE marker (< 12
    *    bytes), `bad_magic` if the marker isn't WAVE, `ok_audio` if the
    *    44-byte header fits, else `truncated`;
    *  - anything else → `no_container` (raw bodies — here the video
    *    fixture — can't be triaged by magic; they pass to the codec
    *    probe downstream, so only payloads CLAIMING a container
    *    modality quarantine on it).
    *
    * The corruption fixture is deterministic ingest reality: doc_id % 7
    * truncates to 10 bytes (mid-header cut), else doc_id % 11 flips the
    * first byte (bit-rot / wrong file). All classification is codegen'd
    * hex/substring arithmetic; the oracle twin computes every verdict
    * arithmetically from (modality, corruption class, length), so a
    * parser off-by-one on the Spark side breaks the hash match.
    *
    * Scale: pure per-row projection — one scan, no shuffle; the verdict
    * column is the partition key a real pipeline would write the
    * quarantine sink by.
    */
  def payloadTriage(docs: DataFrame): DataFrame =
    triageVerdict(corruptPayloads(withPayload(docs)))

  /** The deterministic ingest-corruption fixture shared by m08 and m09:
    * doc_id % 7 truncates the payload to 10 bytes (mid-header cut), else
    * doc_id % 11 increments the first byte (bit-rot / wrong file).
    */
  private[graft] def corruptPayloads(base: DataFrame): DataFrame = {
    val flipped = concat(
      unhex(lpad(hex(pmod(beUint(col("payload"), 1, 1) + 1, lit(256L))), 2, "0")),
      substring(col("payload"), 2, Int.MaxValue))
    base.withColumn("payload",
      when(pmod(col("doc_id"), lit(7)) === 0, substring(col("payload"), 1, 10))
        .when(pmod(col("doc_id"), lit(11)) === 0, flipped)
        .otherwise(col("payload")))
  }

  /** Container-sniffed metadata over the MIXED fixture (m09): classify
    * every payload by magic (png/wav/jpeg/mp3/raw), decode the matching
    * header fields — the PNG/JPEG image dims through their respective
    * parsers into ONE set of columns, WAV sample geometry, MP3 frame
    * parameters — and attach the triage verdict, all from the BYTES
    * through the same corruption fixture as m08. Pure per-row projection;
    * the oracle twin computes every field arithmetically from the fixture,
    * so any parser off-by-one on any of the four container paths breaks
    * the hash match.
    */
  def containerMeta(docs: DataFrame): DataFrame = {
    val c = corruptPayloads(withPayloadMixed(docs))
    val p = col("payload")
    val container =
      when(hex(substring(p, 1, 8)) === PngSigHex, lit("png"))
        .when(hex(substring(p, 1, 4)) === "52494646", lit("wav"))
        .when(hex(substring(p, 1, 2)) === "FFD8", lit("jpeg"))
        .when(length(p) >= 2 &&
          beUint(p, 1, 2).bitwiseAND(lit(0xFFE0L)) === lit(0xFFE0L), lit("mp3"))
        .otherwise(lit("raw"))
    val img = coalesce(decodeImage(p), decodeJpeg(p))
    val wav = decodeAudio(p)
    val mp3 = decodeMp3(p)
    c.select(col("doc_id"), col("modality"), container.as("container"),
        length(p).cast(LongType).as("n_bytes"),
        img.getField("width").as("width"),
        img.getField("height").as("height"),
        img.getField("channels").as("channels"),
        coalesce(wav.getField("sample_rate"), mp3.getField("sample_rate"))
          .as("sample_rate"),
        wav.getField("n_samples").as("n_samples"),
        mp3.getField("bitrate_kbps").as("bitrate_kbps"),
        mp3.getField("n_frames").as("n_frames"),
        verdictCol(p).as("verdict"))
      .withColumn("quarantine",
        col("verdict").isin("truncated", "bad_magic", "no_container") &&
          col("modality") =!= "video")
  }

  /** GIF fixture + parse (m13) — the family's first LITTLE-ENDIAN
    * dimension container (PNG/JPEG headers are big-endian; WAV/MP3 cover
    * audio): per doc a syntactically-valid GIF is synthesized —
    * signature "GIF87a"/"GIF89a" (version varies by doc parity), the
    * 7-byte logical screen descriptor with LE u16 width/height sized to
    * exercise BOTH bytes, a packed byte whose bit 7 is the global-
    * color-table flag and bits 0-2 its size exponent (present on
    * doc_id%3≠0 docs, with the 3·2^(s+1)-byte table emitted), and the
    * 0x3B trailer. [[decodeGif]] recovers every field from the BYTES
    * alone; the oracle computes the same fields ARITHMETICALLY from
    * doc_id (the m09/m10 convention), so any builder/parser asymmetry —
    * especially an endianness slip — breaks the hash.
    */
  def withGif(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val id = col(idCol).cast(LongType)
    val w = lit(200L) + pmod(id * 13, lit(60000L))
    val h = lit(200L) + pmod(id * 7, lit(60000L))
    val hasGct = pmod(id, lit(3L)) =!= 0
    val gctSize = pmod(id, lit(8L))
    val packed = when(hasGct, lit(240L) + gctSize).otherwise(lit(112L))
    docs.select(col(idCol),
        when(pmod(id, lit(2L)) === 0, lit("383961")).otherwise(lit("383761")).as("verHex"),
        w.as("w"), h.as("h"), packed.as("packed"),
        when(hasGct, gctSize).otherwise(lit(0L)).as("gsz"),
        hasGct.as("hasGct"))
      .select(col(idCol),
        unhex(concat(
          lit("474946"), col("verHex"),
          leHex(col("w"), 2), leHex(col("h"), 2),
          beHex(col("packed"), 1), lit("0000"), // bg index, aspect ratio
          when(col("hasGct"),
            expr("repeat('00', cast(3 * shiftleft(1, cast(gsz + 1 as int)) as int))"))
            .otherwise(lit("")),
          lit("3B"))).as("payload"))
  }

  /** Parse the GIF signature + logical screen descriptor (+ GCT flag
    * arithmetic) back out of the bytes — NULL struct on a non-GIF magic.
    */
  def decodeGif(p: Column): Column = {
    val packed = beUint(p, 11, 1)
    val sizeBits = pmod(packed, lit(8L))
    when(hex(substring(p, 1, 3)) === "474946",
      struct(
        when(hex(substring(p, 4, 3)) === "383961", lit("89a"))
          .when(hex(substring(p, 4, 3)) === "383761", lit("87a"))
          .as("version"),
        leUint(p, 7, 2).as("width"),
        leUint(p, 9, 2).as("height"),
        (packed >= 128L).as("has_gct"),
        sizeBits.as("gct_size_bits"),
        when(packed >= 128L,
          lit(3L) * call_function("shiftleft", lit(1L),
            (sizeBits + 1).cast("int")).cast(LongType))
          .otherwise(lit(0L)).as("gct_bytes")))
  }

  /** TIFF fixture (m14) — the byte-order-MARKER container: unlike every
    * other family member, TIFF declares its endianness in-band ("II"
    * little-endian / "MM" big-endian, TIFF 6.0 §2), so ONE parser must
    * dispatch per row instead of assuming a fixed byte order. Per doc a
    * classic TIFF is synthesized in the order picked by doc parity:
    * 8-byte header (order marker, magic 42 in the declared order, u32
    * first-IFD offset = 8), a 4-entry IFD — ImageWidth(256)/
    * ImageLength(257) as LONGs sized past u16 so all four value bytes
    * carry signal, BitsPerSample(258)/Compression(259) as SHORTs whose
    * value sits LEFT-JUSTIFIED in the 4-byte value field (the TIFF rule
    * a naive u32 read gets wrong in exactly one byte order) — and a
    * zero next-IFD pointer. Tags ascend as the spec requires.
    */
  def withTiff(docs: DataFrame, idCol: String = "doc_id"): DataFrame = {
    val id = col(idCol).cast(LongType)
    val le = pmod(id, lit(2L)) === 0
    val w = lit(100L) + pmod(id * 19, lit(70000L))
    val h = lit(100L) + pmod(id * 23, lit(70000L))
    val bits = element_at(array(lit(8L), lit(16L), lit(32L)),
      (pmod(id, lit(3L)) + 1).cast("int"))
    val comp = when(pmod(id, lit(4L)) === 0, lit(5L)).otherwise(lit(1L))
    def dyn(v: Column, n: Int) = when(le, leHex(v, n)).otherwise(beHex(v, n))
    def entryLong(tag: Long, v: Column) =
      concat(dyn(lit(tag), 2), dyn(lit(4L), 2), dyn(lit(1L), 4), dyn(v, 4))
    def entryShort(tag: Long, v: Column) =
      concat(dyn(lit(tag), 2), dyn(lit(3L), 2), dyn(lit(1L), 4),
        dyn(v, 2), lit("0000"))
    docs.select(col(idCol),
      unhex(concat(
        when(le, lit("49492A00")).otherwise(lit("4D4D002A")),
        dyn(lit(8L), 4),
        dyn(lit(4L), 2),
        entryLong(256L, w),
        entryLong(257L, h),
        entryShort(258L, bits),
        entryShort(259L, comp),
        lit("00000000"))).as("payload"))
  }

  /** Parse a TIFF header + first IFD back out of the bytes — NULL struct
    * on a non-TIFF order marker. The parser trusts nothing the builder
    * knows: endianness comes from the marker per row, the IFD is found
    * through the parsed u32 offset (column-offset byte walks, all
    * codegen'd builtins), the entry count is read from the IFD, and each
    * wanted tag is SEARCHED over the first ≤8 entries (slot gated on the
    * parsed count) honoring the per-entry TYPE: SHORT values read 2
    * left-justified bytes, LONG values 4 — so a hand-authored IFD with
    * extra unknown tags parses just as well as the fixture (AHashSpec).
    * Pure per-row projection — rides the scan at any scale.
    */
  def decodeTiff(p: Column): Column = {
    val sig = hex(substring(p, 1, 2))
    val isLe = sig === "4949"
    val isBe = sig === "4D4D"
    def u(off: Column, n: Int) =
      when(isLe, leUintAt(p, off, n)).otherwise(beUintAt(p, off, n))
    val magic = u(lit(3L), 2)
    val ifdOff = u(lit(5L), 4) // 0-based file offset, per the spec
    val nEntries = u(ifdOff + 1, 2)
    // ONE entry table via a transform lambda: the per-entry byte-walk
    // subtree (which embeds the parsed ifdOff/nEntries expressions)
    // exists ONCE in the plan. The first cut unrolled 8 slots × 4 wanted
    // tags as nested whens, duplicating those subtrees combinatorially —
    // measured 318 s at the ×16 sweep scale for a map-only projection
    // (the blown-up tree fell out of codegen); this shape runs it in
    // ordinary per-row time and is exactly as strict (slot gated on the
    // PARSED count, TYPE-aware SHORT/LONG read).
    val entries = filter(
      transform(sequence(lit(0L), lit(7L)), i =>
        when(i < nEntries, {
          val ep = ifdOff + 3 + i * 12 // 1-based position of the entry
          val typ = u(ep + 2, 2)
          struct(u(ep, 2).as("tag"), typ.as("typ"),
            when(typ === 3L, u(ep + 8, 2)).otherwise(u(ep + 8, 4))
              .as("value"))
        })),
      e => e.isNotNull)
    // bind the parsed entry table ONCE per row (transform over a 1-element
    // array): the four tag searches below each reference the lambda
    // variable instead of embedding their own copy of the 8-slot byte-walk
    // subtree — the HOF chain is CodegenFallback, so without the binding
    // every `field()` re-ran the whole IFD parse per row (measured: m14 at
    // 5.6 s for a 5 000-row map-only parse at sf0.1; ~4× the walk work).
    def field(es: Column, wantTag: Long): Column =
      element_at(filter(es, e => e.getField("tag") === wantTag), 1)
        .getField("value")
    val nextIfd = u(ifdOff + 3 + nEntries * 12, 4)
    when(isLe || isBe,
      element_at(transform(array(entries), es =>
        struct(
          when(isLe, lit("II")).otherwise(lit("MM")).as("byte_order"),
          (magic === 42L).as("magic_ok"),
          ifdOff.as("ifd_off"),
          nEntries.as("n_entries"),
          field(es, 256L).as("width"),
          field(es, 257L).as("height"),
          field(es, 258L).as("bits_per_sample"),
          field(es, 259L).as("compression"),
          nextIfd.as("next_ifd"))), 1))
  }

  /** [[leUint]]/[[beUint]] with a COLUMN byte offset (1-based) — the
    * dynamic walks [[decodeTiff]] needs to follow parsed IFD offsets.
    */
  private def leUintAt(p: Column, off: Column, nBytes: Int): Column = {
    val h = hex(p.substr(off.cast("int"), lit(nBytes)))
    val be = concat((nBytes to 1 by -1).map(i => substring(h, (i - 1) * 2 + 1, 2)): _*)
    conv(be, 16, 10).cast(LongType)
  }

  private def beUintAt(p: Column, off: Column, nBytes: Int): Column =
    conv(hex(p.substr(off.cast("int"), lit(nBytes))), 16, 10).cast(LongType)

  /** The classification half of [[payloadTriage]]: expects
    * (doc_id, payload, modality) and emits the verdict/quarantine
    * columns. Separate so hand-built payloads (e.g. the bad_magic
    * branch, which the deterministic corruption fixture never produces)
    * can be pushed through the SAME expressions the catalog query runs.
    */
  def triageVerdict(df: DataFrame): DataFrame =
    df.select(col("doc_id"), col("modality"),
        length(col("payload")).cast(LongType).as("n_bytes"),
        verdictCol(col("payload")).as("verdict"))
      .withColumn("quarantine",
        col("verdict").isin("truncated", "bad_magic", "no_container") &&
          col("modality") =!= "video")

  /** The triage classification as one expression over a payload column. */
  private def verdictCol(p: Column): Column = {
    val len = length(p)
    val isPngSig = hex(substring(p, 1, 8)) === PngSigHex
    val isRiff = hex(substring(p, 1, 4)) === "52494646"
    val hasWave = hex(substring(p, 9, 4)) === "57415645"
    // the m09 magics, sniffed AFTER png/riff (no byte-level overlap:
    // jpeg starts FFD8, mp3 sync needs the top 11 bits set — 0xFFD8
    // & 0xFFE0 = 0xFFC0 ≠ 0xFFE0, so SOI never reads as a frame sync)
    val isJpegSig = hex(substring(p, 1, 2)) === "FFD8"
    val hasMp3Sync = len >= 2 &&
      beUint(p, 1, 2).bitwiseAND(lit(0xFFE0L)) === lit(0xFFE0L)
    when(isPngSig,
      when(len >= 33, lit("ok_image")).otherwise(lit("truncated")))
      .when(isRiff,
        when(len < 12, lit("truncated"))
          .otherwise(when(!hasWave, lit("bad_magic"))
            .otherwise(when(len >= 44, lit("ok_audio")).otherwise(lit("truncated")))))
      .when(isJpegSig,
        // ok iff the segment walk reaches a parseable SOF — a chain cut
        // mid-walk is exactly what a decoder dies on
        when(decodeJpeg(p).isNotNull, lit("ok_image"))
          .otherwise(lit("truncated")))
      .when(hasMp3Sync,
        when(len < 4, lit("truncated"))
          // sync present, full header present, but version/layer/index
          // reserved → a sync-mimicking non-MP3 — bad_magic, not a cut
          .otherwise(when(decodeMp3(p).isNotNull, lit("ok_audio"))
            .otherwise(lit("bad_magic"))))
      .otherwise(lit("no_container"))
  }
}
