package graft

import org.apache.spark.sql.functions._

import graft.analytics.Multimodal

/** m06's perceptual aHash: known-bit goldens, the identical-body ⇒
  * Hamming-0 invariant, the ≤3-bit band guarantee, and the gate.
  */
class AHashSpec extends SparkSpec {
  import spark.implicits._

  // docs whose doc_id % 3 == 0 become image modality in withPayload
  private def imageDocs(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("identical bodies hash identically; the pair surfaces at Hamming 0") {
    val docs = imageDocs((0L, "same text body"), (3L, "same text body"),
      (6L, "completely different content here"))
    val pairs = Multimodal.aHashNearDups(docs, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.contains((0L, 3L, 0L)), s"exact pair missing: ${pairs.toSeq}")
  }

  test("bands are 16-bit values and rebuild the above-mean bit pattern") {
    val docs = imageDocs((0L, "a" * 32 + "z" * 32)) // low half, high half
    val h = Multimodal.aHashed(docs).collect().head
    val bands = Seq(h.getLong(1), h.getLong(2), h.getLong(3), h.getLong(4))
    assert(bands.forall(b => b >= 0L && b <= 65535L))
    // 'a'(97)·64 vs sum = 32·97+32·122 = 7008: 97·64=6208 < 7008 → bit 0;
    // 'z'(122)·64 = 7808 > 7008 → bit 1: bands = [0, 0, 0xFFFF, 0xFFFF]
    assert(bands == Seq(0L, 0L, 65535L, 65535L), s"got $bands")
  }

  test("a 1-bit body difference lands within the banded candidate guarantee") {
    // flip one byte far above/below the mean: exactly one bit differs,
    // d = 1 ≤ 3 ⇒ the shared-band guarantee applies and the pair emits
    val base = "m" * 64
    val docs = imageDocs((0L, base), (3L, "z" + base.drop(1)))
    val pairs = Multimodal.aHashNearDups(docs, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq == Seq((0L, 3L, 1L)), s"got ${pairs.toSeq}")
  }

  test("the Hamming gate drops far pairs even when a band collides") {
    // first 16 bytes identical (band 0 collides) but the rest alternates
    // oppositely — a candidate that must NOT pass the gate
    val a = "m" * 16 + "az" * 24
    val b = "m" * 16 + "za" * 24
    val docs = imageDocs((0L, a), (3L, b))
    assert(Multimodal.aHashNearDups(docs, maxHamming = 6).count() == 0L)
  }

  test("m11 shotBoundaries: hand-computed histograms — vocabulary cut fires, " +
      "uniform stream doesn't, tail window clips, first frame reads null") {
    // doc_id % 3 == 2 → video modality; frames=2/window=4 keeps the
    // histograms hand-checkable
    val docs = Seq(
      (2L, "AAAAZZZZ"),   // UPPERCASE on purpose: lowering happens pre-slice
      (5L, "bbbbbbbb"),   // uniform stream — no cut
      (8L, "mmmm99")      // len 6: frame 1 starts at char 4, clips to "m99"
    ).toDF("doc_id", "text")
    val got = Multimodal.shotBoundaries(docs, frames = 2, window = 4, threshold = 8)
      .orderBy("doc_id", "frame_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5),
        if (r.isNullAt(6)) None else Some(r.getLong(6)),
        if (r.isNullAt(7)) None else Some(r.getBoolean(7))))
    assert(got.length === 6)
    // doc 2: "aaaa" → "zzzz": L1 delta 8 ≥ 8 → hard cut
    assert(got(0) == ((2L, 0L, 4L, 0L, 0L, 0L, None, None)))
    assert(got(1) == ((2L, 1L, 0L, 4L, 0L, 0L, Some(8L), Some(true))))
    // doc 5: identical "bbbb" windows ('b' ∈ [a-m]) → delta 0, no cut
    assert(got(3) == ((5L, 1L, 4L, 0L, 0L, 0L, Some(0L), Some(false))))
    // doc 8: "mmmm" → clipped "m99" (3 chars): |1−4| + |2−0| = 5 < 8
    assert(got(4) == ((8L, 0L, 4L, 0L, 0L, 0L, None, None)))
    assert(got(5) == ((8L, 1L, 1L, 0L, 2L, 0L, Some(5L), Some(false))))
  }

  test("m12 stripAncillaryMeta: hand chunk walk — lengths, the null-split " +
      "key, IDAT after strip, dims survive; an unchunked stream is not " +
      "certified clean") {
    val docs = Seq((0L, "hello"), (3L, "worlds!")).toDF("doc_id", "text")
    val got = Multimodal.withPayloadTagged(docs)
      .select(col("doc_id"), col("payload"),
        Multimodal.stripAncillaryMeta(col("payload")).as("m"))
      .orderBy("doc_id").collect()
    val m0 = got(0).getStruct(2)
    // doc 0: body 5, value "user0" (5) → meta data 12; 33 sig+IHDR +
    // (12+12) tEXt + (12+5) IDAT + 12 IEND = 86; stripped drops 24
    assert(m0.getLong(0) === 86L && m0.getLong(1) === 62L, s"lengths: $m0")
    assert(m0.getString(2) === "Author" && m0.getLong(3) === 5L)
    assert(m0.getString(4) === "IDAT" && m0.getBoolean(5))
    // doc 3: value "user3x" (6 — doc_id div 3 = 1 adds one pad char)
    val m3 = got(1).getStruct(2)
    assert(m3.getLong(3) === 6L && m3.getBoolean(5), s"doc 3: $m3")
    // the strip must not disturb the IHDR: re-derive the stripped bytes
    // (same walk arithmetic) and parse dims from them
    val strippedParsed = Multimodal.withPayloadTagged(docs)
      .select(
        Multimodal.decodeImage(col("payload")).getField("width").as("w_orig"),
        Multimodal.decodeImage(concat(substring(col("payload"), 1, 33),
          col("payload").substr(
            (lit(46L) + conv(hex(substring(col("payload"), 34, 4)), 16, 10).cast("long")).cast("int"),
            lit(Int.MaxValue)))).getField("width").as("w_stripped"))
      .collect()
    assert(strippedParsed.forall(r => r.getInt(0) === r.getInt(1)),
      "IHDR dims must survive the strip byte-exactly")
    // an UNCHUNKED stream (the m01 fixture: raw body after the header)
    // cannot be certified clean — the walk finds no IDAT where a chunk
    // type should be
    val legacy = Multimodal.withPayload(docs)
      .select(Multimodal.stripAncillaryMeta(col("payload")).getField("clean"))
      .collect()
    assert(legacy.forall(!_.getBoolean(0)),
      "no IDAT after the header ⇒ not certified clean")
    // metadata parked AFTER the image data: the leading-chunk strip is a
    // no-op and the two-chunk re-walk sees tEXt where IEND must be —
    // refused, never falsely certified (the second-review finding)
    val trailing = Seq((0L, "hi")).toDF("doc_id", "text")
      .select(concat(
        Multimodal.pngHeader(lit(4), lit(4)),
        unhex(lit("00000002")), lit("IDAT").cast("binary"),
        col("text").cast("binary"), unhex(lit("00000000")),
        unhex(lit("00000003")), lit("tEXt").cast("binary"),
        lit("a").cast("binary"), unhex(lit("00")), lit("b").cast("binary"),
        unhex(lit("00000000")),
        unhex(lit("0000000049454E4400000000"))).as("payload"))
      .select(Multimodal.stripAncillaryMeta(col("payload")).as("m"))
      .collect().head.getStruct(0)
    assert(!trailing.getBoolean(5),
      s"residual trailing metadata must never read clean: $trailing")
    assert(trailing.getLong(0) === trailing.getLong(1),
      "a critical-first stream is not modified by the leading-chunk strip")
  }

  test("m07 cross-modal: distinctive vocabularies retrieve their true pair at top-1") {
    // each doc carries a unique vocabulary, so the caption (its prefix)
    // must retrieve its own image for every probe — the stub encoders
    // preserve enough signal when docs do not share tokens
    val docs = (0L until 30L).map(i =>
      (i, (1 to 12).map(w => s"tok${i}x$w").mkString(" "))).toDF("doc_id", "text")
    val out = Multimodal.crossModalTop1(docs, dim = 32, captionTokens = 16,
      maxProbeId = 30L).collect()
    assert(out.length === 10, "10 image-modality probe captions under 30")
    out.foreach { r =>
      assert(r.getBoolean(3) && r.getLong(0) === r.getLong(1),
        s"caption ${r.getLong(0)} retrieved ${r.getLong(1)}")
    }
  }

  test("m07 decode seam: image tokens derive from the payload bytes losslessly") {
    // the vision-encoder seam: stripping the PNG header and UTF-8
    // decoding the body must reproduce the original text EXACTLY —
    // the m07 oracle hash-match rides on this round-trip
    val docs = imageDocs((0L, "round trip body with words"), (3L, "another body"))
    val got = Multimodal.withPayload(docs)
      .select(col("doc_id"),
        substring(col("payload"), 34, Int.MaxValue).cast("string").as("body"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(0L -> "round trip body with words", 3L -> "another body"))
  }

  test("m08 triage: the bad_magic branch fires on a RIFF container that isn't WAVE") {
    // the corruption fixture never produces this verdict (truncation and
    // first-byte flips hit other branches), so exercise it by hand: a
    // RIFF/AVI payload — valid RIFF magic, non-WAVE form type
    import org.apache.spark.sql.functions.{concat, lit, unhex}
    val avi = spark.range(1).select(lit(99L).as("doc_id"),
      concat(unhex(lit("52494646" + "10000000" + "41564920")), // "RIFF" size "AVI "
        lit("padding-to-clear-44-bytes-of-header-room").cast("binary")).as("payload"),
      lit("audio").as("modality"))
    // classify the hand-built payload through the same verdict expression
    // by reusing payloadTriage on a doc whose synthesized payload we
    // override — simplest faithful route: run the verdict columns directly
    val out = Multimodal.triageVerdict(avi).collect().head
    assert(out.getString(out.fieldIndex("verdict")) == "bad_magic",
      s"RIFF-but-not-WAVE must be bad_magic: $out")
    assert(out.getBoolean(out.fieldIndex("quarantine")),
      "a claimed-audio payload with a foreign container must quarantine")
  }

  test("m09 decodeJpeg: the segment walk parses SOF dims and hops an " +
      "unknown inserted segment") {
    val base = spark.range(1).select(
      concat(Multimodal.jpegHeader(lit(640), lit(480)),
        lit("body bytes").cast("binary")).as("payload"))
    val parsed = base.select(Multimodal.decodeJpeg(col("payload")).as("m"))
      .select(col("m.width"), col("m.height"), col("m.channels"))
      .as[(Int, Int, Int)].collect().head
    assert(parsed === ((640, 480, 3)))
    // splice a 4-byte COM segment right after SOI: a fixed-offset peek
    // would now read garbage; the walk must hop it via its length field
    val spliced = base.select(concat(
        substring(col("payload"), 1, 2),
        unhex(lit("FFFE0004ABCD")),
        substring(col("payload"), 3, Int.MaxValue)).as("payload"))
    val parsed2 = spliced.select(Multimodal.decodeJpeg(col("payload")).as("m"))
      .select(col("m.width"), col("m.height"), col("m.channels"))
      .as[(Int, Int, Int)].collect().head
    assert(parsed2 === ((640, 480, 3)), "walk must skip the COM segment")
    // cut mid-chain (before the SOF): null struct, not a crash
    val cut = base.select(substring(col("payload"), 1, 10).as("payload"))
    assert(cut.select(Multimodal.decodeJpeg(col("payload"))).collect().head.isNullAt(0))
  }

  test("m09 decodeMp3: header fields, the ISO frame-length formula, and padding") {
    // brIdx 9 → 128 kbps, srIdx 0 → 44100 Hz, padding 1:
    // frame = ⌊144000·128/44100⌋ + 1 = 417 + 1 = 418 bytes
    val df = spark.range(1).select(
      concat(Multimodal.mp3Header(lit(9), lit(0), lit(1)),
        lit("x" * 1000).cast("binary")).as("payload"))
    val m = df.select(Multimodal.decodeMp3(col("payload")).as("m"))
      .select(col("m.bitrate_kbps"), col("m.sample_rate"),
        col("m.frame_bytes"), col("m.n_frames"))
      .as[(Int, Int, Long, Long)].collect().head
    assert(m === ((128, 44100, 418L, 2L))) // ⌊1004/418⌋ = 2 whole frames
    // reserved bitrate index 15: sync present, full header, but no valid
    // parse — decode nulls out
    val bad = spark.range(1).select(unhex(lit("FFFBF000")).as("payload"))
    assert(bad.select(Multimodal.decodeMp3(col("payload"))).collect().head.isNullAt(0))
  }

  test("m09 triage: new-magic verdicts — jpeg cut mid-walk is truncated, " +
      "a reserved MP3 index is bad_magic, a bare sync is truncated") {
    val rows = spark.range(1).select(
      substring(concat(Multimodal.jpegHeader(lit(64), lit(64)),
        lit("b").cast("binary")), 1, 10).as("payload"),
      lit(1L).as("doc_id"), lit("image").as("modality"))
      .unionByName(spark.range(1).select(
        unhex(lit("FFFBF000")).as("payload"), lit(2L).as("doc_id"),
        lit("audio").as("modality")))
      .unionByName(spark.range(1).select(
        unhex(lit("FFFB")).as("payload"), lit(3L).as("doc_id"),
        lit("audio").as("modality")))
    val out = Multimodal.triageVerdict(rows).orderBy(col("doc_id"))
      .select(col("verdict"), col("quarantine"))
      .as[(String, Boolean)].collect().toSeq
    assert(out === Seq(("truncated", true), ("bad_magic", true),
      ("truncated", true)), s"got $out")
  }

  test("m10 WARC: hand record round-trips; the truncation and 404 fixtures " +
      "flag without dropping; a hand-authored record parses field-exact") {
    import graft.analytics.Warc
    // generator → parser round-trip on the two fixture residues
    val docs = Seq(
      (3L, "alpha beta", "en", "srcA"),   // 3 % 7 == 3 → HTTP 404
      (5L, "gamma delta", "fr", "srcB"),  // 5 % 11 == 5 → length lies by 7
      (9L, "epsilon", "de", "srcC")       // clean keep
    ).toDF("doc_id", "text", "lang", "source")
    val out = Warc.parseWarc(Warc.withWarc(docs)).orderBy("doc_id")
      .select("doc_id", "version_ok", "warc_type", "host", "http_status",
        "length_ok", "title", "keep")
      .as[(Long, Boolean, String, String, Int, Boolean, String, Boolean)]
      .collect().toSeq
    assert(out === Seq(
      (3L, true, "response", "srcA.example.com", 404, true, "doc 3 [en]", false),
      (5L, true, "response", "srcB.example.com", 200, false, "doc 5 [fr]", false),
      (9L, true, "response", "srcC.example.com", 200, true, "doc 9 [de]", true)),
      s"got $out")
    // hand-authored record (not from the generator): every field from text
    val rec = "WARC/1.0\r\nWARC-Type: response\r\n" +
      "WARC-Record-ID: <urn:uuid:00000000002a>\r\n" +
      "WARC-Target-URI: https://h.example.com/en/42\r\n" +
      "WARC-Date: 2024-03-15T10:00:00Z\r\nContent-Length: 101\r\n\r\n" +
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n" +
      "<html><head><title>T</title></head><body><p>hello world</p></body></html>"
    val one = Warc.parseWarc(Seq(rec).toDF("warc")).collect().head
    assert(one.getAs[Long]("doc_id") === 42L)
    assert(one.getAs[String]("record_id") === "00000000002a")
    assert(one.getAs[String]("title") === "T")
    assert(one.getAs[Long]("actual_len") === 132L) // 17 + 42 + 73
    assert(!one.getAs[Boolean]("length_ok"))       // declared 101 ≠ 132
    assert(one.getAs[Long]("n_extract_words") === 3L) // "T hello world"
    assert(one.getAs[String]("lang_path") === "en")
  }

  test("m14 TIFF: builder↔parser round-trip on both byte orders; hand-" +
      "authored IFDs — parsed offset followed, unknown tags skipped, " +
      "SHORT values read left-justified in BOTH orders") {
    import graft.analytics.Multimodal
    // fixture round-trip: ids cover both parities and the %3/%4 residues
    val docs = (0L to 5L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val got = Multimodal.withTiff(docs)
      .select(col("doc_id"), Multimodal.decodeTiff(col("payload")).as("m"),
        length(col("payload")).as("len"))
      .orderBy("doc_id")
      .select("doc_id", "m.byte_order", "m.magic_ok", "m.ifd_off",
        "m.n_entries", "m.width", "m.height", "m.bits_per_sample",
        "m.compression", "m.next_ifd", "len")
      .as[(Long, String, Boolean, Long, Long, Long, Long, Long, Long, Long, Int)]
      .collect().toSeq
    val want = (0L to 5L).map { i =>
      (i, if (i % 2 == 0) "II" else "MM", true, 8L, 4L,
        100L + i * 19 % 70000, 100L + i * 23 % 70000,
        Seq(8L, 16L, 32L)(i.toInt % 3), if (i % 4 == 0) 5L else 1L, 0L, 62)
    }
    assert(got === want, s"got $got")

    // hand-authored BE TIFF: IFD at offset 16 (8 padding bytes — the
    // parser must FOLLOW the parsed offset), a leading unknown tag the
    // search must skip, a missing tag (height) that must come back NULL,
    // and a BE SHORT whose value lives in the FIRST two value bytes
    val be = "4D4D002A" + "00000010" + "0000000000000000" +
      "0003" +
      "00FE" + "0004" + "00000001" + "00000000" + // NewSubfileType: unknown
      "0100" + "0004" + "00000001" + "00011171" + // width LONG 70001
      "0102" + "0003" + "00000001" + "0010" + "0000" + // bits SHORT 16
      "00000000"
    // hand-authored LE TIFF: the same left-justification rule mirrored —
    // a naive 4-byte read happens to work in LE ("0800 0000" = 8) but
    // the BE case above (0x00100000) would read 1048576, so together the
    // pair pins the TYPE-aware read in both orders
    val le = "49492A00" + "08000000" +
      "0200" +
      "0001" + "0400" + "01000000" + "01000100" + // width LONG 65537
      "0201" + "0300" + "01000000" + "0800" + "0000" + // bits SHORT 8
      "00000000"
    val hand = Seq(be, le).toDF("hx")
      .select(Multimodal.decodeTiff(unhex(col("hx"))).as("m"))
      .select("m.byte_order", "m.ifd_off", "m.n_entries", "m.width",
        "m.height", "m.bits_per_sample", "m.compression", "m.next_ifd")
      .collect().toSeq
    assert(hand.map(_.toSeq) === Seq(
      Seq("MM", 16L, 3L, 70001L, null, 16L, null, 0L),
      Seq("II", 8L, 2L, 65537L, null, 8L, null, 0L)), s"got $hand")
    // a non-TIFF marker yields a NULL struct, not garbage fields
    val bad = Seq("47494638").toDF("hx")
      .select(Multimodal.decodeTiff(unhex(col("hx"))).as("m"))
      .collect().head
    assert(bad.isNullAt(0))
  }

  test("m15 tar: builder↔parser round-trip (multi-block + empty entries, " +
      "data-dependent offsets); corrupted name breaks ONLY its checksum; " +
      "the SYSTEM tar reads the synthesized archive") {
    import graft.analytics.Tar
    // doc 7: 600-byte body → 2 data blocks → entry 1's header at 1536;
    // doc 8: empty body → entry 1's header right after header 0 at 512
    val docs = Seq((7L, "a" * 600), (8L, "")).toDF("doc_id", "text")
    val got = Tar.parseTar(Tar.withTar(docs)).orderBy("doc_id", "entry_idx")
      .select("doc_id", "entry_idx", "hdr_off", "name", "size", "mtime",
        "typeflag", "magic_ok", "chksum_ok")
      .as[(Long, Long, Long, String, Long, Long, String, Boolean, Boolean)]
      .collect().toSeq
    assert(got === Seq(
      (7L, 0L, 0L, "d7.txt", 600L, 1700000007L, "0", true, true),
      (7L, 1L, 1536L, "m7", 10L, 1700000007L, "0", true, true),
      (8L, 0L, 0L, "d8.txt", 0L, 1700000008L, "0", true, true),
      (8L, 1L, 512L, "m8", 10L, 1700000008L, "0", true, true)), s"got $got")
    // flip one name byte AFTER building: the stored checksum no longer
    // matches the bytes — chksum_ok false for entry 0 only, and the walk
    // (driven by the intact size field) still finds entry 1
    val corrupted = Tar.withTar(docs.where(col("doc_id") === 7))
      .select(col("doc_id"), overlay(col("payload"), unhex(lit("58")),
        lit(2)).as("payload"))
    val c = Tar.parseTar(corrupted).orderBy("entry_idx")
      .select("entry_idx", "name", "chksum_ok")
      .as[(Long, String, Boolean)].collect().toSeq
    assert(c === Seq((0L, "dX.txt", false), (1L, "m7", true)), s"got $c")
    // external receipt: GNU tar lists the synthesized archive's members
    val payload = Tar.withTar(docs.where(col("doc_id") === 7))
      .select("payload").collect().head.getAs[Array[Byte]](0)
    val f = java.io.File.createTempFile("graft_m15_", ".tar")
    try {
      java.nio.file.Files.write(f.toPath, payload)
      val out = scala.sys.process.Process(Seq("tar", "-tf", f.getPath)).!!
      assert(out.split("\n").toSeq === Seq("d7.txt", "m7"),
        s"system tar disagrees: $out")
    } finally f.delete()
  }

  test("byte_range_sum kernel ≡ declarative hex fold (value, out-of-range " +
      "NULL, len-0 seed) — the m15 checksum optimization's contract") {
    import graft.analytics.Tar
    // payloads exercising sign bits (0xFF), NULs, and odd lengths
    val rows = Seq((1L, "FF00FE417F", 1L, 5L), (2L, "00", 1L, 1L),
      (3L, "DEADBEEF", 2L, 3L), (4L, "DEADBEEF", 1L, 0L),
      (5L, "DEADBEEF", 1L, 5L), // range past end → NULL
      (6L, "DEADBEEF", 0L, 2L)) // pos < 1 → NULL
      .toDF("id", "hx", "pos", "len")
      .select(col("id"), unhex(col("hx")).as("bin"), col("pos"), col("len"))
    // declarative twin: the fold parseTar ran before the kernel — sum of
    // conv'd hex byte pairs, poisoned to NULL when a byte is missing
    val fold = aggregate(sequence(lit(0L), col("len") - 1L), lit(0L),
      (a, i) => a + conv(hex(col("bin")).substr(
        ((col("pos") - 1L + i) * 2L + 1L).cast("int"), lit(2)), 16, 10)
        .cast("long"))
    val declarative = when(col("len") === 0L, lit(0L))
      .when(col("pos") < 1L || col("pos") - 1L + col("len") > length(col("bin")),
        lit(null).cast("long"))
      .otherwise(fold)
    val got = rows.select(col("id"),
        call_function("byte_range_sum", col("bin"), col("pos"), col("len")).as("k"),
        declarative.as("d"))
      .orderBy("id").as[(Long, Option[Long], Option[Long])].collect().toSeq
    got.foreach { case (id, k, d) => assert(k === d, s"id=$id kernel=$k fold=$d") }
    assert(got.map(_._2) === Seq(Some(0xFFL + 0xFEL + 0x41L + 0x7FL),
      Some(0L), Some(0xADL + 0xBEL + 0xEFL), Some(0L), None, None))
  }
}
