package graft

import org.apache.spark.sql.functions._

import graft.analytics.Unigram

/** Unigram-LM tokenizer invariants: Viterbi DP semantics (optimality and
  * the longest-last-piece tie-break), regime parity (driver EM loop ≡
  * distributed declarative loop, bit-for-bit, including non-BMP text),
  * character-fallback coverage, and the encode round-trip.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  private def seg(word: String, vocab: Seq[(String, Double)]): String =
    Seq(word).toDF("word")
      .select(col("word"), typedLit(vocab).as("raw"))
      .select(col("word"), transform(col("raw"), x =>
        struct(x.getField("_1").as("pc"), x.getField("_2").as("lp"))).as("es"))
      .select(Unigram.viterbiSeg(col("word"), col("es")).as("seg"))
      .as[String].collect().head

  test("viterbiSeg picks the max-score segmentation") {
    // "abab": pieces ab (-1.0) beats a+b (-0.9 + -0.9 = -1.8) per pair
    val v = Seq(("a", -0.9), ("b", -0.9), ("ab", -1.0))
    assert(seg("abab", v) === "ab ab")
    // make the char path win: ab expensive
    val v2 = Seq(("a", -0.5), ("b", -0.5), ("ab", -1.5))
    assert(seg("abab", v2) === "a b a b")
  }

  test("viterbiSeg tie-break: the LONGEST last piece wins equal scores") {
    // "ab" via 'ab' (-1.0) ties "a"+"b" (-0.5 + -0.5): l ascending with
    // >= replacement must keep the l=2 candidate
    val v = Seq(("a", -0.5), ("b", -0.5), ("ab", -1.0))
    assert(seg("ab", v) === "ab")
  }

  test("viterbiSeg falls back to characters when no multi-char piece fits") {
    val v = Seq(("x", -1.0), ("y", -1.1), ("z", -1.2))
    assert(seg("zyx", v) === "z y x")
  }

  test("train: driver and distributed regimes produce IDENTICAL pieces, " +
      "scores, and segmentations (the regime switch may never change results)") {
    // repeats to give EM real counts, shared substrings so the prune has
    // competition, plus non-BMP words (🦀 = U+1F980, 𠀀 = U+20000) — the
    // code-point substring contract in both regimes
    val docs = Seq(
      (1L, "low lower lowest low low newer new"),
      (2L, "wider wide new newer lowest ab ab ab"),
      (3L, "zz zz zz zz a"),
      (4L, "🦀x 🦀x 🦀x 🦀y a𠀀b a𠀀b 𠀀𠀀")).toDF("doc_id", "text")
    val (pD, sD) = Unigram.train(docs, seedMulti = 12, keepMulti = 6)
    val (pS, sS) = Unigram.train(docs, seedMulti = 12, keepMulti = 6,
      maxDriverVocab = 0L) // forced distributed loop
    def pieces(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, Double)].collect().sortBy(_._1).toSeq
    def segs(df: org.apache.spark.sql.DataFrame) =
      df.as[(String, String)].collect().sortBy(_._1).toSeq
    assert(pieces(pD) === pieces(pS), "final piece scores must match")
    assert(segs(sD) === segs(sS), "final segmentations must match")
    // coverage: every corpus word segmented, pieces concatenate back
    segs(sD).foreach { case (w, g) =>
      assert(g.split(" ").mkString === w, s"seg of '$w' must reconstruct it")
    }
  }

  test("encode round-trip: token ids reconstruct the original token stream") {
    val docs = Seq(
      (1L, "table scan joins the table"),
      (2L, "merge sort merge"),
      (3L, "")).toDF("doc_id", "text")
    val (pieces, segsDf) = Unigram.train(docs, seedMulti = 10, keepMulti = 5)
    val enc = Unigram.encode(docs, pieces, segsDf)
    val idToPc = Unigram.pieceIds(pieces)
      .as[(String, Long)].collect().map(_.swap).toMap
    val segMap = segsDf.as[(String, String)].collect().toMap
    val rows = enc.orderBy(col("doc_id"))
      .as[(Long, Long, String)].collect()
    val texts = Map(1L -> "table scan joins the table",
      2L -> "merge sort merge", 3L -> "")
    rows.foreach { case (id, n, s) =>
      val toks = if (s.isEmpty) Array.empty[String]
        else s.split(",").map(i => idToPc(i.toLong))
      assert(toks.length === n)
      // piece stream must equal the concatenation of each word's pieces
      // in word order (round-trips the per-word segmentations)
      val words = texts(id).split("\\s+").filter(_.nonEmpty)
      val expected = words.flatMap(w => segMap(w).split(" "))
      assert(toks.toSeq === expected.toSeq)
      assert(toks.mkString === words.mkString)
    }
  }
}
