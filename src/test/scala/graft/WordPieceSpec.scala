package graft

import org.apache.spark.sql.functions._

import graft.analytics.WordPiece

/** WordPiece greedy longest-prefix encoder: hand-checkable segmentations,
  * the two [UNK] paths (length bound, dead-end), '##' rendering
  * round-trip, and the vocabulary-seed tie-break.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private def pieces(ps: String*) = ps.toDF("piece")

  // fixtures pin the DISTRIBUTED loop (maxDriverWords = 0); the corpus
  // tests and the regime-equality test cover the driver path
  private def seg(words: Seq[String], ps: Seq[String], maxChars: Int = 16) =
    WordPiece.segmentWords(words.toDF("word"), pieces(ps: _*), maxChars,
        maxDriverWords = 0L)
      .collect()
      .map(r => r.getString(0) ->
        (r.getSeq[String](1), r.getBoolean(2)))
      .toMap

  test("greedy longest-prefix match with ## continuation (the BERT example)") {
    // the canonical HF docstring case: unaffable → un ##aff ##able
    val m = seg(Seq("unaffable"),
      Seq("un", "aff", "able", "unaff") ++ "unafble".map(_.toString))
    // greedy takes the LONGEST prefix first: unaff, then ##able
    assert(m("unaffable") === (Seq("unaff", "##able"), false))
  }

  test("greedy is longest-match, not leftmost-shortest") {
    val m = seg(Seq("abcd"), Seq("a", "b", "c", "d", "ab", "abc", "cd", "bcd"))
    // abc beats ab beats a; remainder d
    assert(m("abcd") === (Seq("abc", "##d"), false))
  }

  test("[UNK] paths: over the length bound, and dead-end mid-word") {
    val m = seg(Seq("toolongword", "xqz", "ok"),
      Seq("o", "k", "x", "t") /* no q/z */, maxChars = 8)
    assert(m("toolongword") === (Seq(WordPiece.UnkPiece), true)) // 11 > 8
    assert(m("xqz") === (Seq(WordPiece.UnkPiece), true)) // x matches, q dead-ends
    assert(m("ok") === (Seq("o", "##k"), false))
  }

  test("non-UNK segmentations concatenate back to the word (stripping ##)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val toks = docs.select(explode(analytics.TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val segs = WordPiece.segmentWords(toks.select("word"),
      WordPiece.pieceVocab(toks, topPieces = 40), maxInputChars = 6)
    val rows = segs.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (word, ps, unk) = (r.getString(0), r.getSeq[String](1), r.getBoolean(2))
      if (!unk) {
        val rebuilt = ps.map(_.stripPrefix(WordPiece.ContinuationPrefix)).mkString
        assert(rebuilt === word, s"round-trip broke for $word: $ps")
        // ## exactly on the non-initial pieces
        assert(!ps.head.startsWith(WordPiece.ContinuationPrefix))
        assert(ps.tail.forall(_.startsWith(WordPiece.ContinuationPrefix)))
      } else assert(ps === Seq(WordPiece.UnkPiece))
    }
    // the corpus' one 8-char word trips the maxInputChars=6 bound
    assert(rows.count(_.getBoolean(2)) === 1)
  }

  test("encode: doc counts are consistent and empty docs encode to zeros") {
    val docs = Seq((1L, "aa bb aa"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val out = WordPiece.encode(docs, topPieces = 4, maxInputChars = 6)
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(3L, 0L, 0L)) // n_words
    val r1 = out.head
    // "aa" and "bb" are themselves top pieces → one piece per word
    assert(r1.getLong(2) === 3L) // n_pieces
    assert(r1.getLong(3) === 0L) // n_unk_words
    assert(r1.getString(4) === "aa bb aa")
    assert(out(1).getString(4) === "" && out(2).getString(4) === "")
  }

  test("driver and distributed segmentation regimes are bit-identical") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val wf = docs.select(explode(analytics.TextAnalysis.tokens(col("text"))).as("word"))
      .groupBy("word").agg(count(lit(1)).as("freq"))
    val vocab = WordPiece.pieceVocab(wf, topPieces = 40)
    def run(maxDriverWords: Long) =
      WordPiece.segmentWords(wf.select("word"), vocab, maxInputChars = 6,
          maxDriverWords = maxDriverWords)
        .orderBy("word").collect()
        .map(r => (r.getString(0), r.getSeq[String](1), r.getBoolean(2))).toSeq
    assert(run(1L << 20) === run(0L)) // driver vs forced-distributed
    // and on the synthetic fixtures (dead-end + length-bound paths)
    val fw = Seq("toolongword", "xqz", "ok", "unaffable").toDF("word")
    val fp = pieces(Seq("un", "aff", "able", "unaff", "o", "k", "x", "t"): _*)
    def runF(mdw: Long) =
      WordPiece.segmentWords(fw, fp, maxInputChars = 8, maxDriverWords = mdw)
        .orderBy("word").collect()
        .map(r => (r.getString(0), r.getSeq[String](1), r.getBoolean(2))).toSeq
    assert(runF(1L << 20) === runF(0L))
  }

  test("vocabulary seed: weight desc then piece asc, singles always present") {
    val wf = Seq(("abab", 10L), ("cd", 1L)).toDF("word", "freq")
    val v = column[String](WordPiece.pieceVocab(wf, topPieces = 2).orderBy("piece"))
    // substring weights: ab=20, ba=10, aba=10, bab=10, abab=10, cd=1 →
    // top-2 = ab (20), then aba (10, lexicographic among the 10-ties)
    assert(v.toSet === Set("ab", "aba", "a", "b", "c", "d"))
  }
}
