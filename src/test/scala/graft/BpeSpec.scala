package graft

import org.apache.spark.sql.functions._

import graft.analytics.Bpe

/** BPE tokenizer invariants: merge-application semantics, training
  * determinism, and the encode round-trip (subword strings concatenate
  * back to the original words — token ids lose no information).
  */
class BpeSpec extends SparkSpec {
  import spark.implicits._

  test("applyMerge: greedy left-to-right, no re-merge across a fresh fuse") {
    val df = Seq(
      "h e l l o </w>",  // one (l,l) pair
      "l l l l </w>",    // greedy: (1,2) and (3,4), NOT the overlapping (2,3)
      "l l l </w>",      // (1,2) fuses; lone trailing l survives
      "x </w>"           // no pair at all
    ).toDF("symstr")
      .select(split(col("symstr"), " ").as("syms"))
      .select(Bpe.applyMerge(col("syms"), Bpe.Merge("l", "l")).as("m"))
    assert(df.as[String].collect().toSeq === Seq(
      "h e ll o </w>", "ll ll </w>", "ll l </w>", "x </w>"))
  }

  test("applyMerge: boundary requires the exact symbol, not a suffix") {
    // previous symbol "xl" ends with the char 'l' but IS NOT symbol "l" —
    // the delimiter-anchored test must not fuse it
    val r = Seq("xl l </w>").toDF("symstr")
      .select(split(col("symstr"), " ").as("syms"))
      .select(Bpe.applyMerge(col("syms"), Bpe.Merge("l", "l")).as("m"))
      .as[String].collect().head
    assert(r === "xl l </w>")
  }

  test("train: deterministic merge sequence with lexicographic tie-break") {
    val docs = Seq((1L, "ab ab cd"), (2L, "cd ab cd")).toDF("doc_id", "text")
    val (merges, _) = Bpe.train(docs, nMerges = 2)
    // round 1: pairs (a,b)×3, (b,</w>)×3, (c,d)×3, (d,</w>)×3 — all tied
    // at 3; lexicographic ASC picks ("a","b"). round 2: ("ab","</w>")×3,
    // (c,d)×3, (d,</w>)×3 → "ab" < "c" picks ("ab","</w>").
    assert(merges === Seq(Bpe.Merge("a", "b"), Bpe.Merge("ab", "</w>")))
  }

  test("encode round-trip: subword strings reconstruct the original words") {
    val docs = Seq(
      (1L, "table scan joins the table"),
      (2L, "merge sort merge"),
      (3L, "")).toDF("doc_id", "text")
    val (_, vocab) = Bpe.train(docs, nMerges = 6)
    val enc = Bpe.encode(docs, vocab)
    val ids = Bpe.tokenIds(vocab)
    // invert: ids_str → token strings → concatenate, split words on the
    // end-of-word marker → must equal the original token stream
    val idToTok = ids.as[(String, Long)].collect().map(_.swap).toMap
    val rows = enc.orderBy(col("doc_id"))
      .select(col("doc_id"), col("n_bpe"), col("ids_str"))
      .as[(Long, Long, String)].collect()
    val reconstructed = rows.map { case (_, n, s) =>
      val toks = if (s.isEmpty) Array.empty[String]
        else s.split(",").map(i => idToTok(i.toLong))
      assert(toks.length === n)
      toks.mkString("").split(java.util.regex.Pattern.quote(Bpe.EndMark))
        .filter(_.nonEmpty).mkString(" ")
    }
    assert(reconstructed.toSeq === Seq("table scan joins the table", "merge sort merge", ""))
  }

  test("OOV encode: held-out words segment identically to a from-scratch " +
      "merge replay; novel symbols map to UNK (-1)") {
    val trainDocs = Seq(
      (2L, "lower lower newest newest newest"),
      (4L, "lowest lowest wider")).toDF("doc_id", "text")
    val (merges, vocab) = Bpe.train(trainDocs, nMerges = 8)
    // from-scratch replay in plain Scala — the independent reference the
    // engine's segmentWords fold must reproduce exactly
    def replay(word: String): Seq[String] = {
      var syms: Seq[String] = word.map(_.toString) :+ Bpe.EndMark
      for (m <- merges) {
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == m.a && syms(i + 1) == m.b) {
            out += m.a + m.b; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toSeq
      }
      syms
    }
    // held-out: "low" and "newer" are OOV but all-known characters;
    // "quiz" carries characters training never saw → every subword UNK
    val held = Seq((1L, "low newer lower quiz")).toDF("doc_id", "text")
    val segged = Bpe.segmentWords(
      Seq("low", "newer", "quiz").toDF("word"), merges)
      .as[(String, String)].collect().toMap
    for (w <- Seq("low", "newer", "quiz"))
      assert(segged(w).split(" ").toSeq === replay(w), s"word $w")
    // end-to-end: ids decode back through the trained id table; UNK count
    // equals the number of replayed subwords absent from that table
    val ids = Bpe.tokenIds(vocab).as[(String, Long)].collect().toMap
    val expectedIds = "low newer lower quiz".split(" ").toSeq
      .flatMap(w => replay(w).map(t => ids.getOrElse(t, -1L)))
    val enc = Bpe.encode(held, vocab, merges = merges)
      .as[(Long, Long, String, Long)].collect()
    assert(enc.length === 1)
    val (_, nBpe, idsStr, nUnk) = enc.head
    assert(idsStr.split(",").toSeq.map(_.toLong) === expectedIds)
    assert(nBpe === expectedIds.length)
    assert(nUnk === expectedIds.count(_ == -1L) && nUnk > 0)
  }

  test("train: driver and distributed regimes produce IDENTICAL merges " +
      "and vocabulary state (the regime switch may never change results)") {
    // real-word fixture with ties, repeats, multi-char growth, a word
    // that fully merges, AND non-BMP words (🦀 = U+1F980, 𠀀 = U+20000:
    // two UTF-16 code units each) — exercises greedy application, UTF-8
    // tie-breaks, the early-stop edge, and the code-point initial-symbol
    // contract in both regimes: Spark's substr splits by code point, so
    // a driver split by code UNIT would cut the emoji into lone
    // surrogates and diverge
    val docs = Seq(
      (1L, "low lower lowest low low newer new"),
      (2L, "wider wide new newer lowest ab ab ab"),
      (3L, "zz zz zz zz a"),
      (4L, "🦀x 🦀x 🦀x 🦀y a𠀀b a𠀀b 𠀀𠀀")).toDF("doc_id", "text")
    val (mD, vD) = Bpe.train(docs, nMerges = 10) // driver regime (small vocab)
    val (mS, vS) = Bpe.train(docs, nMerges = 10, maxDriverVocab = 0L) // forced Spark loop
    assert(mD === mS, s"merge sequences must match: $mD vs $mS")
    def state(v: org.apache.spark.sql.DataFrame) = v.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).sortBy(_._1).toSeq
    assert(state(vD) === state(vS), "final vocabulary state must match")
  }

  test("train stops early on a fully-merged vocabulary") {
    val docs = Seq((1L, "aa aa aa")).toDF("doc_id", "text")
    // "aa </w>" needs 2 merges to a single symbol; further rounds no-op
    val (merges, vocab) = Bpe.train(docs, nMerges = 10)
    assert(merges.length === 2)
    assert(vocab.select(col("symstr")).as[String].collect().head === "aa</w>")
  }
}
