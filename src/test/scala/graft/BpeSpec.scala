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
    val rows = enc.orderBy(col("doc_id")).as[(Long, Long, String)].collect()
    val reconstructed = rows.map { case (_, n, s) =>
      val toks = if (s.isEmpty) Array.empty[String]
        else s.split(",").map(i => idToTok(i.toLong))
      assert(toks.length === n)
      toks.mkString("").split(java.util.regex.Pattern.quote(Bpe.EndMark))
        .filter(_.nonEmpty).mkString(" ")
    }
    assert(reconstructed.toSeq === Seq("table scan joins the table", "merge sort merge", ""))
  }

  test("train stops early on a fully-merged vocabulary") {
    val docs = Seq((1L, "aa aa aa")).toDF("doc_id", "text")
    // "aa </w>" needs 2 merges to a single symbol; further rounds no-op
    val (merges, vocab) = Bpe.train(docs, nMerges = 10)
    assert(merges.length === 2)
    assert(vocab.select(col("symstr")).as[String].collect().head === "aa</w>")
  }
}
