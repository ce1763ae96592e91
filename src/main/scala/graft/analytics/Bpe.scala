package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Byte-pair-encoding tokenizer as declarative Spark operators — the
  * training-data primitive the catalog previously only ESTIMATED (t03's
  * ~4-chars-per-token heuristic): train a merge table over the corpus,
  * then encode documents to real subword token ids.
  *
  * Algorithm (Sennrich et al. 2016, "Neural Machine Translation of Rare
  * Words with Subword Units"): start from characters plus an end-of-word
  * marker, repeatedly merge the most frequent adjacent symbol pair. Both
  * phases are DETERMINISTIC here — a fixed number of merge rounds, pair
  * ranking by (count DESC, pair lexicographic ASC), and greedy
  * left-to-right merge application — so an independent engine can replay
  * the exact merge sequence and reproduce every token id (the t11 oracle
  * does, in SQL).
  *
  * Scale shape (the reason BPE training is tractable at 100 TB): after ONE
  * corpus pass builds the word-frequency table, every training round runs
  * over the DISTINCT-WORD vocabulary — Zipf-bounded (millions of rows for
  * a 100 TB corpus, not trillions) and shrinking-in-symbols as merges
  * land. Per round: one vocabulary-sized pair-count aggregation, a
  * driver-side argmax of ONE row (a control decision over a 2-string
  * value — the FieldRegistry precedent, not a data collect), and one
  * vocabulary-sized projection applying the merge. Lazy localCheckpoints
  * (the d07 CC discipline) keep lineage flat across rounds; the next
  * round's argmax job materializes the previous round's state as a side
  * effect. Encoding touches the corpus once via a broadcast join against
  * the trained vocabulary (every in-vocab word's final segmentation is
  * already the training fixpoint); out-of-vocabulary words — absent when
  * encoding the training corpus itself — replay the merge list via
  * [[applyMerge]], a per-row column fold.
  *
  * Symbol strings ride as ONE space-delimited string column (tokens are
  * whitespace-split, so a space can never occur inside a symbol): the
  * merge step is then a single string fold per word instead of an
  * array-rebuild, and the encoding split is one `split(' ')`.
  *
  * Production note on the top-1 loop: each merge round ends in an
  * `orderBy.limit(1)` argmax — inherently sequential, rounds × one
  * driver round-trip. At real scale you would TRAIN the merge table on
  * a corpus SAMPLE (tokenizer quality saturates far below full-corpus
  * counts — the standard practice for production tokenizers) and only
  * ENCODE the full corpus; encoding is the embarrassingly parallel
  * broadcast-join pass. q36's deterministic stratified sampler is the
  * in-repo sampling primitive for exactly that.
  */
object Bpe {

  /** End-of-word marker symbol (a real symbol, merged like any other, so
    * word-final subwords are distinguishable from word-internal ones).
    */
  val EndMark = "</w>"

  /** One learned merge: adjacent symbol pair (a, b) → symbol `a+b`. */
  final case class Merge(a: String, b: String)

  /** word → initial symbol string: characters joined by ' ', then the
    * end-of-word marker.
    */
  def initialSymstr(word: Column): Column =
    concat(
      array_join(transform(sequence(lit(1), length(word)),
        i => substr(word, i, lit(1))), " "),
      lit(" " + EndMark))

  /** Apply one merge to a symbol ARRAY attribute: greedy left-to-right
    * non-overlapping pair replacement (the canonical BPE application
    * order), expressed as a string fold — when the accumulator's LAST
    * symbol is exactly `a` (i.e. it ends with `' ' + a`, or IS `a` right
    * at the start) and the next symbol is `b`, append `b` without a
    * delimiter, fusing the pair. Re-merging across a fresh fuse is
    * impossible by construction: the fused symbol `a+b` no longer ends
    * with `' ' + a`. `syms` MUST be a materialized attribute (the
    * HOF-lambda rule); returns the merged space-delimited symbol string.
    */
  def applyMerge(syms: Column, m: Merge): Column =
    when(size(syms) <= 1, array_join(syms, " "))
      .otherwise(aggregate(
        slice(syms, lit(2), size(syms) - 1),
        element_at(syms, 1),
        (acc, x) =>
          when(x === lit(m.b) && (acc === lit(m.a) || acc.endsWith(lit(" " + m.a))),
            concat(acc, x))
            .otherwise(concat(acc, lit(" "), x))))

  /** Segment words through a trained merge list — the out-of-vocabulary
    * path: initial character symstr, then every merge applied in training
    * order (BPE's canonical OOV recipe — an unseen word segments exactly
    * as it would have had it been in the training corpus with frequency
    * 0). One projection per merge over the DISTINCT missing-word set
    * (batch-OOV-sized, never corpus-sized); a lazy localCheckpoint every
    * 16 merges bounds the collapsed expression depth for long merge
    * lists.
    */
  def segmentWords(words: DataFrame, merges: Seq[Merge]): DataFrame = {
    var df = words.select(col("word"), initialSymstr(col("word")).as("symstr"))
    merges.zipWithIndex.foreach { case (m, i) =>
      df = df.select(col("word"), split(col("symstr"), " ").as("syms"))
        .select(col("word"), applyMerge(col("syms"), m).as("symstr"))
      if ((i + 1) % 16 == 0) df = df.localCheckpoint(eager = false)
    }
    df
  }

  /** Word-frequency table of the corpus (the ONE corpus-sized pass of
    * training).
    */
  def wordFreqs(docs: DataFrame, textCol: String = "text"): DataFrame =
    Par.spreadForCpu(docs)
      .select(explode(TextAnalysis.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Train `nMerges` rounds; returns the learned merge list (in
    * application order) and the final vocabulary state
    * `(word, freq, symstr)`. Stops early if the vocabulary is fully
    * merged (no adjacent pair remains); ranking ties break
    * lexicographically on (a, b) — UTF-8 byte order, Spark's string
    * ordering — so the sequence is reproducible on any engine with the
    * same word set.
    *
    * Execution regime, picked by the MEASURED word-table size (the d32
    * probe philosophy): after the ONE distributed corpus pass builds the
    * word-frequency table, a vocabulary under `maxDriverVocab` (default
    * 2²⁰ words) trains DRIVER-SIDE — the standard BPE-trainer design
    * (sentencepiece/HF hold exactly this table in memory), and the only
    * correct one for a merge loop that is inherently sequential: the
    * former per-round Spark jobs spent ~0.2 s of scheduling per merge on
    * a vocabulary-row table (measured: the whole t11/t13/t30 family was
    * merge-loop-bound). Results are bit-identical between regimes
    * (BpeSpec asserts it); a larger vocabulary falls back to the
    * distributed per-round loop.
    */
  def train(docs: DataFrame, nMerges: Int, textCol: String = "text",
      maxDriverVocab: Long = 1L << 20): (Seq[Merge], DataFrame) = {
    // Persist wf across probe + training: `limit(cap+1).count()` runs
    // the full word-frequency aggregation underneath (limit above an
    // aggregate does not short-circuit it), so without the cache the
    // regime probe plus trainDriver's collect (or the distributed
    // loop's first round) would scan the corpus TWICE where the
    // contract promises ONE pass. The cached table is the Zipf-bounded
    // vocabulary, not the corpus.
    val wf = wordFreqs(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try trainFromWordFreqs(wf, nMerges, maxDriverVocab)
    finally wf.unpersist(blocking = false)
  }

  /** [[train]] over a CALLER-OWNED word-frequency table — the seam that
    * lets a pipeline training several tokenizers on the same corpus
    * (t30's BPE-vs-unigram comparison) pay the corpus pass ONCE and feed
    * both trainers the shared table. The caller is responsible for
    * persisting `wf` (the regime probe and the training loop both read
    * it; unpersisted, each read re-runs the corpus aggregation).
    */
  def trainFromWordFreqs(wf: DataFrame, nMerges: Int,
      maxDriverVocab: Long = 1L << 20): (Seq[Merge], DataFrame) = {
    val cap = math.min(maxDriverVocab, Int.MaxValue - 1L).toInt
    if (maxDriverVocab > 0L && wf.limit(cap + 1).count() <= maxDriverVocab)
      trainDriver(wf, nMerges)
    else trainDistributed(wf, nMerges)
  }

  /** Greedy left-to-right non-overlapping merge application on a symbol
    * sequence — the driver twin of [[applyMerge]]'s string fold (the
    * fold's fused symbol can never re-match `a` within the same pass, so
    * the two are equivalent; BpeSpec pins it).
    */
  private def applyMergeLocal(syms: Vector[String], m: Merge): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == m.a && syms(i + 1) == m.b) {
        out += m.a + m.b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  /** Spark compares strings by UNSIGNED UTF-8 bytes (UTF8String's
    * binary order); the driver loop must break count ties identically.
    * `Arrays.compare` on byte[] is SIGNED — it would sort any non-ASCII
    * symbol (lead byte ≥ 0x80 → negative) BEFORE ascii, inverting
    * Spark's order for every non-ASCII tie — so this must be the
    * unsigned variant (BpeSpec's non-BMP parity fixture pins it).
    */
  private[analytics] def utf8Lt(x: String, y: String): Boolean =
    java.util.Arrays.compareUnsigned(
      x.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      y.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0

  /** word → initial symbols by UNICODE CODE POINT — the driver twin of
    * [[initialSymstr]]. Spark's `length`/`substr` count code points, so
    * a `String.map(_.toString)` split (UTF-16 code units) would cut a
    * non-BMP character (emoji, supplementary CJK) into two lone
    * surrogates — divergent initial symbols, divergent merges, and a
    * broken bit-identical regime contract (worse, `utf8Lt`'s
    * getBytes(UTF_8) maps lone surrogates to '?', colliding tie-breaks).
    * BpeSpec's regime-parity fixture includes a non-BMP word to pin this.
    */
  private def codePointSyms(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  private def trainDriver(wf: DataFrame, nMerges: Int): (Seq[Merge], DataFrame) = {
    val spark = wf.sparkSession
    var vocab: Array[(String, Long, Vector[String])] = wf.collect()
      .map(r => (r.getString(0), r.getLong(1),
        codePointSyms(r.getString(0)) :+ EndMark))
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 0
    var exhausted = false
    while (round < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      vocab.foreach { case (_, f, syms) =>
        var i = 0
        while (i + 1 < syms.length) {
          val key = (syms(i), syms(i + 1))
          counts.update(key, counts.getOrElse(key, 0L) + f)
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        var best: ((String, String), Long) = null
        counts.foreach { kv =>
          if (best == null || kv._2 > best._2 ||
            (kv._2 == best._2 && (utf8Lt(kv._1._1, best._1._1) ||
              (kv._1._1 == best._1._1 && utf8Lt(kv._1._2, best._1._2)))))
            best = kv
        }
        val m = Merge(best._1._1, best._1._2)
        merges += m
        vocab = vocab.map { case (w, f, syms) => (w, f, applyMergeLocal(syms, m)) }
      }
      round += 1
    }
    import spark.implicits._
    val vdf = vocab.toSeq
      .map { case (w, f, syms) => (w, f, syms.mkString(" ")) }
      .toDF("word", "freq", "symstr")
    (merges.toSeq, vdf)
  }

  private def trainDistributed(wf: DataFrame,
      nMerges: Int): (Seq[Merge], DataFrame) = {
    var vocab = wf
      .select(col("word"), col("freq"), initialSymstr(col("word")).as("symstr"))
      .localCheckpoint(eager = false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var exhausted = false
    var round = 0
    while (round < nMerges && !exhausted) {
      // pair counts over the vocabulary, weighted by word frequency; the
      // adjacent-pair window reads the token array as an ATTRIBUTE (syms)
      val top = vocab
        .select(col("freq"), split(col("symstr"), " ").as("syms"))
        .where(size(col("syms")) >= 2)
        .select(col("freq"), explode(transform(sequence(lit(0), size(col("syms")) - 2),
          j => struct(element_at(col("syms"), j + 1).as("a"),
            element_at(col("syms"), j + 2).as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val m = Merge(top(0).getString(0), top(0).getString(1))
        merges += m
        vocab = vocab
          .select(col("word"), col("freq"), split(col("symstr"), " ").as("syms"))
          .select(col("word"), col("freq"), applyMerge(col("syms"), m).as("symstr"))
          .localCheckpoint(eager = false)
      }
      round += 1
    }
    (merges.toSeq, vocab)
  }

  /** Deterministic token-id table from a trained vocabulary: the distinct
    * final symbols, ids assigned in lexicographic order.
    *
    * tok_id = global lexicographic rank, computed WITHOUT a global
    * single-partition window (the r10 `WindowExec: No Partition Defined`
    * tail): range-repartition on the symbol puts each partition on a
    * contiguous key range in partition order, a PARTITIONED window ranks
    * locally in parallel, and per-partition populations — a
    * numPartitions-row control table — prefix-sum on the driver (the
    * FieldRegistry one-row-decision precedent) into broadcast offsets.
    * The assigned ids are independent of where the sampled range
    * boundaries fall: local rank + preceding-partition population IS the
    * global rank for any contiguous ordered partitioning.
    */
  def tokenIds(vocab: DataFrame): DataFrame =
    lexRankIds(
      vocab.select(explode(split(col("symstr"), " ")).as("tokstr")).distinct(),
      "tokstr", "tok_id")

  /** Global lexicographic rank ids over a DISTINCT string column, WITHOUT
    * a global single-partition window (the recipe [[tokenIds]] documents):
    * range-repartition → partition-local rank → driver prefix-sum of the
    * numPartitions-row population table → broadcast offsets. Shared with
    * [[Unigram.pieceIds]].
    */
  private[analytics] def lexRankIds(distinctDf: DataFrame, in: String,
      out: String): DataFrame = {
    val parts = distinctDf
      .repartitionByRange(col(in))
      .withColumn("pid", spark_partition_id())
      // materialize once: the count job and the rank pass must see the
      // SAME sampled range boundaries (a recompute may re-sample)
      .localCheckpoint(eager = false)
    val counts = parts.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, cnt) => val o = acc; acc += cnt; (pid, o) }
    val offsetsDf = distinctDf.sparkSession.createDataFrame(offsets.toSeq)
      .toDF("pid", "offset")
    parts
      .withColumn("lrank",
        row_number().over(Window.partitionBy(col("pid")).orderBy(col(in))))
      .join(broadcast(offsetsDf), Seq("pid"))
      .select(col(in),
        (col("offset") + col("lrank") - 1).cast(LongType).as(out))
  }

  /** Encode documents against a trained vocabulary: per document, the
    * real BPE token count, the comma-joined token-id sequence (in token
    * order — collect + array_sort on (pos, spos), the t09
    * position-determinism recipe), and the unknown-subword count. The
    * corpus is tokenized once (the OOV path persists it across its two
    * consumers); segmentations and id table broadcast.
    * Documents with no tokens encode to (0, "", 0).
    *
    * Out-of-vocabulary words: with `merges` supplied, words absent from
    * `vocab` are segmented by [[segmentWords]] (merge-list replay over
    * the distinct missing words — a batch-OOV-sized side table unioned
    * into the broadcast). Resulting subword strings the training run
    * never produced (novel characters, unmerged partials) map to
    * `unkId`. With `merges` empty the caller asserts every corpus word
    * is in `vocab` (true when encoding the training corpus itself) and
    * absent words are silently dropped, as before.
    */
  def encode(docs: DataFrame, vocab: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      merges: Seq[Merge] = Nil, unkId: Long = -1L): DataFrame = {
    val ids = tokenIds(vocab)
    val toks0 = Par.spreadForCpu(docs)
      .select(col(idCol), posexplode(TextAnalysis.tokens(col(textCol)))
        .as(Seq("pos", "word")))
    // the OOV path consumes the tokenized corpus TWICE (missing-word
    // derivation + the segmentation join) — persist so the
    // tokenize/explode pass runs once (minhashCandidates' documented
    // cache lifecycle: deduped by plan, released by clearCache)
    val toks = if (merges.isEmpty) toks0
      else toks0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vocabSegs = vocab.select(col("word"), split(col("symstr"), " ").as("syms"))
    val segs =
      if (merges.isEmpty) vocabSegs
      else vocabSegs.unionByName(
        segmentWords(
          toks.select(col("word")).distinct()
            .join(vocab.select(col("word")), Seq("word"), "left_anti"),
          merges)
          .select(col("word"), split(col("symstr"), " ").as("syms")))
    val sub = toks
      .join(broadcast(segs), Seq("word"))
      .select(col(idCol), col("pos"), posexplode(col("syms")).as(Seq("spos", "tokstr")))
      .join(broadcast(ids), Seq("tokstr"), "left")
      .select(col(idCol), col("pos"), col("spos"),
        coalesce(col("tok_id"), lit(unkId)).as("tok_id"))
    val enc = sub
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("pos"), col("spos"), col("tok_id"))).as("ts"),
        sum(when(col("tok_id") === lit(unkId), 1L).otherwise(0L)).as("n_unk"))
      .select(col(idCol),
        transform(array_sort(col("ts")), x => x.getField("tok_id").cast("string")).as("ids"),
        col("n_unk"))
      .select(col(idCol), size(col("ids")).cast(LongType).as("n_bpe"),
        array_join(col("ids"), ",").as("ids_str"), col("n_unk"))
    docs.select(col(idCol)).join(enc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bpe"), lit(0L)).as("n_bpe"),
        coalesce(col("ids_str"), lit("")).as("ids_str"),
        coalesce(col("n_unk"), lit(0L)).as("n_unk"))
  }
}
