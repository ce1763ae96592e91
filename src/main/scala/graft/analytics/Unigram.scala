package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Unigram-LM (SentencePiece-family) tokenizer as declarative Spark
  * operators — the EM-trained sibling of [[Bpe]] (Kudo 2018, "Subword
  * Regularization"): score candidate pieces by a unigram language model,
  * segment by Viterbi, re-estimate by EM, prune the vocabulary, repeat.
  * Where BPE GROWS a vocabulary bottom-up by greedy merges, unigram
  * SHRINKS a seeded superset top-down — the two designs bracket the
  * production tokenizer space, and t30's fertility eval compares them on
  * the same corpus.
  *
  * The exact (deterministic, engine-portable) variant implemented here:
  *
  *  1. SEED: all word substrings up to [[MaxLen]] code points, weighted by
  *     occurrence × word frequency; vocabulary = every single-code-point
  *     piece (coverage guarantee: Viterbi can always fall back to
  *     characters, so no word is unsegmentable) + the top `seedMulti`
  *     multi-char pieces by (freq DESC, piece ASC — UTF-8 byte order).
  *  2. SCORE: logp = round9(ln((c + 0.5) / (tot + 0.5·V))) — add-half
  *     smoothing over the current vocabulary; rounding at 9 dp makes the
  *     doubles engine-portable (the t09 rounded-log recipe).
  *  3. EM (Viterbi-EM, `emPre` rounds): hard-assign each distinct word its
  *     best segmentation under the current scores (DP below), count piece
  *     usage weighted by word frequency, re-score. Pieces keep vocabulary
  *     membership with count 0 — pruning is the EXPLICIT step, not a
  *     side effect.
  *  4. PRUNE: keep all single-char pieces + the top `keepMulti` multi-char
  *     pieces by (last EM count DESC, piece ASC); re-score over the pruned
  *     set (the SentencePiece seed→EM→prune→EM shape with one prune round).
  *  5. EM again (`emPost` rounds), then one final Viterbi pass under the
  *     final scores segments every distinct word for encoding.
  *
  * Viterbi DP (ties resolved so both engines and both regimes agree):
  * best(0) = 0; best(i) = max over l in 1..min(MaxLen, i) of
  * best(i−l) + logp(word[i−l+1..i]) for in-vocab pieces, candidates
  * evaluated in ASCENDING l with `>=` replacement — so the LONGEST last
  * piece wins score ties. Scores are sums of identically-rounded doubles
  * in a fixed order, hence bit-identical across engines.
  *
  * Scale shape (the [[Bpe]] argument, verbatim): ONE corpus pass builds
  * the word-frequency table; every EM/Viterbi pass runs over the
  * DISTINCT-WORD table (Zipf-bounded) with the model — at most
  * chars + seedMulti pieces — as a broadcast; encoding touches the corpus
  * once via a broadcast join against the final segmentations. Execution
  * regime is picked by the MEASURED word-table size exactly like
  * [[Bpe.train]]: under `maxDriverVocab` the EM loop runs driver-side (the
  * sentencepiece design — the loop is inherently sequential and the state
  * is model+vocabulary-sized), else the declarative distributed loop runs;
  * UnigramSpec pins bit-identical results between regimes.
  */
object Unigram {

  /** Maximum piece length in code points (seed enumeration and DP lookback). */
  val MaxLen = 4

  // ── shared scoring formula ──

  /** Smoothed log-prob over a counted vocabulary `(pc, c)`:
    * round9(ln((c + 0.5) / (tot + 0.5·V))). The operand order is the
    * cross-engine contract — driver and SQL twins compute the identical
    * double expression.
    */
  private def rescore(vc: DataFrame): DataFrame = {
    val tots = vc.agg(sum(col("c")).cast("double").as("tot"),
      count(lit(1)).cast("double").as("v"))
    vc.crossJoin(broadcast(tots)) // 1-row scalar broadcast
      .select(col("pc"),
        round(log((col("c").cast("double") + lit(0.5)) /
          (col("tot") + lit(0.5) * col("v"))), 9).as("lp"))
  }

  /** All substring occurrences (WITH multiplicity) of the word table up to
    * [[MaxLen]] code points: `(word, freq, pc)`.
    */
  private def substrOcc(wf: DataFrame): DataFrame =
    wf.select(col("word"), col("freq"),
      explode(flatten(transform(sequence(lit(1), length(col("word"))),
        i => transform(
          sequence(lit(1), least(lit(MaxLen), length(col("word")) - i + 1)),
          l => col("word").substr(i, l))))).as("pc"))

  /** Viterbi segmentation of `word` given `es` (the word's in-vocab
    * substrings with scores, as array<struct<pc,lp>>): the DP documented
    * in the class scaladoc as one `aggregate` fold over positions, each
    * step an inner fold over lookback lengths. Both arguments MUST be
    * materialized attributes (the HOF-lambda rule). Returns the
    * space-joined piece string.
    */
  private[graft] def viterbiSeg(word: Column, es: Column): Column = {
    val dp = aggregate(
      sequence(lit(1), length(word)),
      array(struct(lit(0.0).as("s"), lit("").as("g"))),
      (acc, i) => array_append(acc,
        aggregate(
          sequence(lit(1), least(lit(MaxLen), i)),
          struct(lit(-1e18).as("s"), lit("").as("g")),
          (b, l) => {
            val pc = word.substr(i - l + lit(1), l)
            val hit = filter(es, e => e.getField("pc") === pc)
            val prev = element_at(acc, i - l + lit(1))
            val cs = prev.getField("s") + element_at(hit, 1).getField("lp")
            when(size(hit) > 0 && cs >= b.getField("s"),
              struct(cs.as("s"),
                concat(prev.getField("g"), lit(" "), pc).as("g")))
              .otherwise(b)
          })))
    ltrim(element_at(dp, length(word) + 1).getField("g"))
  }

  /** One distributed Viterbi pass: segment every word of `wf` under
    * `vocab` scores. `wpc` is the precomputed distinct (word, pc)
    * substring table (invariant across rounds — computed once, persisted
    * by the caller).
    */
  private def segmentAll(wf: DataFrame, wpc: DataFrame, vocab: DataFrame): DataFrame = {
    val ent = wpc.join(broadcast(vocab), Seq("pc"))
      .groupBy(col("word")).agg(collect_list(struct(col("pc"), col("lp"))).as("es"))
    wf.join(ent, Seq("word"))
      .select(col("word"), col("freq"),
        viterbiSeg(col("word"), col("es")).as("seg"))
  }

  /** One EM round: Viterbi counts under the current scores, membership
    * preserved (count 0 for unused pieces). Returns the COUNTED vocabulary
    * `(pc, c)` — callers re-score and/or prune it.
    */
  private def emCounts(wf: DataFrame, wpc: DataFrame, vocab: DataFrame): DataFrame = {
    val cnt = segmentAll(wf, wpc, vocab)
      .select(col("freq"), explode(split(col("seg"), " ")).as("pc"))
      .groupBy(col("pc")).agg(sum(col("freq")).as("c"))
    vocab.select(col("pc")).join(cnt, Seq("pc"), "left")
      .select(col("pc"), coalesce(col("c"), lit(0L)).as("c"))
  }

  /** Train the unigram model; returns (pieces `(pc, lp)`, segmentations
    * `(word, seg)` of every corpus word under the final scores). Regime
    * picked by the measured word-table size (see class scaladoc); results
    * are bit-identical between regimes.
    */
  def train(docs: DataFrame, seedMulti: Int = 200, keepMulti: Int = 100,
      emPre: Int = 2, emPost: Int = 1, textCol: String = "text",
      maxDriverVocab: Long = 1L << 20): (DataFrame, DataFrame) = {
    val wf = Bpe.wordFreqs(docs, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try trainFromWordFreqs(wf, seedMulti, keepMulti, emPre, emPost, maxDriverVocab)
    finally wf.unpersist(blocking = false)
  }

  /** [[train]] over a CALLER-OWNED word-frequency table (the Bpe
    * `trainFromWordFreqs` seam — see there): t30 trains BPE and unigram
    * on the SAME persisted table, paying the corpus pass once. The
    * caller persists `wf`.
    */
  def trainFromWordFreqs(wf: DataFrame, seedMulti: Int = 200, keepMulti: Int = 100,
      emPre: Int = 2, emPost: Int = 1,
      maxDriverVocab: Long = 1L << 20): (DataFrame, DataFrame) = {
    val cap = math.min(maxDriverVocab, Int.MaxValue - 1L).toInt
    if (maxDriverVocab > 0L && wf.limit(cap + 1).count() <= maxDriverVocab)
      trainDriver(wf, seedMulti, keepMulti, emPre, emPost)
    else trainDistributed(wf, seedMulti, keepMulti, emPre, emPost)
  }

  private def trainDistributed(wf: DataFrame, seedMulti: Int, keepMulti: Int,
      emPre: Int, emPost: Int): (DataFrame, DataFrame) = {
    // ONE substring-explosion pass (r15 verdict task 7): the former shape
    // exploded substrOcc twice — once for the seed counts, once for the
    // distinct (word, pc) table — so the widest frame in the trainer was
    // built and shuffled twice. The shared persisted table now carries
    // (word, freq, pc, occ_n); the EM-loop join reads its projection and
    // the seed counts fold occ_n × freq (exact integer sums — identical
    // values, bit-identical scores).
    val wpcCnt = substrOcc(wf)
      .groupBy(col("word"), col("freq"), col("pc"))
      .agg(count(lit(1)).as("occ_n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val wpc = wpcCnt.select(col("word"), col("pc"))
    try {
      val pf = wpcCnt.groupBy(col("pc"))
        .agg(sum(col("freq") * col("occ_n")).as("c"))
      val seed = pf.where(length(col("pc")) === 1).unionByName(
        pf.where(length(col("pc")) >= 2)
          .orderBy(col("c").desc, col("pc")).limit(seedMulti))
      var vocab = rescore(seed).localCheckpoint(eager = false)
      var lastCounts: DataFrame = null
      for (_ <- 1 to emPre) {
        lastCounts = emCounts(wf, wpc, vocab).localCheckpoint(eager = false)
        vocab = rescore(lastCounts).localCheckpoint(eager = false)
      }
      val pruned = lastCounts.where(length(col("pc")) === 1).unionByName(
        lastCounts.where(length(col("pc")) >= 2)
          .orderBy(col("c").desc, col("pc")).limit(keepMulti))
      vocab = rescore(pruned).localCheckpoint(eager = false)
      for (_ <- 1 to emPost) {
        vocab = rescore(emCounts(wf, wpc, vocab)).localCheckpoint(eager = false)
      }
      val segs = segmentAll(wf, wpc, vocab).select(col("word"), col("seg"))
      // final segmentations feed encode's broadcast join (and tests) more
      // than once — pin them before the substring table is released
      (vocab, segs.localCheckpoint(eager = true))
    } finally wpcCnt.unpersist(blocking = false)
  }

  // ── driver regime (the sequential EM loop in memory; bit-identical) ──

  /** Spark's Round(double, 9): HALF_UP on the shortest-decimal BigDecimal. */
  private def round9(x: Double): Double =
    BigDecimal(x).setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** word → code-point pieces (the [[Bpe.train]] driver-regime lesson:
    * Spark's substr/length count code points, so UTF-16 code-unit slicing
    * would diverge on non-BMP text).
    */
  private def cpSyms(w: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  private def scoreLocal(vc: Seq[(String, Long)]): Map[String, Double] = {
    var tot = 0L
    vc.foreach(tot += _._2)
    val v = vc.size.toDouble
    val td = tot.toDouble
    vc.map { case (pc, c) =>
      pc -> round9(math.log((c.toDouble + 0.5) / (td + 0.5 * v)))
    }.toMap
  }

  /** The DP of [[viterbiSeg]], verbatim: l ascending, `>=` replacement. */
  private def viterbiLocal(cps: Vector[String],
      lp: Map[String, Double]): String = {
    val n = cps.length
    val s = new Array[Double](n + 1)
    val g = new Array[String](n + 1)
    g(0) = ""
    var i = 1
    while (i <= n) {
      var bs = -1e18
      var bg = ""
      var l = 1
      val lmax = math.min(MaxLen, i)
      while (l <= lmax) {
        val pc = cps.slice(i - l, i).mkString
        lp.get(pc) match {
          case Some(p) =>
            val cs = s(i - l) + p
            if (cs >= bs) { bs = cs; bg = g(i - l) + " " + pc }
          case None =>
        }
        l += 1
      }
      s(i) = bs; g(i) = bg
      i += 1
    }
    g(n).stripPrefix(" ")
  }

  private def topMulti(counts: collection.Map[String, Long], k: Int): Seq[(String, Long)] =
    counts.toSeq
      .filter { case (pc, _) => pc.codePointCount(0, pc.length) >= 2 }
      .sortWith { case ((pa, ca), (pb, cb)) =>
        ca > cb || (ca == cb && Bpe.utf8Lt(pa, pb))
      }
      .take(k)

  private def trainDriver(wf: DataFrame, seedMulti: Int, keepMulti: Int,
      emPre: Int, emPost: Int): (DataFrame, DataFrame) = {
    val spark = wf.sparkSession
    val words: Array[(Vector[String], Long)] =
      wf.collect().map(r => (cpSyms(r.getString(0)), r.getLong(1)))
    // seed counts: every substring occurrence up to MaxLen, freq-weighted
    val pf = scala.collection.mutable.HashMap.empty[String, Long]
    words.foreach { case (cps, f) =>
      val n = cps.length
      var i = 0
      while (i < n) {
        var l = 1
        val lmax = math.min(MaxLen, n - i)
        while (l <= lmax) {
          val pc = cps.slice(i, i + l).mkString
          pf.update(pc, pf.getOrElse(pc, 0L) + f)
          l += 1
        }
        i += 1
      }
    }
    val chars = pf.toSeq.filter { case (pc, _) => pc.codePointCount(0, pc.length) == 1 }
    var vc: Seq[(String, Long)] = chars ++ topMulti(pf, seedMulti)
    var lp = scoreLocal(vc)

    def emRound(): collection.Map[String, Long] = {
      val cnt = scala.collection.mutable.HashMap.empty[String, Long]
      words.foreach { case (cps, f) =>
        viterbiLocal(cps, lp).split(" ").foreach { pc =>
          cnt.update(pc, cnt.getOrElse(pc, 0L) + f)
        }
      }
      cnt
    }

    var lastCnt: collection.Map[String, Long] = null
    for (_ <- 1 to emPre) {
      lastCnt = emRound()
      vc = vc.map { case (pc, _) => (pc, lastCnt.getOrElse(pc, 0L)) }
      lp = scoreLocal(vc)
    }
    val counted = vc.toMap
    vc = vc.filter { case (pc, _) => pc.codePointCount(0, pc.length) == 1 } ++
      topMulti(counted, keepMulti)
    lp = scoreLocal(vc)
    for (_ <- 1 to emPost) {
      val cnt = emRound()
      vc = vc.map { case (pc, _) => (pc, cnt.getOrElse(pc, 0L)) }
      lp = scoreLocal(vc)
    }
    val segs = words.map { case (cps, _) =>
      (cps.mkString, viterbiLocal(cps, lp))
    }
    import spark.implicits._
    (lp.toSeq.toDF("pc", "lp"), segs.toSeq.toDF("word", "seg"))
  }

  /** Deterministic token-id table: lexicographic rank over ALL final
    * vocabulary pieces (the model IS the id table), via the shared
    * range-partitioned rank recipe.
    */
  def pieceIds(pieces: DataFrame): DataFrame =
    Bpe.lexRankIds(pieces.select(col("pc")), "pc", "tok_id")

  /** Encode documents against the trained model: per document the unigram
    * token count and the comma-joined token-id sequence in token order
    * (the [[Bpe.encode]] collect + array_sort recipe). `segs` must cover
    * every corpus word (true when encoding the training corpus — t32's
    * case); segmentations and the id table broadcast, the corpus is
    * tokenized once. Token-less documents encode to (0, "").
    */
  def encode(docs: DataFrame, pieces: DataFrame, segs: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ids = pieceIds(pieces)
    val toks = Par.spreadForCpu(docs)
      .select(col(idCol), posexplode(TextAnalysis.tokens(col(textCol)))
        .as(Seq("pos", "word")))
    val enc = toks
      .join(broadcast(segs.select(col("word"), split(col("seg"), " ").as("syms"))),
        Seq("word"))
      .select(col(idCol), col("pos"), posexplode(col("syms")).as(Seq("spos", "pc")))
      .join(broadcast(ids), Seq("pc"))
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("pos"), col("spos"), col("tok_id"))).as("ts"))
      .select(col(idCol),
        transform(array_sort(col("ts")), x => x.getField("tok_id").cast("string")).as("ids"))
      .select(col(idCol), size(col("ids")).cast(LongType).as("n_uni"),
        array_join(col("ids"), ",").as("ids_str"))
    docs.select(col(idCol)).join(enc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_uni"), lit(0L)).as("n_uni"),
        coalesce(col("ids_str"), lit("")).as("ids_str"))
  }
}
