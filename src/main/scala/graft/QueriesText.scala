package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.analytics.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.functions.NetFunctions
import graft.QueryHelpers._

/** Text-analysis family (t01-t24): language-ID, quality scoring,
  * token statistics, LMs (unigram/bigram/Kneser-Ney), BPE, retrieval
  * (BM25+RRF), normalization and boilerplate removal.
  *
  * Extracted from the original single-file SparkEntry catalog; the
  * driver contract is unchanged — [[SparkEntry.queries]] and
  * [[SparkEntry.oracleSql]] concatenate the family maps. Shared
  * helpers (including the numeric-portability conventions documented
  * on [[SparkEntry]]) live in [[QueryHelpers]].
  */
private[graft] object QueriesText {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(


    // Text: language-ID heuristic (stopword-marker voting). Tokenization is
    // materialized once per row on its own projection (the voting reads the
    // token array ~12×), input spread to one task per core.
    "t01_langid" -> ((s, dir) => {
      analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
        .select(col("doc_id"), TextAnalysis.langIdFromTokens(col("ws")).as("lang_pred"))
        .orderBy(col("doc_id"))
    }),


    // Text: quality features + composite score (pure per-row arithmetic).
    "t02_quality" -> ((s, dir) => {
      analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(col("doc_id"), col("text"), TextAnalysis.tokens(col("text")).as("ws"))
        .select(
          col("doc_id"),
          TextAnalysis.tokenCountFromTokens(col("ws")).as("n_tokens"),
          TextAnalysis.avgWordLenFromTokens(col("ws")).as("avg_word_len"),
          TextAnalysis.punctRatio(col("text")).as("punct_ratio"),
          TextAnalysis.stopwordRatioFromTokens(col("ws")).as("stopword_ratio"),
          TextAnalysis.qualityScoreFromTokens(col("text"), col("ws")).as("quality"))
        .orderBy(col("doc_id"))
    }),


    // Text: token counting (whitespace + BPE-ish estimate) per language.
    "t03_token_count" -> ((s, dir) => {
      analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(col("lang"), TextAnalysis.tokens(col("text")).as("ws"))
        .select(col("lang"), TextAnalysis.tokenCountFromTokens(col("ws")).as("n_tok"),
          TextAnalysis.bpeTokenEstimateFromTokens(col("ws")).as("bpe"))
        .groupBy(col("lang"))
        .agg(sum(col("n_tok")).as("total_tokens"),
          sum(col("bpe")).as("total_bpe_est"),
          count(lit(1)).as("n_docs"))
        .orderBy(col("lang"))
    }),


    // Text: order-sensitive rolling-hash fingerprint, xxhash64 family (the
    // fused native-expression production path; t07 below carries the
    // hash-matched md5 fold values). Contract twin: distinct-fingerprint
    // cardinality — the count of distinct token SEQUENCES, identical
    // across base-hash families absent differential collisions — is
    // value-compared against DuckDB's count over the md5 fold, and
    // card_agree is Spark's own xx-vs-md5 equality check.
    "t04_rolling_fingerprint" -> ((s, dir) => {
      // ONE scan + ONE tokenize pass feeds BOTH family folds as sibling
      // projections of the same row, and ONE aggregate carries both
      // countDistincts — the round-9 shape (two separate aggregates
      // crossJoined) re-scanned and re-tokenized the corpus per family,
      // doubling the dominant cost (regex tokenization) to carry the
      // cross-family card_agree contract
      val toks = analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
      val cards = toks
        .select(TextAnalysis.rollingHashFromTokens(s, col("ws")).as("fp_xx"),
          TextAnalysis.rollingHashPortableFromTokens(col("ws")).as("fp_md5"))
        .agg(countDistinct(col("fp_xx")).as("fp_card"),
          countDistinct(col("fp_md5")).as("md5_card"))
        .select(col("fp_card"), (col("fp_card") === col("md5_card")).as("card_agree"))
      toks.select(col("doc_id")).crossJoin(cards) // 1-row scalar broadcast
        .orderBy(col("doc_id"))
    }),


    // Text: the rolling fingerprint with the PORTABLE md5-low64 token hash —
    // the oracle-checked representative of the fingerprint family (the
    // DuckDB twin folds the same base-1000003 multiply-add with HUGEINT
    // wraparound; cf. d08/d10 for simhash/minhash).
    "t07_rolling_fingerprint_portable" -> ((s, dir) => {
      analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
        .select(col("doc_id"), TextAnalysis.rollingHashPortableFromTokens(col("ws")).as("fp64"))
        .orderBy(col("doc_id"))
    }),


    // Quality: within-document repetition (the Gopher-style duplicate
    // n-gram rule) — RAW 3-gram multiplicity per row, no shuffle; the
    // keep flag compares the 6-dp-ROUNDED fraction so the keep/drop
    // boundary is bit-identical cross-engine. BOTH the token array and
    // the gram array cross projection boundaries as attributes — the
    // expression-shape rule: the ngram lambda reads `ws` per element, so
    // an inlined tokens(text) subtree would re-tokenize O(tokens) times
    // per row (first cut of this query: 58 s at sf0.1 vs 0.7 s fixed).
    "t08_repetition" -> ((s, dir) => {
      analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
        .select(col("doc_id"), TextAnalysis.ngramsFromTokens(col("ws"), 3).as("g"))
        .select(col("doc_id"),
          size(col("g")).cast("long").as("n_grams"),
          size(array_distinct(col("g"))).cast("long").as("n_distinct"))
        .select(col("doc_id"), col("n_grams"), col("n_distinct"),
          TextAnalysis.repetitionFraction(col("n_grams"), col("n_distinct")).as("dup_frac"))
        .withColumn("keep", col("dup_frac") <= 0.2)
        .orderBy(col("doc_id"))
    }),


    // Text: top-5 terms per language — corpus term-frequency statistics
    // (explode → two-level agg → per-group top-k window).
    "t06_top_terms" -> ((s, dir) => {
      val tok = analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("token"))
      val counts = tok.groupBy(col("lang"), col("token")).agg(count(lit(1)).as("n"))
      val w = Window.partitionBy(col("lang")).orderBy(col("n").desc, col("token"))
      counts.withColumn("rnk", row_number().over(w).cast("bigint"))
        .where(col("rnk") <= 5)
        .select(col("lang"), col("rnk"), col("token"), col("n"))
        .orderBy(col("lang"), col("rnk"))
    }),


    // Unigram LM quality score: corpus-self-trained token frequencies →
    // per-doc mean log-probability (the CCNet/Gopher perplexity-proxy
    // filter). Cross-engine float determinism is engineered: 9-dp-rounded
    // per-token log-probs, position-ordered left-fold summation, 6-dp
    // display rounding (see TextAnalysis.unigramLogProbScores).
    "t09_ppl" -> ((s, dir) =>
      TextAnalysis.unigramLogProbScores(t(s, dir, "documents"))
        .orderBy(col("doc_id"))),


    // Model-based quality, one order deeper: corpus-self-trained bigram
    // LM with add-half smoothing (t09's determinism recipe on the float
    // path; word-order-sensitive where the unigram is not).
    "t10_lm2" -> ((s, dir) =>
      TextAnalysis.bigramLogProbScores(t(s, dir, "documents"))
        .orderBy(col("doc_id"))),


    // BPE tokenizer, trained AND applied — real subword token ids, not
    // t03's ~4-chars/token estimate. 12 deterministic top-pair-merge
    // rounds over the word-frequency vocab (count desc, lexicographic
    // tie-break), then encode via the trained-vocab broadcast join; the
    // DuckDB twin REPLAYS the same 12 merges in SQL (materialized CTE
    // chain + the same greedy string fold), so merge selection, final
    // segmentations, id assignment, and every per-doc id sequence are
    // hash-matched end-to-end. est_ratio cross-checks t03's estimator
    // against the real token count (corpus estimate ÷ real, 3 dp).
    "t11_bpe" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val (_, vocab) = analytics.Bpe.train(docs, nMerges = 12)
      // training-corpus encode: every word in vocab, so n_unk is
      // vacuously 0 — dropped here (t13 is the OOV query)
      val enc = analytics.Bpe.encode(docs, vocab)
        .select(col("doc_id"), col("n_bpe"), col("ids_str"))
      val est = analytics.Par.spreadForCpu(docs)
        .select(TextAnalysis.bpeTokenEstimate(col("text")).as("est"))
        .agg(sum(col("est")).as("est_total"))
      val ratio = enc.agg(sum(col("n_bpe")).as("bpe_total"))
        .crossJoin(est) // 1-row scalar broadcast
        .select(round(col("est_total").cast("double") / col("bpe_total"), 3)
          .as("est_ratio"))
      enc.crossJoin(ratio) // 1-row scalar broadcast
        .orderBy(col("doc_id"))
    }),


    // HTML boilerplate removal (C4/RefinedWeb-style): deterministic HTML
    // synthesized around each document's text (title head, link-dense nav
    // and footer, an inline content link every 5th doc), then the
    // segment-split + link-density strip. Nav/footer must drop, content —
    // including its inline link's anchor text — must survive.
    "t14_boilerplate" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("html", concat(
          lit("<html><head><title>"), col("source"), lit("</title></head><body>"),
          lit("<nav><a href=\"/\">Home</a> <a href=\"/a\">About</a> " +
            "<a href=\"/c\">Contact</a></nav>"),
          lit("<p>"), col("text"),
          when(pmod(col("doc_id"), lit(5)) === 0,
            lit(" <a href=\"/x\">click here</a>")).otherwise(lit("")),
          lit("</p>"),
          lit("<div class=\"footer\"><a href=\"/t\">Terms</a> " +
            "<a href=\"/p\">Privacy</a></div></body></html>")))
      TextAnalysis.boilerplateStrip(docs, "html")
        .orderBy(col("doc_id"))
    }),


    // Within-document repeated-line removal (CCNet-style paragraph
    // dedup): multi-line text synthesized deterministically from token
    // slices with a repeated "template header" paragraph and an injected
    // blank line; the repeats must drop (keep-first), the blank must not
    // bridge or count.
    "t15_line_dedup" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("ws", TextAnalysis.tokens(col("text")))
      val p1 = array_join(slice(col("ws"), 1, 6), " ")
      val p2 = array_join(slice(col("ws"), 7, 6), " ")
      val multi = concat_ws("\n", p1, lit("  "), p2, p1, p2)
      TextAnalysis.dedupLines(docs.withColumn("mtext", multi), "mtext")
        .orderBy(col("doc_id"))
    }),


    // Canonical text normalization (C4-style): case-folding, punctuation
    // strip, whitespace collapse — exercised against synthesized dirty
    // text (uppercase echo, punctuation, a parenthesized tail) since the
    // corpus text is already clean. RE2-safe classes, replayed verbatim.
    "t17_normalize" -> ((s, dir) => {
      val dirty = t(s, dir, "documents")
        .withColumn("dirty", concat(col("text"), lit(" -- END!! "),
          upper(substring(col("text"), 1, 12)), lit(" (c) 2026, v1.0?")))
      dirty.select(col("doc_id"),
          length(col("dirty")).cast("bigint").as("n_chars_in"),
          TextAnalysis.normalizeText(col("dirty")).as("clean_text"))
        .withColumn("n_chars_out", length(col("clean_text")).cast("bigint"))
        .withColumn("n_tokens",
          TextAnalysis.tokenCount(col("clean_text")))
        .orderBy(col("doc_id"))
    }),


    // Per-doc top-3 keywords by tf-idf (smooth-idf): the document-level
    // topic signal next to t06's language-level frequency top-k. One
    // float chain, 9-dp rounded pre-ranking, term tie-break — the twin
    // replays scoring and ranking exactly.
    "t16_tfidf" -> ((s, dir) =>
      TextAnalysis.tfidfTopTerms(t(s, dir, "documents"), k = 3)
        .orderBy(col("doc_id"), col("rnk"))),


    // BPE on HELD-OUT data — the production encode path: train on the
    // even-doc_id half, encode the odd half, whose words were never seen
    // in training. OOV words segment by replaying the learned merge list
    // (segmentWords — identical to how they'd have segmented in-corpus);
    // subword strings training never produced map to UNK id -1, counted
    // per doc as n_unk. The DuckDB twin replays training AND the OOV
    // fold round by round.
    "t13_bpe_oov" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val (merges, vocab) =
        analytics.Bpe.train(docs.where(pmod(col("doc_id"), lit(2)) === 0), nMerges = 12)
      analytics.Bpe.encode(docs.where(pmod(col("doc_id"), lit(2)) === 1),
          vocab, merges = merges)
        .orderBy(col("doc_id"))
    }),


    // Model-based quality classifier (fasttext-style): hashed
    // unigram+bigram features → fixed literal weight vector → sigmoid
    // keep-probability. Pure per-row projection (no shuffle/join/UDF);
    // weights embedded in both engines like s02's hyperplanes, sum folded
    // strictly left-to-right, sigmoid on the 9-dp-rounded mean, keep
    // compared on the 6-dp-rounded score.
    "t12_clf" -> ((s, dir) =>
      analytics.QualityClassifier.score(t(s, dir, "documents"))
        .orderBy(col("doc_id"))),


    // Text: PII scrub over documents with synthesized PII (emails/IPs/SSNs
    // derived from doc_id so the operator provably fires); outputs the
    // scrubbed text plus per-class redaction counts. Patterns are shared
    // Java-regex/RE2 constructs — the DuckDB twin applies the identical
    // regexes.
    "t05_pii_scrub" -> ((s, dir) => {
      val withPii = analytics.Par.spreadForCpu(t(s, dir, "documents"))
        .select(col("doc_id"), concat(
          col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com"),
          lit(" from 10.0.0."), pmod(col("doc_id"), lit(256)),
          lit(" ssn 123-45-"), lpad(pmod(col("doc_id"), lit(10000)).cast("string"), 4, "0")
        ).as("text"))
      val counts = TextAnalysis.piiCounts(col("scrubbed")).map { case (n, c) =>
        c.cast("bigint").as(s"n_$n")
      }
      withPii
        .select(col("doc_id"), TextAnalysis.scrubPii(col("text")).as("scrubbed"))
        .select(Seq(col("doc_id"), col("scrubbed")) ++ counts: _*)
        .orderBy(col("doc_id"))
    }),


    // Per-language corpus statistics: exact type/token counts, type-
    // token ratio, and unigram Shannon entropy — the float sum collapses
    // to the FREQUENCY-VALUE level (terms with equal frequency
    // contribute identically — the g04 trick), so determinism needs one
    // small frequency-ordered fold per language, never a vocab-sized
    // ordered sum.
    "t24_entropy" -> ((s, dir) => {
      val tf = t(s, dir, "documents")
        .select(col("lang"), explode(TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy(col("lang"), col("term")).agg(count(lit(1)).as("f"))
      val byFreq = tf.groupBy(col("lang"), col("f"))
        .agg(count(lit(1)).as("n_terms"))
      val totals = tf.groupBy(col("lang"))
        .agg(sum(col("f")).as("n_tokens"), count(lit(1)).as("n_types"))
      byFreq.join(totals, Seq("lang"))
        .select(col("lang"), col("n_tokens"), col("n_types"), col("f"),
          col("n_terms"))
        .groupBy(col("lang"), col("n_tokens"), col("n_types"))
        .agg(collect_list(struct(col("f"), col("n_terms"))).as("fs"))
        .select(col("lang"), col("n_tokens"), col("n_types"),
          round(col("n_types").cast("double") / col("n_tokens").cast("double"), 9)
            .as("ttr"),
          round(aggregate(array_sort(col("fs")), lit(0.0), (a, e) => {
            val p = e.getField("f").cast("double") / col("n_tokens").cast("double")
            a - e.getField("n_terms").cast("double") * p * log(p)
          }), 9).as("entropy"))
        .orderBy(col("lang"))
    }),


    // PMI phrase mining (word2phrase/collocation detection): pointwise
    // mutual information over the corpus bigram stream, marginals from
    // the same frame, min-count 5 gate, top-20 by (pmi desc, pair).
    // The phrase-vocabulary step a tokenizer pipeline runs before BPE
    // (t11) so multi-word units survive as single tokens. Exact integer
    // counts; one 9-dp-rounded log ratio.
    "t25_pmi_phrases" -> ((s, dir) =>
      TextAnalysis.pmiBigrams(t(s, dir, "documents"), minCount = 5L, k = 20)),

    // BLEU-style clipped bigram-precision contamination score against
    // d13's benchmark slice (doc_id < 20): the GRADED decontamination
    // signal — near-dups of benchmark docs score near 1, docs sharing
    // only common word pairs score low. Per-reference clipping (max
    // count within any single benchmark doc) stops credit-farming by
    // repetition; threshold 0.5.
    "t26_ngram_overlap" -> ((s, dir) =>
      TextAnalysis.ngramContamination(t(s, dir, "documents"),
          t(s, dir, "documents").where(col("doc_id") < 20), threshold = 0.5)
        .orderBy(col("doc_id"))),

    // Calibration curve + ECE for the langid scorer against the lang
    // ground truth: confidence = best-marker share with a +2 pseudo-
    // count (6 dp), 10 fixed bins, per-bin mean confidence vs
    // accuracy, ECE = Σ (n/N)·|acc − conf| — the reliability diagram
    // every model-based filter (t12's classifier, a real langid)
    // should ship with. The non-en docs are the honest miscalibration
    // source: the synthetic corpus is English-vocabulary throughout,
    // so the scorer is confidently wrong on them. Determinism: conf is
    // 6-dp-rounded then summed as EXACT decimal (order-free mean);
    // per-bin terms round at 9 and fold in bin order (q69 recipe).
    // One shuffle to bins; totals and ECE are 1-row broadcasts.
    "t27_calibration" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val scored = analytics.Par.spreadForCpu(docs)
        .select(col("lang"),
          TextAnalysis.langIdWithConfidence(
            TextAnalysis.tokens(col("text"))).as("pc"))
        .select(col("lang"), col("pc").getField("pred").as("pred"),
          col("pc").getField("conf").as("conf"))
        .where(col("conf").isNotNull)
      val binned = scored.select(
        least(floor(col("conf") * 10).cast("long"), lit(9L)).as("bin"),
        dec(col("conf"), 18, 6).as("confd"),
        when(col("pred") === col("lang"), 1L).otherwise(0L).as("ok"))
      val bins = binned.groupBy(col("bin"))
        .agg(count(lit(1)).as("n"), sum(col("ok")).as("n_correct"),
          sum(col("confd")).as("sc"))
        .select(col("bin"), col("n"), col("n_correct"),
          round(col("sc").cast("double") / col("n"), 9).as("conf_mean"),
          round(col("n_correct").cast("double") / col("n"), 9).as("acc"))
        // persisted (≤10 rows): the nTot/terms/ece scalar chain reads this
        // four ways — without the cut the full langid scan re-executes per
        // branch (r17 optimization round; session-owned, clearCache-dropped)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nTot = bins.agg(sum(col("n")).as("nt"))
      val terms = bins.crossJoin(broadcast(nTot))
        .select(col("bin"), col("n"), col("n_correct"), col("conf_mean"), col("acc"),
          round(col("n").cast("double") / col("nt") *
            abs(col("acc") - col("conf_mean")), 9).as("term"))
      val ece = terms
        .agg(collect_list(struct(col("bin"), col("term"))).as("ts"))
        .select(round(aggregate(transform(array_sort(col("ts")),
          x => x.getField("term")), lit(0.0), (a, x) => a + x), 9).as("ece"))
      terms.crossJoin(broadcast(ece))
        .select(col("bin"), col("n"), col("n_correct"), col("conf_mean"),
          col("acc"), col("ece"))
        .orderBy(col("bin"))
    }),

    // Fixed-size sliding-window chunking (chunk 32 tokens, stride 24 —
    // 8-token overlap): the pretraining/RAG segmentation complement to
    // d23's content-defined chunks (CDC cuts survive edits; fixed
    // windows give uniform training-sequence lengths) and q39's packing
    // (which JOINS short docs; this SPLITS long ones). Chunk starts are
    // a per-row integer sequence, the slice a HOF — pure projection +
    // explode, no shuffle until the final order. The tail chunk keeps
    // its partial length (a real tokenizer pads it downstream); chunk
    // fingerprint = md5 of the joined slice, so overlap regions are
    // verifiable cross-engine.
    "t28_chunking" -> ((s, dir) => {
      val chunk = 32
      val stride = 24
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("ws"))
      val n = size(col("ws"))
      val nChunks = when(n <= chunk, lit(1))
        .otherwise(ceil((n - chunk).cast("double") / stride).cast("int") + 1)
      toks
        .select(col("doc_id"), col("ws"),
          posexplode(transform(sequence(lit(0), nChunks - 1),
            i => slice(col("ws"), i * stride + 1, lit(chunk)))).as(Seq("chunk_idx", "cw")))
        .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
          size(col("cw")).cast("long").as("n_tokens"),
          md5(array_join(col("cw"), " ")).as("chunk_fp"))
        .orderBy(col("doc_id"), col("chunk_idx"))
    }),

    // Data selection via importance resampling (DSIR): per-token
    // importance log-weights between the TARGET unigram model (the
    // lang='en' slice — the "data I want more of" stand-in) and the raw
    // corpus model, add-1 smoothed over the shared vocabulary; per-doc
    // length-normalized sum; keep each language's top 1/5 by the exact
    // integer gate rank·5 ≤ n_lang. Engine: TextAnalysis.dsirSelect —
    // one frequency table carries BOTH models (target count is a
    // conditional sum on the same groupBy), t09's Zipf-join scale shape
    // and rounded-log (9 dp) + position-ordered-fold determinism recipe.
    "t29_dsir" -> ((s, dir) =>
      TextAnalysis.dsirSelect(t(s, dir, "documents"),
          targetPred = col("lang") === "en", keepNum = 1, keepDenom = 5)
        .orderBy(col("doc_id"))),

    // Tokenizer fertility eval: per-language tokens-per-word (fertility)
    // and bytes-per-token (compression) under BOTH trained tokenizers —
    // the t11 12-merge BPE vocab and the t32 unigram-LM model — THE
    // go/no-go comparison for a tokenizer across a multilingual corpus
    // (a language with fertility ≫ corpus mean pays proportionally more
    // sequence length per word, and the BPE-vs-unigram delta is the
    // model-choice signal). All inputs are exact integer sums (word
    // counts, token counts, octet lengths); the ratios are single guarded
    // divisions, so the twin replays the whole thing through the shared
    // BPE + unigram chains with zero float accumulation.
    "t30_fertility" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      // ONE corpus tokenize+aggregate feeds BOTH trainers (the
      // trainFromWordFreqs seam) — training is eager (regime probe +
      // driver EM/merge loops run inside the call), so the shared table
      // is released before the lazy encode/report plan ever executes
      val wf = analytics.Bpe.wordFreqs(docs)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val (_, vocab) = analytics.Bpe.trainFromWordFreqs(wf, nMerges = 12)
      val (pieces, segs) = analytics.Unigram.trainFromWordFreqs(wf)
      wf.unpersist(blocking = false)
      val encB = analytics.Bpe.encode(docs, vocab)
        .select(col("doc_id"), col("n_bpe"))
      val encU = analytics.Unigram.encode(docs, pieces, segs)
        .select(col("doc_id"), col("n_uni"))
      val base = analytics.Par.spreadForCpu(docs)
        .select(col("doc_id"), col("lang"),
          size(TextAnalysis.tokens(col("text"))).cast("long").as("n_words"),
          octet_length(col("text")).cast("long").as("n_bytes"))
      base.join(encB, Seq("doc_id"), "left").join(encU, Seq("doc_id"), "left")
        .select(col("lang"), col("n_words"), col("n_bytes"),
          coalesce(col("n_bpe"), lit(0L)).as("n_bpe"),
          coalesce(col("n_uni"), lit(0L)).as("n_uni"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words"),
          sum(col("n_bpe")).as("n_bpe"), sum(col("n_uni")).as("n_uni"),
          sum(col("n_bytes")).as("n_bytes"))
        .select(col("lang"), col("n_docs"), col("n_words"), col("n_bpe"),
          col("n_uni"), col("n_bytes"),
          round(when(col("n_words") > 0,
            col("n_bpe").cast("double") / col("n_words")), 6).as("fertility"),
          round(when(col("n_bpe") > 0,
            col("n_bytes").cast("double") / col("n_bpe")), 6)
            .as("bytes_per_token"),
          round(when(col("n_words") > 0,
            col("n_uni").cast("double") / col("n_words")), 6).as("fertility_uni"),
          round(when(col("n_uni") > 0,
            col("n_bytes").cast("double") / col("n_uni")), 6)
            .as("bytes_per_token_uni"))
        .orderBy(col("lang"))
    }),

    // Unigram-LM (SentencePiece-family) tokenizer, trained AND applied —
    // the EM/prune sibling of t11's BPE: substring-frequency seed
    // (chars + top 200 multi-char pieces), 2 Viterbi-EM rounds, prune to
    // chars + top 100, 1 more EM round, then Viterbi-encode every doc
    // under the final smoothed log-probs. The DuckDB twin replays the
    // whole chain — seed counts, every EM round's Viterbi DP (a
    // list_reduce with a LIST(STRUCT) best-score accumulator), the prune,
    // and the encode — so piece selection, scores, segmentations, id
    // assignment, and every per-doc id sequence hash-match end-to-end.
    "t32_unigram" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val (pieces, segs) = analytics.Unigram.train(docs)
      analytics.Unigram.encode(docs, pieces, segs)
        .orderBy(col("doc_id"))
    }),

    // Per-document n-gram NOVELTY: the share of a doc's distinct 3-gram
    // shingles whose FIRST corpus occurrence (min doc_id — ingestion
    // order) is this document (d01/d03 tell you two docs overlap; this
    // tells you how much of EACH doc is new at all). See
    // TextAnalysis.noveltyScores for the collapse-before-join scale shape.
    "t33_novelty" -> ((s, dir) =>
      TextAnalysis.noveltyScores(t(s, dir, "documents"), n = 3)
        .orderBy(col("doc_id"))),

    // Greedy bigram rollout — SYNTHETIC-TEXT generation from the
    // corpus-trained bigram LM (t10's model argmax-decoded, 12 steps
    // from the 3 most frequent seed words), with greedy decoding's
    // degenerate-repetition hazard measured on the generator's own
    // output (distinct-word ratio — t08's lesson applied to generated
    // text, the quality gate a synthetic-data pipeline needs). The
    // transition table is the one corpus-pass aggregate; the rollout is
    // control-plane-sized.
    "t34_generate" -> ((s, dir) =>
      TextAnalysis.greedyBigramRollout(t(s, dir, "documents"),
          nSeeds = 3, steps = 12)
        .orderBy(col("seed"))),

    // Span-corruption mask planner — the T5-style denoising plan between
    // q39's packing and the trainer: one 3-token span per 20-token
    // segment (≈15% mask ratio), start drawn per segment via the
    // portable md5-u32 of (doc_id | span index), so spans never overlap
    // and both engines (and any partitioning) derive the identical plan.
    // One map-only projection; the "start:len" plan string is the
    // hash-compared artifact.
    "t36_span_corruption" -> ((s, dir) =>
      TextAnalysis.spanCorruptionPlan(t(s, dir, "documents"))
        .orderBy(col("doc_id"))),

    // Tokenizer round-trip (losslessness) contract — the QA gate t11/t32
    // train and t30 scores still lack: every corpus word's unigram
    // segmentation must CONCATENATE BACK to the word exactly (Viterbi's
    // single-char coverage guarantee makes this provable, and
    // `all_roundtrip` asserts it as a measured TRUE over the whole
    // corpus, the q30/q35 flag convention), with the occurrence-weighted
    // piece counts and the worst-case per-word piece count as the
    // audit's size columns. One wf join against the trained
    // segmentations — no corpus re-tokenize.
    "t35_roundtrip" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val (_, segs) = analytics.Unigram.train(docs)
      analytics.Bpe.wordFreqs(docs).join(segs, Seq("word"))
        .select(col("word"), col("freq"),
          size(split(col("seg"), " ")).cast("long").as("np"),
          (translate(col("seg"), " ", "") === col("word")).as("rt"))
        .agg(count(lit(1)).as("n_distinct_words"),
          sum(col("freq")).as("n_word_occurrences"),
          sum(col("np") * col("freq")).as("n_piece_occurrences"),
          max(col("np")).as("max_pieces_per_word"),
          (sum(when(col("rt"), lit(0L)).otherwise(lit(1L))) === 0)
            .as("all_roundtrip"))
        .select(col("n_distinct_words"), col("n_word_occurrences"),
          col("n_piece_occurrences"), col("max_pieces_per_word"),
          round(col("n_piece_occurrences").cast("double") /
            col("n_word_occurrences").cast("double"), 6)
            .as("pieces_per_occurrence"),
          col("all_roundtrip"))
    }),

    // Stemming + conflation statistics: the weak (Porter-step-1-family)
    // stemmer applied per token, then per-stem families — token mass,
    // distinct raw variants, the alphabetically-first variant as the
    // display form. The vocabulary-compression receipt an index builds
    // on; top 30 families by mass, total-ordered.
    "t23_stemming" -> ((s, dir) =>
      t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("raw"))
        .select(col("raw"), TextAnalysis.stem(col("raw")).as("stem"))
        .groupBy(col("stem"))
        .agg(count(lit(1)).as("n_tokens"),
          countDistinct(col("raw")).as("n_variants"),
          min(col("raw")).as("first_variant"))
        .orderBy(col("n_tokens").desc, col("stem"))
        .limit(30)),


    // BM25 retrieval + reciprocal-rank-fusion reranking: three queries
    // derived from the corpus itself (first-4-token slices of docs
    // 0/7/14), Lucene-form BM25 over the inverted index (only docs
    // sharing a query term score), top-10 per query, then RRF-fused
    // with the t02 quality prior ranked WITHIN each candidate pool —
    // the lexical-relevance × quality reranking a curation pipeline
    // mines hard negatives with. All windows query-partitioned.
    "t22_bm25_rrf" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.where(col("doc_id").isin(0L, 7L, 14L))
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextAnalysis.tokens(col("text")), 1, 4), " ").as("qtext"))
      val bm25 = TextAnalysis.bm25Scores(docs, queries)
      val wQ = Window.partitionBy(col("query_id"))
      val top = bm25
        .withColumn("r_bm25",
          row_number().over(wQ.orderBy(col("bm25").desc, col("doc_id"))).cast("bigint"))
        .where(col("r_bm25") <= 10)
      val withQuality = top.join(
        qualityScored(docs).select(col("doc_id"), col("quality")), Seq("doc_id"))
        .withColumn("r_q",
          row_number().over(wQ.orderBy(col("quality").desc, col("doc_id"))).cast("bigint"))
        .withColumn("rrf",
          round(lit(1.0) / (lit(60.0) + col("r_bm25")) +
            lit(1.0) / (lit(60.0) + col("r_q")), 9))
      withQuality
        .withColumn("fused_rank",
          row_number().over(wQ.orderBy(col("rrf").desc, col("doc_id"))).cast("bigint"))
        .select(col("query_id"), col("fused_rank"), col("doc_id"),
          col("bm25"), col("r_bm25"), col("r_q"), col("rrf"))
        .orderBy(col("query_id"), col("fused_rank"))
    }),


    // Retrieval-quality eval over the t22 BM25 ranking: per-query
    // nDCG@10 (graded), MRR and recall@10 (binary at rel ≥ 2), with a
    // weakest-link min-tf relevance oracle independent of the scorer
    // under eval (coverage saturates on this vocabulary — see the
    // operator doc). The ranking-eval family member next to q62 AUC
    // and t27 calibration — how a curation pipeline decides its
    // retriever is good enough to mine hard negatives with.
    "t31_retrieval_eval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val queries = docs.where(col("doc_id").isin(0L, 7L, 14L))
        .select(col("doc_id").as("query_id"),
          array_join(slice(TextAnalysis.tokens(col("text")), 1, 4), " ")
            .as("qtext"))
      TextAnalysis.retrievalMetrics(docs, queries, kEval = 10)
        .orderBy(col("query_id"))
    }),

    // Corpus rank–frequency diagnostics (Zipf): top-100 terms by
    // frequency (freq desc, term tie-break), closed-form OLS of
    // ln(freq) on ln(rank) — all four sums folded in rank order over
    // one collected 100-element array (no global window, no regression
    // library), slope/intercept from the same folded doubles.
    "t21_zipf" -> ((s, dir) => {
      val top = t(s, dir, "documents")
        .select(explode(TextAnalysis.tokens(col("text"))).as("term"))
        .groupBy(col("term")).agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("term")).limit(100)
      val arr = array_sort(collect_list(struct((-col("freq")).as("nf"),
        col("term"), col("freq"))))
      top.agg(arr.as("__arr"))
        .select(transform(col("__arr"), (e, i) =>
            struct(log((i + 1).cast("double")).as("x"),
              log(e.getField("freq").cast("double")).as("y"))).as("ps"),
          size(col("__arr")).cast("bigint").as("n_terms"))
        .select(col("n_terms"),
          aggregate(col("ps"), lit(0.0), (a, p) => a + p.getField("x")).as("sx"),
          aggregate(col("ps"), lit(0.0), (a, p) => a + p.getField("y")).as("sy"),
          aggregate(col("ps"), lit(0.0), (a, p) => a + p.getField("x") * p.getField("y")).as("sxy"),
          aggregate(col("ps"), lit(0.0), (a, p) => a + p.getField("x") * p.getField("x")).as("sxx"))
        .select(col("n_terms"),
          // empty-input guard (EmptyGate): 0/0 double division is NaN in
          // Spark but the oracle's NULL-chain yields NULL — both engines
          // agree the slope of nothing is undefined, so emit NULL
          when(col("n_terms") > 0,
            round((col("n_terms") * col("sxy") - col("sx") * col("sy")) /
              (col("n_terms") * col("sxx") - col("sx") * col("sx")), 9)).as("slope"))
    }),


    // Interpolated Kneser–Ney bigram LM scoring — the production
    // smoothing next to t10's add-k baseline; corpus-self-trained,
    // continuation-unigram backoff, t09/t10 float discipline.
    "t20_kneser_ney" -> ((s, dir) =>
      TextAnalysis.kneserNeyBigramScores(t(s, dir, "documents"))
        .orderBy(col("doc_id"))),


    // Language-ID evaluation: t01's stopword-voting classifier measured
    // against the labeled lang — per-class exact confusion counts +
    // precision/recall/F1 (F1 computed FROM the emitted P/R columns so
    // the float chain replays verbatim). 'zh' has no marker list and is
    // never predicted: precision NULL, recall 0 — the honest row.
    "t19_langid_eval" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          TextAnalysis.tokens(col("text")).as("ws"))
      analytics.Eval.classificationReport(
          docs.select(col("lang").as("label"),
            TextAnalysis.langIdFromTokens(col("ws")).as("pred")),
          "label", "pred")
        .orderBy(col("label"))
    }),


    // Readability scoring (Flesch Reading Ease): sentence runs, vowel-
    // group syllables floored at 1, two exact-integer ratios, one 6-dp
    // round — a pure per-row projection over the materialized token
    // array (the t01–t04 attribute discipline). The counts travel WITH
    // the score so the formula is auditable row by row.
    "t18_readability" -> ((s, dir) => {
      val toked = t(s, dir, "documents")
        .select(col("doc_id"), col("text"),
          TextAnalysis.tokens(col("text")).as("ws"))
      toked
        .select(col("doc_id"),
          size(col("ws")).cast("bigint").as("n_words"),
          TextAnalysis.sentenceCount(col("text")).as("n_sentences"),
          aggregate(col("ws"), lit(0L),
            (acc, w) => acc + TextAnalysis.syllables(w)).as("n_syllables"))
        .where(col("n_words") > 0)
        .withColumn("flesch", TextAnalysis.fleschFromCounts(
          col("n_words"), col("n_sentences"), col("n_syllables")))
        .orderBy(col("doc_id"))
    }),


    // WordPiece (BERT) encoder — the third tokenizer family beside BPE
    // (t11, merge replay) and unigram (t32, EM): greedy longest-prefix
    // match over a frequency-seeded piece vocabulary, '##' continuation
    // rendering, whole-word [UNK] past the HF max_input_chars bound
    // (6 here so the path fires on the corpus' one 8-char word). The
    // match loop runs on the distinct-word table, never the corpus;
    // the oracle replays the seeding and all 6 unrolled greedy steps.
    "t37_wordpiece" -> ((s, dir) =>
      analytics.WordPiece.encode(t(s, dir, "documents"), topPieces = 40,
          maxInputChars = 6)
        .orderBy(col("doc_id"))),
  )

  // ── DuckDB oracle twins ──

  val oracle: Map[String, String] = Map(


    // PMI twin (t25): the same bigram stream, marginals, gate and
    // rounded log ratio; same total order and cutoff.
    "t25_pmi_phrases" -> (
      s"""WITH tok AS (SELECT $tokensSqlExpr AS ws FROM documents),
         |bg AS (SELECT b.prev AS prev, b.cur AS cur FROM (
         |    SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
         |      i -> struct_pack(prev := ws[i], cur := ws[i + 1]))) AS b
         |    FROM tok WHERE len(ws) >= 2)),
         |c2 AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c2
         |  FROM bg GROUP BY prev, cur),
         |cp AS (SELECT prev, CAST(count(*) AS BIGINT) AS cp FROM bg GROUP BY prev),
         |cc AS (SELECT cur, CAST(count(*) AS BIGINT) AS cc FROM bg GROUP BY cur),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM bg)
         |SELECT prev, cur, c2,
         |  round(ln(CAST(c2 AS DOUBLE) * CAST(nb AS DOUBLE)
         |    / (CAST(cp AS DOUBLE) * CAST(cc AS DOUBLE))), 9) AS pmi
         |FROM c2 JOIN cp USING (prev) JOIN cc USING (cur) CROSS JOIN nb
         |WHERE c2 >= 5
         |ORDER BY pmi DESC, prev, cur LIMIT 20""".stripMargin),

    // Chunking twin (t28): same start sequence, inclusive-end
    // list_slice ≡ Spark's (start, length) slice, same joined-slice md5.
    "t28_chunking" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |nc AS (SELECT doc_id, ws,
         |  CASE WHEN len(ws) <= 32 THEN 1
         |       ELSE CAST(ceil(CAST(len(ws) - 32 AS DOUBLE) / 24) AS INT) + 1 END AS n_chunks
         |  FROM tok),
         |c AS (SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
         |    list_slice(ws, i * 24 + 1, i * 24 + 32) AS cw
         |  FROM nc, UNNEST(range(n_chunks)) AS u(i))
         |SELECT doc_id, chunk_idx, CAST(len(cw) AS BIGINT) AS n_tokens,
         |  md5(array_to_string(cw, ' ')) AS chunk_fp
         |FROM c ORDER BY doc_id, chunk_idx""".stripMargin),

    // DSIR twin (t29): same one-table two-model counts, 9-dp-rounded
    // lns subtracted per token, t09's position-ordered list_reduce fold,
    // per-language rank windows and the integer keep gate — replayed
    // end-to-end, so a drift in either unigram model moves a weight and
    // fails the hash.
    "t29_dsir" -> (
      s"""WITH tok AS (SELECT doc_id, lang, (lang = 'en') AS is_tgt,
         |    $tokensSqlExpr AS ws FROM documents),
         |tu AS (SELECT doc_id, is_tgt, unnest(ws) AS token,
         |    generate_subscripts(ws, 1) AS pos FROM tok),
         |f AS (SELECT token, count(*) AS cr,
         |    sum(CASE WHEN is_tgt THEN 1 ELSE 0 END) AS ct FROM tu GROUP BY token),
         |tot AS (SELECT sum(cr) AS nr, sum(ct) AS nt, count(*) AS v FROM f),
         |w AS (SELECT token,
         |    round(ln(CAST(ct + 1 AS DOUBLE) / CAST(nt + v AS DOUBLE)), 9) -
         |    round(ln(CAST(cr + 1 AS DOUBLE) / CAST(nr + v AS DOUBLE)), 9) AS w
         |  FROM f CROSS JOIN tot),
         |agg AS (SELECT doc_id, list_reduce(list(w ORDER BY pos), (a, b) -> a + b) AS s,
         |    count(*) AS n FROM tu JOIN w USING (token) GROUP BY doc_id),
         |base AS (SELECT d.doc_id, d.lang,
         |    CAST(coalesce(agg.n, 0) AS BIGINT) AS n_tokens,
         |    round(agg.s / agg.n, 6) + 0.0 AS logw_avg
         |  FROM documents d LEFT JOIN agg USING (doc_id)),
         |r AS (SELECT *, count(*) OVER (PARTITION BY lang) AS n_lang,
         |    row_number() OVER (PARTITION BY lang
         |      ORDER BY logw_avg DESC NULLS LAST, doc_id) AS lang_rank FROM base)
         |SELECT doc_id, lang, n_tokens, logw_avg,
         |  CAST(n_lang AS BIGINT) AS n_lang, CAST(lang_rank AS BIGINT) AS lang_rank,
         |  (logw_avg IS NOT NULL AND lang_rank * 5 <= n_lang * 1) AS selected
         |FROM r ORDER BY doc_id""".stripMargin),

    // Calibration twin (t27): t01's marker-hit CTE with confidence,
    // identical binning, decimal mean, and bin-ordered ECE fold.
    "t27_calibration" -> (
      s"""WITH tok AS (SELECT doc_id, lang, $tokensSqlExpr AS ws FROM documents),
         |sc AS (SELECT doc_id, lang,
         | len(list_filter(ws, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS s_en,
         | len(list_filter(ws, x -> list_contains(['el','la','de','y','que','en','un'], x))) AS s_es,
         | len(list_filter(ws, x -> list_contains(['der','die','das','und','zu','ein','ist'], x))) AS s_de,
         | len(list_filter(ws, x -> list_contains(['le','la','de','et','que','un','est'], x))) AS s_fr
         |FROM tok),
         |p AS (SELECT lang,
         |  CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
         |   WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
         |   WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
         |   WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
         |   ELSE 'fr' END AS pred,
         |  round(CAST(greatest(s_en, s_es, s_de, s_fr) AS DOUBLE)
         |    / (CAST(s_en + s_es + s_de + s_fr AS DOUBLE) + 2.0), 6) AS conf
         |  FROM sc WHERE s_en + s_es + s_de + s_fr > 0),
         |b AS (SELECT least(CAST(floor(conf * 10) AS BIGINT), 9) AS bin,
         |    CAST(conf AS DECIMAL(18,6)) AS confd,
         |    CASE WHEN pred = lang THEN 1 ELSE 0 END AS ok FROM p),
         |bins AS (SELECT bin, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(ok) AS BIGINT) AS n_correct,
         |    round(CAST(sum(confd) AS DOUBLE) / count(*), 9) AS conf_mean,
         |    round(CAST(sum(ok) AS DOUBLE) / count(*), 9) AS acc
         |  FROM b GROUP BY bin),
         |nt AS (SELECT CAST(sum(n) AS BIGINT) AS nt FROM bins),
         |terms AS (SELECT bin, n, n_correct, conf_mean, acc,
         |    round(CAST(n AS DOUBLE) / nt * abs(acc - conf_mean), 9) AS term
         |  FROM bins CROSS JOIN nt),
         |e AS (SELECT round(list_reduce(list_prepend(0.0, list_transform(
         |    list(struct_pack(bin := bin, term := term) ORDER BY bin),
         |    x -> x.term)), (a, b) -> a + b), 9) AS ece FROM terms)
         |SELECT bin, n, n_correct, conf_mean, acc, ece
         |FROM terms CROSS JOIN e ORDER BY bin""".stripMargin),

    // Contamination twin (t26): same bigram counts, same per-reference
    // clip, same single rounded ratio.
    "t26_ngram_overlap" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |bg AS (SELECT doc_id, ws[i+1] || ' ' || ws[i+2] AS g
         |  FROM tok, UNNEST(range(len(ws) - 1)) AS u(i) WHERE len(ws) >= 2),
         |bc AS MATERIALIZED (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS c
         |  FROM bg GROUP BY doc_id, g),
         |clip AS (SELECT g, max(c) AS clip FROM bc WHERE doc_id < 20 GROUP BY g),
         |m AS (SELECT doc_id, CAST(sum(least(c, clip)) AS BIGINT) AS cm
         |  FROM bc JOIN clip USING (g) GROUP BY doc_id),
         |tot AS (SELECT doc_id, CAST(sum(c) AS BIGINT) AS nb FROM bc GROUP BY doc_id),
         |f AS (SELECT d.doc_id, coalesce(tot.nb, 0) AS n_bigrams,
         |    coalesce(m.cm, 0) AS clipped_matches,
         |    CASE WHEN coalesce(tot.nb, 0) = 0 THEN NULL
         |         ELSE round(CAST(coalesce(m.cm, 0) AS DOUBLE) / CAST(tot.nb AS DOUBLE), 9)
         |    END AS overlap
         |  FROM documents d LEFT JOIN tot ON d.doc_id = tot.doc_id
         |  LEFT JOIN m ON d.doc_id = m.doc_id)
         |SELECT doc_id, n_bigrams, clipped_matches, overlap,
         |  coalesce(overlap >= 0.5, FALSE) AS contaminated
         |FROM f ORDER BY doc_id""".stripMargin),

    // Entropy twin (t24): same frequency-level collapse, same ordered
    // fold, same single divisions.
    "t24_entropy" -> (
      s"""WITH tok AS (SELECT lang, $tokensSqlExpr AS ws FROM documents),
         |tf AS (SELECT lang, t AS term, CAST(count(*) AS BIGINT) AS f FROM
         |  (SELECT lang, unnest(ws) AS t FROM tok) GROUP BY lang, t),
         |bf AS (SELECT lang, f, CAST(count(*) AS BIGINT) AS n_terms
         |  FROM tf GROUP BY lang, f),
         |tot AS (SELECT lang, CAST(sum(f) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS n_types FROM tf GROUP BY lang)
         |SELECT lang, n_tokens, n_types,
         |  round(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 9) AS ttr,
         |  round(list_reduce(list_prepend(0.0, list_transform(
         |    list(struct_pack(f := f, n_terms := n_terms) ORDER BY f, n_terms),
         |    e -> -(CAST(e.n_terms AS DOUBLE)
         |      * (CAST(e.f AS DOUBLE) / CAST(n_tokens AS DOUBLE))
         |      * ln(CAST(e.f AS DOUBLE) / CAST(n_tokens AS DOUBLE))))),
         |    (a, b) -> a + b), 9) AS entropy
         |FROM bf JOIN tot USING (lang)
         |GROUP BY lang, n_tokens, n_types ORDER BY lang""".stripMargin),


    // Stemming twin (t23): the same rule chain in the same order.
    "t23_stemming" -> (
      s"""WITH tok AS (SELECT $tokensSqlExpr AS ws FROM documents),
         |raw AS (SELECT unnest(ws) AS raw FROM tok),
         |st AS (SELECT raw,
         |  regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
         |    raw, 'sses$$', 'ss'), 'ies$$', 'i'), '([^s])s$$', '\\1'),
         |    '^(.{3,})ing$$', '\\1'), '^(.{3,})ed$$', '\\1') AS stem
         |  FROM raw)
         |SELECT stem, count(*) AS n_tokens,
         |  CAST(count(DISTINCT raw) AS BIGINT) AS n_variants,
         |  min(raw) AS first_variant
         |FROM st GROUP BY stem
         |ORDER BY n_tokens DESC, stem LIMIT 30""".stripMargin),


    // BM25+RRF twin (t22): same inverted-index scoring, same term-
    // ordered fold, same pool-ranked fusion.
    "t22_bm25_rrf" -> (
      s"""WITH tok AS (SELECT doc_id, text, $tokensSqlExpr AS ws FROM documents),
         |lens AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS len FROM tok),
         |tf AS (SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf FROM
         |  (SELECT doc_id, unnest(ws) AS t FROM tok) GROUP BY doc_id, t),
         |dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len) AS DOUBLE) / count(*) AS avgdl FROM lens),
         |qt AS (SELECT doc_id AS query_id, unnest(list_distinct(ws[1:4])) AS term
         |  FROM tok WHERE doc_id IN (0, 7, 14)),
         |contrib AS (SELECT query_id, tf.doc_id, qt.term,
         |    round(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
         |        / (CAST(df AS DOUBLE) + 0.5)) *
         |      (CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
         |      (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
         |        + 0.75 * CAST(len AS DOUBLE) / avgdl)),
         |      9) AS c
         |  FROM qt JOIN tf USING (term) JOIN dfr USING (term)
         |  JOIN lens ON lens.doc_id = tf.doc_id CROSS JOIN st),
         |bm AS (SELECT query_id, doc_id,
         |    round(list_reduce(list_prepend(0.0,
         |      list_transform(list(struct_pack(term := term, c := c) ORDER BY term, c),
         |        e -> e.c)), (a, x) -> a + x), 6) AS bm25
         |  FROM contrib GROUP BY query_id, doc_id),
         |top AS (SELECT query_id, doc_id, bm25,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY bm25 DESC, doc_id) AS BIGINT) AS r_bm25
         |  FROM bm QUALIFY r_bm25 <= 10),
         |fq AS (SELECT t2.doc_id,
         |    0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0)
         |    + 0.4 * (CASE WHEN len(ws) = 0 THEN 0.0
         |        ELSE CAST(len(list_filter(ws, x -> list_contains(
         |          ['the','a','of','and','to','in','is'], x))) AS DOUBLE) / len(ws) END)
         |    + 0.2 * (1.0 - (CASE WHEN length(text) = 0 THEN 0.0
         |        ELSE CAST(length(text) - length(regexp_replace(text,
         |          '[!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) / length(text) END)) AS quality
         |  FROM tok t2),
         |pool AS (SELECT top.query_id, top.doc_id, top.bm25, top.r_bm25,
         |    CAST(row_number() OVER (PARTITION BY top.query_id
         |      ORDER BY fq.quality DESC, top.doc_id) AS BIGINT) AS r_q
         |  FROM top JOIN fq ON fq.doc_id = top.doc_id)
         |SELECT query_id, fused_rank, doc_id, bm25, r_bm25, r_q, rrf FROM (
         |  SELECT query_id, doc_id, bm25, r_bm25, r_q,
         |    round(1.0 / (60.0 + r_bm25) + 1.0 / (60.0 + r_q), 9) AS rrf,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY round(1.0 / (60.0 + r_bm25) + 1.0 / (60.0 + r_q), 9) DESC,
         |        doc_id) AS BIGINT) AS fused_rank
         |  FROM pool)
         |ORDER BY query_id, fused_rank""".stripMargin),


    // Retrieval-eval twin (t31): t22's BM25 CTE chain, the coverage
    // relevance join, rank window, and every metric fold replayed —
    // round-9 gains in rank order (ideal DCG by 1-based list_transform
    // index = the operator's sequence positions), rounded divisions.
    "t31_retrieval_eval" -> (
      s"""WITH tok AS (SELECT doc_id, text, $tokensSqlExpr AS ws FROM documents),
         |lens AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS len FROM tok),
         |tf AS (SELECT doc_id, t AS term, CAST(count(*) AS BIGINT) AS tf FROM
         |  (SELECT doc_id, unnest(ws) AS t FROM tok) GROUP BY doc_id, t),
         |dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
         |st AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(len) AS DOUBLE) / count(*) AS avgdl FROM lens),
         |qt AS (SELECT doc_id AS query_id, unnest(list_distinct(ws[1:4])) AS term
         |  FROM tok WHERE doc_id IN (0, 7, 14)),
         |contrib AS (SELECT query_id, tf.doc_id, qt.term,
         |    round(ln(1.0 + (CAST(n_docs AS DOUBLE) - CAST(df AS DOUBLE) + 0.5)
         |        / (CAST(df AS DOUBLE) + 0.5)) *
         |      (CAST(tf AS DOUBLE) * (1.2 + 1.0)) /
         |      (CAST(tf AS DOUBLE) + 1.2 * ((1.0 - 0.75)
         |        + 0.75 * CAST(len AS DOUBLE) / avgdl)),
         |      9) AS c
         |  FROM qt JOIN tf USING (term) JOIN dfr USING (term)
         |  JOIN lens ON lens.doc_id = tf.doc_id CROSS JOIN st),
         |bm AS (SELECT query_id, doc_id,
         |    round(list_reduce(list_prepend(0.0,
         |      list_transform(list(struct_pack(term := term, c := c) ORDER BY term, c),
         |        e -> e.c)), (a, x) -> a + x), 6) AS bm25
         |  FROM contrib GROUP BY query_id, doc_id),
         |nq AS (SELECT query_id, CAST(count(*) AS BIGINT) AS nq
         |  FROM qt GROUP BY query_id),
         |rel AS (SELECT query_id, tf.doc_id,
         |    CASE WHEN count(*) = max(nq.nq)
         |      THEN CAST(least(min(tf), 3) AS BIGINT)
         |      ELSE CAST(0 AS BIGINT) END AS rel
         |  FROM qt JOIN tf USING (term) JOIN nq USING (query_id)
         |  GROUP BY query_id, tf.doc_id),
         |rk AS (SELECT bm.query_id, bm.doc_id, rel.rel,
         |    CAST(row_number() OVER (PARTITION BY bm.query_id
         |      ORDER BY bm25 DESC, bm.doc_id) AS BIGINT) AS rnk
         |  FROM bm JOIN rel ON rel.query_id = bm.query_id AND rel.doc_id = bm.doc_id),
         |rr AS (SELECT query_id,
         |    list(struct_pack(rnk := rnk, rel := rel) ORDER BY rnk) AS rr
         |  FROM rk GROUP BY query_id),
         |m AS (SELECT query_id,
         |    CAST(len(rr) AS BIGINT) AS n_cand,
         |    CAST(len(list_filter(rr, e -> e.rel >= 2)) AS BIGINT) AS n_rel,
         |    list_reduce(list_prepend(0.0,
         |      list_transform(list_filter(rr, e -> e.rnk <= 10),
         |        e -> round((pow(2.0, CAST(e.rel AS DOUBLE)) - 1.0)
         |          / (ln(CAST(e.rnk AS DOUBLE) + 1.0) / ln(2.0)), 9))),
         |      (a, x) -> a + x) AS dcg,
         |    list_reduce(list_prepend(0.0, list_transform(
         |        (list_reverse(list_sort(list_transform(rr, e -> e.rel))))[1:10],
         |        (r, i) -> round((pow(2.0, CAST(r AS DOUBLE)) - 1.0)
         |          / (ln(CAST(i AS DOUBLE) + 1.0) / ln(2.0)), 9))),
         |      (a, x) -> a + x) AS idcg,
         |    list_min(list_transform(list_filter(rr, e -> e.rel >= 2),
         |      e -> e.rnk)) AS first_rel,
         |    CAST(len(list_filter(rr, e -> e.rnk <= 10 AND e.rel >= 2))
         |      AS BIGINT) AS hits
         |  FROM rr)
         |SELECT query_id, n_cand, n_rel,
         |  round(dcg, 6) AS dcg, round(idcg, 6) AS idcg,
         |  CASE WHEN idcg > 0 THEN round(dcg / idcg, 6) ELSE 0.0 END AS ndcg,
         |  coalesce(round(1.0 / first_rel, 6), 0.0) AS mrr,
         |  CASE WHEN n_rel > 0 THEN round(CAST(hits AS DOUBLE) / n_rel, 6) END AS recall
         |FROM m ORDER BY query_id""".stripMargin),

    // Zipf twin (t21): same top-100, same rank-ordered folds, same
    // closed-form slope from the same folded doubles.
    "t21_zipf" -> (
      s"""WITH tok AS (SELECT $tokensSqlExpr AS ws FROM documents),
         |tf AS (SELECT t AS term, count(*) AS freq FROM
         |  (SELECT unnest(ws) AS t FROM tok) GROUP BY t),
         |top AS (SELECT term, freq FROM tf ORDER BY freq DESC, term LIMIT 100),
         |a AS (SELECT list(struct_pack(nf := -freq, term := term, freq := freq)
         |    ORDER BY -freq, term) AS arr FROM top),
         |ps AS (SELECT coalesce(len(arr), 0) AS n_terms,
         |    list_transform(arr, e -> ln(CAST(e.freq AS DOUBLE))) AS ys,
         |    list_transform(range(1, len(arr) + 1), i -> ln(CAST(i AS DOUBLE))) AS xs
         |  FROM a),
         |s AS (SELECT CAST(n_terms AS BIGINT) AS n_terms,
         |    list_reduce(list_prepend(0.0, xs), (acc, x) -> acc + x) AS sx,
         |    list_reduce(list_prepend(0.0, ys), (acc, y) -> acc + y) AS sy,
         |    list_reduce(list_prepend(0.0,
         |      list_transform(range(1, CAST(n_terms AS INTEGER) + 1),
         |        i -> xs[i] * ys[i])), (acc, p) -> acc + p) AS sxy,
         |    list_reduce(list_prepend(0.0, list_transform(xs, x -> x * x)),
         |      (acc, p) -> acc + p) AS sxx
         |  FROM ps)
         |SELECT n_terms, round((n_terms * sxy - sx * sy)
         |  / (n_terms * sxx - sx * sx), 9) AS slope FROM s""".stripMargin),


    // Kneser–Ney twin (t20): same counts, same probability chain in the
    // same op order, same position-ordered fold.
    "t20_kneser_ney" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |bg AS (SELECT doc_id, i AS pos, ws[i+1] AS prev, ws[i+2] AS cur
         |  FROM tok, UNNEST(range(len(ws) - 1)) AS u(i) WHERE len(ws) >= 2),
         |c2 AS (SELECT prev, cur, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY prev, cur),
         |c1 AS (SELECT prev, CAST(count(*) AS BIGINT) AS c1 FROM bg GROUP BY prev),
         |nf AS (SELECT prev, CAST(count(*) AS BIGINT) AS nf FROM c2 GROUP BY prev),
         |np AS (SELECT cur, CAST(count(*) AS BIGINT) AS np FROM c2 GROUP BY cur),
         |tt AS (SELECT CAST(count(*) AS DOUBLE) AS tt FROM c2),
         |lp AS (SELECT doc_id, pos,
         |  round(ln(
         |    greatest(CAST(c2 AS DOUBLE) - 0.75, 0.0) / CAST(c1 AS DOUBLE) +
         |    0.75 * CAST(nf AS DOUBLE) / CAST(c1 AS DOUBLE) *
         |      (CAST(np AS DOUBLE) / tt)), 9) AS lp
         |  FROM bg JOIN c2 USING (prev, cur) JOIN c1 USING (prev)
         |  JOIN nf USING (prev) JOIN np USING (cur) CROSS JOIN tt),
         |agg AS (SELECT doc_id, list_reduce(list(lp ORDER BY pos), (a, b) -> a + b) AS s,
         |  count(*) AS n FROM lp GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(agg.n, 0) AS BIGINT) AS n_bigrams,
         | round(agg.s / agg.n, 6) AS kn_avg
         |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin),


    // LangID-eval twin (t19): t01's langid CTE, the same confusion
    // counts and the same P/R→F1 float chain.
    "t19_langid_eval" -> (
      s"""WITH tok AS (SELECT doc_id, lang, $tokensSqlExpr AS ws FROM documents),
         |sc AS (SELECT doc_id, lang,
         | len(list_filter(ws, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS s_en,
         | len(list_filter(ws, x -> list_contains(['el','la','de','y','que','en','un'], x))) AS s_es,
         | len(list_filter(ws, x -> list_contains(['der','die','das','und','zu','ein','ist'], x))) AS s_de,
         | len(list_filter(ws, x -> list_contains(['le','la','de','et','que','un','est'], x))) AS s_fr
         |FROM tok),
         |pr AS (SELECT lang AS label, CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
         | WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
         | WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
         | WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
         | ELSE 'fr' END AS pred FROM sc),
         |conf AS (SELECT label, pred, count(*) AS n FROM pr GROUP BY label, pred),
         |lt AS (SELECT label, CAST(sum(n) AS BIGINT) AS n_label FROM conf GROUP BY label),
         |pt AS (SELECT pred AS label, CAST(sum(n) AS BIGINT) AS n_pred FROM conf GROUP BY pred),
         |tp AS (SELECT label, CAST(n AS BIGINT) AS tp FROM conf WHERE label = pred),
         |u AS (SELECT coalesce(lt.label, pt.label) AS label,
         |    coalesce(n_label, 0) AS n_label, coalesce(n_pred, 0) AS n_pred
         |  FROM lt FULL OUTER JOIN pt ON lt.label = pt.label),
         |b AS (SELECT u.label, n_label, n_pred, coalesce(tp, 0) AS tp
         |  FROM u LEFT JOIN tp USING (label)),
         |m AS (SELECT label, n_label, n_pred, tp,
         |    CASE WHEN n_pred > 0 THEN CAST(tp AS DOUBLE) / CAST(n_pred AS DOUBLE) END AS precision,
         |    CASE WHEN n_label > 0 THEN CAST(tp AS DOUBLE) / CAST(n_label AS DOUBLE) END AS recall
         |  FROM b)
         |SELECT label, n_label, n_pred, tp, precision, recall,
         |  CASE WHEN coalesce(precision, 0.0) + coalesce(recall, 0.0) > 0.0
         |    THEN 2.0 * precision * recall / (precision + recall) END AS f1
         |FROM m ORDER BY label""".stripMargin),


    // Readability twin (t18): same tokenizer CTE, same vowel-group
    // syllable floor, same one-round formula.
    "t18_readability" -> (
      s"""WITH tok AS (SELECT doc_id, text, $tokensSqlExpr AS ws FROM documents),
         |c AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
         |  greatest(CAST(1 AS BIGINT),
         |    CAST(len(regexp_extract_all(text, '[.!?]+')) AS BIGINT)) AS n_sentences,
         |  CAST(list_sum(list_transform(ws, w -> greatest(CAST(1 AS BIGINT),
         |    CAST(len(regexp_extract_all(w, '[aeiouy]+')) AS BIGINT)))) AS BIGINT) AS n_syllables
         |  FROM tok)
         |SELECT doc_id, n_words, n_sentences, n_syllables,
         | round(206.835 - 1.015 * (CAST(n_words AS DOUBLE) / n_sentences)
         |   - 84.6 * (CAST(n_syllables AS DOUBLE) / n_words), 6) AS flesch
         |FROM c WHERE n_words > 0 ORDER BY doc_id""".stripMargin),


    // Portable rolling-fingerprint twin (t07): md5-low64 per token (d10's
    // base-hash expression), then the base-1000003 multiply-add fold with
    // Java-long wraparound in HUGEINT; empty token lists fold to 0 like
    // Spark's aggregate over an empty array.
    "t07_rolling_fingerprint_portable" -> (
      s"""WITH $portableRollingFpCtes
         |SELECT doc_id, fp64 FROM fps ORDER BY doc_id""".stripMargin),


    // Rolling-fingerprint cardinality contract (t04): DuckDB counts
    // distinct md5-fold fingerprints (= distinct token sequences absent
    // collisions); Spark's fp_card is the xx-family count.
    "t04_rolling_fingerprint" -> (
      s"""WITH $portableRollingFpCtes
         |SELECT d.doc_id, (SELECT count(DISTINCT fp64) FROM fps) AS fp_card,
         | TRUE AS card_agree
         |FROM documents d ORDER BY doc_id""".stripMargin),


    // Repetition twin (t08): raw (non-distinct) 3-grams rebuilt with the
    // same range/concat construction as the d10 shingle CTE minus the
    // list_distinct, counts materialized once, the shared 1−distinct/total
    // formula rounded to 6 dp, and the keep flag compared on the ROUNDED
    // value — so the keep/drop boundary cannot drift between engines.
    "t08_repetition" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |g AS (SELECT doc_id, CASE WHEN len(ws) >= 3
         |  THEN list_transform(range(len(ws) - 2), i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3])
         |  ELSE []::VARCHAR[] END AS g FROM tok),
         |c AS (SELECT doc_id, CAST(len(g) AS BIGINT) AS n_grams,
         |  CAST(len(list_distinct(g)) AS BIGINT) AS n_distinct FROM g),
         |f AS (SELECT doc_id, n_grams, n_distinct,
         |  CASE WHEN n_grams = 0 THEN 0.0
         |    ELSE round(1.0::DOUBLE - n_distinct::DOUBLE / n_grams::DOUBLE, 6)
         |  END AS dup_frac FROM c)
         |SELECT doc_id, n_grams, n_distinct, dup_frac, dup_frac <= 0.2 AS keep
         |FROM f ORDER BY doc_id""".stripMargin),


    // Unigram-LM twin (t09): the same frequency table, the same
    // 9-dp-rounded ln(c/total) per token, the same position-ordered left
    // fold (list_reduce over list(lp ORDER BY pos) ≡ Spark's aggregate
    // over the pos-sorted array: 0.0 + x == x exactly in IEEE, so the
    // missing explicit init changes nothing), the same 6-dp display round.
    "t09_ppl" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |tu AS (SELECT doc_id, unnest(ws) AS token, generate_subscripts(ws, 1) AS pos FROM tok),
         |f AS (SELECT token, count(*) AS c FROM tu GROUP BY token),
         |tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM f),
         |lp AS (SELECT doc_id, pos, round(ln(CAST(c AS DOUBLE) / total), 9) AS lp
         |  FROM tu JOIN f USING (token) CROSS JOIN tot),
         |agg AS (SELECT doc_id, list_reduce(list(lp ORDER BY pos), (a, b) -> a + b) AS s,
         |  count(*) AS n FROM lp GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(agg.n, 0) AS BIGINT) AS n_tokens,
         | round(agg.s / agg.n, 6) AS lp_avg
         |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin),


    // Bigram-LM twin (t10): same counts, same add-half smoothing (0.5 and
    // the integer counts are exact in both engines), t09's rounded-log +
    // position-sorted-fold determinism recipe.
    // BPE twin (t11): REPLAYS the 12 training rounds in SQL — per round, a
    // vocabulary pair-count CTE, a 1-row argmax CTE (count DESC, pair
    // lexicographic — the operator's exact ranking), and a merge
    // application via the SAME greedy left-to-right string fold
    // (list_reduce seeds the accumulator with the first symbol, so "the
    // accumulator's last symbol is exactly `a`" is `acc = a OR
    // ends_with(acc, ' '||a)`; a fused symbol a||b never re-matches). All
    // chain CTEs are MATERIALIZED — each round's state feeds two
    // consumers, and CTE inlining would expand the 12-round chain
    // exponentially. LEFT JOIN ON TRUE (not CROSS JOIN) keeps a
    // fully-merged vocabulary from vanishing: an empty argmax row makes
    // the fold's CASE test NULL = never-true, i.e. the identity merge —
    // matching the operator's early-stop. Ids, encoding, and est_ratio
    // then mirror Bpe.tokenIds/encode and the t03 estimator.
    "t11_bpe" -> bpeOracleSql(12),

    // Fertility twin (t30): t11's full BPE replay plus t32's full unigram
    // replay (shared chains), then per-language integer sums + guarded
    // ratio divisions for both models.
    "t30_fertility" -> bpeFertilityOracleSql(12, 200, 100, 2, 1),

    // Unigram tokenizer twin (t32): the full seed→EM→prune→EM→encode
    // replay — see unigramChainSql for the DP-fold correspondence.
    "t32_unigram" -> unigramOracleSql(200, 100, 2, 1),

    // Round-trip twin (t35): t32's full chain, then the concat-back
    // check and occurrence-weighted piece aggregates over usegE.
    "t35_roundtrip" -> unigramRoundtripOracleSql(200, 100, 2, 1),

    // Span-corruption twin (t36): same segment arithmetic, the d24
    // md5-u32 recipe per (doc_id | i), the same "start:3" plan string.
    "t36_span_corruption" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |p AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS n,
         |    CAST(len(ws) // 20 AS BIGINT) AS n_spans,
         |    CASE WHEN len(ws) // 20 > 0
         |      THEN CAST(len(ws) // (len(ws) // 20) AS BIGINT) END AS seg
         |  FROM tok),
         |sp AS (SELECT doc_id, i,
         |    i * seg + CAST(
         |      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '|' || CAST(i AS VARCHAR)), 1, 8)) AS UBIGINT)
         |      % CAST(seg - 2 AS UBIGINT) AS BIGINT) AS st
         |  FROM p, UNNEST(range(n_spans)) t(i) WHERE n_spans > 0),
         |agg AS (SELECT doc_id,
         |    string_agg(CAST(st AS VARCHAR) || ':3', ',' ORDER BY i) AS spans_str
         |  FROM sp GROUP BY doc_id)
         |SELECT p.doc_id, n AS n_tokens, n_spans,
         |  CAST(n_spans * 3 AS BIGINT) AS n_masked,
         |  CASE WHEN n > 0 THEN round(CAST(n_spans AS DOUBLE) * 3 / n, 6)
         |    ELSE 0.0 END AS mask_ratio,
         |  coalesce(spans_str, '') AS spans_str
         |FROM p LEFT JOIN agg USING (doc_id) ORDER BY p.doc_id""".stripMargin),


    // Greedy-rollout twin (t34): t10's bigram CTEs + unrolled argmax walk.
    "t34_generate" -> rolloutOracleSql(nSeeds = 3, steps = 12),

    // Novelty twin (t33): identical 3-gram shingle construction (the
    // d03 CTE), gram → min(doc_id), then per-first-doc counts; the
    // ratio is one double division of exact integers.
    "t33_novelty" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |g AS (SELECT doc_id, CASE WHEN len(ws) >= 3
         |  THEN list_distinct(list_transform(range(len(ws) - 2), i -> ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3]))
         |  ELSE [] END AS sh FROM tok),
         |base AS (SELECT doc_id, len(sh)::BIGINT AS n_grams FROM g),
         |e AS (SELECT doc_id, unnest(sh) AS gram FROM g),
         |nov AS (SELECT first_id, CAST(count(*) AS BIGINT) AS n_novel FROM
         |  (SELECT gram, min(doc_id) AS first_id FROM e GROUP BY gram) GROUP BY first_id)
         |SELECT b.doc_id, b.n_grams, coalesce(n.n_novel, 0)::BIGINT AS n_novel,
         |  CASE WHEN b.n_grams > 0
         |    THEN round(coalesce(n.n_novel, 0)::DOUBLE / b.n_grams, 9) END AS novelty
         |FROM base b LEFT JOIN nov n ON b.doc_id = n.first_id
         |ORDER BY b.doc_id""".stripMargin),


    // Held-out BPE twin (t13): training replayed on the even half, the
    // OOV merge fold replayed on the held-out word set, unknowns → -1.
    "t13_bpe_oov" -> bpeOovOracleSql(12),


    // Normalization twin (t17): identical dirty-text synthesis and the
    // identical RE2 class chain.
    "t17_normalize" ->
      """WITH d AS (SELECT doc_id,
        |  text || ' -- END!! ' || upper(substring(text, 1, 12)) || ' (c) 2026, v1.0?' AS dirty
        |  FROM documents)
        |SELECT doc_id, CAST(length(dirty) AS BIGINT) AS n_chars_in,
        | trim(regexp_replace(regexp_replace(lower(dirty), '[^a-z0-9\s]', ' ', 'g'),
        |   '\s+', ' ', 'g')) AS clean_text,
        | CAST(length(trim(regexp_replace(regexp_replace(lower(dirty), '[^a-z0-9\s]', ' ', 'g'),
        |   '\s+', ' ', 'g'))) AS BIGINT) AS n_chars_out,
        | CAST(len(list_filter(string_split(trim(regexp_replace(regexp_replace(lower(dirty),
        |   '[^a-z0-9\s]', ' ', 'g'), '\s+', ' ', 'g')), ' '), x -> length(x) > 0)) AS BIGINT) AS n_tokens
        |FROM d ORDER BY doc_id""".stripMargin,


    // tf-idf twin (t16): df derived from the tf CTE, N as a 1-row scalar,
    // the identical divide→ln→+1→×tf chain rounded to 9 dp before
    // ranking, row_number with the same (score DESC, term ASC) order.
    "t16_tfidf" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |tu AS (SELECT doc_id, unnest(ws) AS term FROM tok),
         |tf AS (SELECT doc_id, term, count(*) AS tf FROM tu GROUP BY doc_id, term),
         |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
         |n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
         |sc AS (SELECT doc_id, term,
         |  round(CAST(tf AS DOUBLE) *
         |    (ln((1.0 + n_docs) / (1.0 + CAST(df AS DOUBLE))) + 1.0), 9) AS tfidf
         |  FROM tf JOIN df USING (term) CROSS JOIN n),
         |r AS (SELECT doc_id, term, tfidf,
         |  row_number() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rnk
         |  FROM sc)
         |SELECT doc_id, rnk, term, tfidf FROM r WHERE rnk <= 3
         |ORDER BY doc_id, rnk""".stripMargin),


    // Line-dedup twin (t15): same token-slice synthesis, same
    // trim-filter, and the same keep-first rule via the 1-based
    // index-lambda strict-prefix membership test.
    "t15_line_dedup" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |m AS (SELECT doc_id,
         |  array_to_string(ws[1:6], ' ') || chr(10) || '  ' || chr(10) ||
         |  array_to_string(ws[7:12], ' ') || chr(10) ||
         |  array_to_string(ws[1:6], ' ') || chr(10) ||
         |  array_to_string(ws[7:12], ' ') AS mtext FROM tok),
         |l0 AS (SELECT doc_id,
         |  list_filter(list_transform(string_split(mtext, chr(10)), x -> trim(x)),
         |    x -> x <> '') AS lines FROM m),
         |k AS (SELECT doc_id, CAST(len(lines) AS BIGINT) AS n_lines,
         |  list_filter(lines, (x, i) ->
         |    coalesce(list_position(lines[1:i-1], x), 0) = 0) AS kept FROM l0)
         |SELECT doc_id, n_lines, CAST(len(kept) AS BIGINT) AS n_kept,
         |  array_to_string(kept, chr(10)) AS clean_text
         |FROM k ORDER BY doc_id""".stripMargin),


    // Boilerplate twin (t14): same synthesized HTML, same head-strip +
    // chr(1)-sentinel segment split (RE2 has no lookahead — the split
    // point is materialized on both engines), same length-difference
    // anchor count and integer link-density gate.
    "t14_boilerplate" ->
      """WITH h AS (SELECT doc_id,
        |  '<html><head><title>' || source || '</title></head><body>' ||
        |  '<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>' ||
        |  '<p>' || text ||
        |  CASE WHEN doc_id % 5 = 0 THEN ' <a href="/x">click here</a>' ELSE '' END ||
        |  '</p>' ||
        |  '<div class="footer"><a href="/t">Terms</a> <a href="/p">Privacy</a></div></body></html>'
        |  AS html FROM documents),
        |pre AS (SELECT doc_id, regexp_replace(html, '(?s)<head\b[^>]*>.*?</head>', '') AS ph FROM h),
        |seg AS (SELECT doc_id,
        |  string_split(regexp_replace(ph, '<(p|nav|div|h1|footer)\b', chr(1) || '<\1', 'g'),
        |    chr(1)) AS segs FROM pre),
        |st AS (SELECT doc_id, list_transform(segs, s -> struct_pack(
        |    txt := trim(regexp_replace(regexp_replace(s, '<[^>]*>', ' ', 'g'), '\s+', ' ', 'g')),
        |    links := CAST((length(s) - length(regexp_replace(s, '<a ', '', 'g'))) / 3 AS BIGINT)))
        |  AS ss FROM seg),
        |res AS (SELECT doc_id,
        |  CAST(len(ss) AS BIGINT) AS n_segments,
        |  list_filter(ss, x -> x.txt <> '' AND
        |    x.links * 3 <= len(string_split(x.txt, ' '))) AS kept
        |  FROM st)
        |SELECT doc_id, n_segments,
        |  CAST(len(kept) AS BIGINT) AS n_kept,
        |  array_to_string(list_transform(kept, x -> x.txt), ' ') AS clean_text,
        |  CAST(CASE WHEN array_to_string(list_transform(kept, x -> x.txt), ' ') = '' THEN 0
        |    ELSE len(string_split(array_to_string(list_transform(kept, x -> x.txt), ' '), ' '))
        |  END AS BIGINT) AS clean_tokens
        |FROM res ORDER BY doc_id""".stripMargin,


    // Classifier twin (t12): the operator's weight vector embedded as a
    // DOUBLE[] literal (Double.toString round-trips exactly), the same
    // md5-low64 → pmod(64) feature hash, and the same strict
    // left-to-right folds (list_reduce seeds with the first element —
    // adding to an exact 0.0 seed or starting from w1 is bit-identical).
    // exp sits on the 9-dp-rounded mean; keep compares the 6-dp score.
    "t12_clf" -> (
      s"""WITH w(wv) AS (SELECT [${analytics.QualityClassifier.weights.mkString(", ")}]::DOUBLE[]),
         |tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |g AS (SELECT doc_id, ws, CASE WHEN len(ws) >= 2
         |  THEN list_transform(range(len(ws) - 1), i -> ws[i+1] || ' ' || ws[i+2])
         |  ELSE []::VARCHAR[] END AS bg FROM tok),
         |f AS (SELECT doc_id, CAST(len(ws) + len(bg) AS BIGINT) AS n_feats,
         |  (CASE WHEN len(ws) = 0 THEN 0.0 ELSE list_reduce(
         |     list_transform(ws, s -> wv[CAST((($md5Low64SqlExpr) % 64 + 64) % 64 AS INT) + 1]),
         |     (a, b) -> a + b) END)
         |  + (CASE WHEN len(bg) = 0 THEN 0.0 ELSE list_reduce(
         |     list_transform(bg, s -> wv[CAST((($md5Low64SqlExpr) % 64 + 64) % 64 AS INT) + 1]),
         |     (a, b) -> a + b) END) AS s
         |  FROM g CROSS JOIN w),
         |z AS (SELECT doc_id, n_feats,
         |  CASE WHEN n_feats = 0 THEN NULL
         |       ELSE round(${analytics.QualityClassifier.Bias} + s / n_feats, 9) END AS z FROM f),
         |sc AS (SELECT doc_id, n_feats, round(1.0 / (1.0 + exp(-z)), 6) AS score FROM z)
         |SELECT doc_id, n_feats, score, COALESCE(score >= 0.5, FALSE) AS keep
         |FROM sc ORDER BY doc_id""".stripMargin),


    "t10_lm2" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |v AS (SELECT CAST(count(DISTINCT t) AS DOUBLE) AS vsz FROM
         |  (SELECT unnest(ws) AS t FROM tok)),
         |bg AS (SELECT doc_id, i AS pos, ws[i+1] AS prev, ws[i+2] AS cur
         |  FROM tok, UNNEST(range(len(ws) - 1)) AS u(i) WHERE len(ws) >= 2),
         |c2 AS (SELECT prev, cur, count(*) AS c2 FROM bg GROUP BY prev, cur),
         |c1 AS (SELECT prev, count(*) AS c1 FROM bg GROUP BY prev),
         |lp AS (SELECT doc_id, pos,
         |  round(ln((CAST(c2 AS DOUBLE) + 0.5) / (CAST(c1 AS DOUBLE) + 0.5 * vsz)), 9) AS lp
         |  FROM bg JOIN c2 USING (prev, cur) JOIN c1 USING (prev) CROSS JOIN v),
         |agg AS (SELECT doc_id, list_reduce(list(lp ORDER BY pos), (a, b) -> a + b) AS s,
         |  count(*) AS n FROM lp GROUP BY doc_id)
         |SELECT d.doc_id, CAST(coalesce(agg.n, 0) AS BIGINT) AS n_bigrams,
         | round(agg.s / agg.n, 6) AS lp2_avg
         |FROM documents d LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin),


    "t06_top_terms" -> (
      s"""WITH tok AS (SELECT lang, unnest($tokensSqlExpr) AS token FROM documents),
         |c AS (SELECT lang, token, count(*) AS n FROM tok GROUP BY lang, token),
         |r AS (SELECT lang, token, n,
         |  row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS rnk FROM c)
         |SELECT lang, CAST(rnk AS BIGINT) AS rnk, token, CAST(n AS BIGINT) AS n
         |FROM r WHERE rnk <= 5 ORDER BY lang, rnk""".stripMargin),


    "t01_langid" -> (
      s"""WITH tok AS (SELECT doc_id, $tokensSqlExpr AS ws FROM documents),
         |sc AS (SELECT doc_id,
         | len(list_filter(ws, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS s_en,
         | len(list_filter(ws, x -> list_contains(['el','la','de','y','que','en','un'], x))) AS s_es,
         | len(list_filter(ws, x -> list_contains(['der','die','das','und','zu','ein','ist'], x))) AS s_de,
         | len(list_filter(ws, x -> list_contains(['le','la','de','et','que','un','est'], x))) AS s_fr
         |FROM tok)
         |SELECT doc_id, CASE WHEN greatest(s_en, s_es, s_de, s_fr) = 0 THEN 'und'
         | WHEN s_en = greatest(s_en, s_es, s_de, s_fr) THEN 'en'
         | WHEN s_es = greatest(s_en, s_es, s_de, s_fr) THEN 'es'
         | WHEN s_de = greatest(s_en, s_es, s_de, s_fr) THEN 'de'
         | ELSE 'fr' END AS lang_pred
         |FROM sc ORDER BY doc_id""".stripMargin),


    "t02_quality" -> (
      s"""WITH tok AS (SELECT doc_id, text, $tokensSqlExpr AS ws FROM documents),
         |f AS (SELECT doc_id, text, len(ws) AS n_tokens,
         | CASE WHEN len(ws) = 0 THEN 0.0 ELSE CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE) / len(ws) END AS avg_word_len,
         | CASE WHEN length(text) = 0 THEN 0.0 ELSE CAST(length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{-~]', '', 'g')) AS DOUBLE) / length(text) END AS punct_ratio,
         | CASE WHEN len(ws) = 0 THEN 0.0 ELSE CAST(len(list_filter(ws, x -> list_contains(['the','a','of','and','to','in','is'], x))) AS DOUBLE) / len(ws) END AS stopword_ratio
         |FROM tok)
         |SELECT doc_id, n_tokens, avg_word_len, punct_ratio, stopword_ratio,
         | 0.4 * least(CAST(length(text) AS DOUBLE) / 500.0, 1.0) + 0.4 * stopword_ratio + 0.2 * (1.0 - punct_ratio) AS quality
         |FROM f ORDER BY doc_id""".stripMargin),


    "t03_token_count" -> (
      s"""WITH tok AS (SELECT lang, $tokensSqlExpr AS ws FROM documents)
         |SELECT lang, CAST(sum(CAST(len(ws) AS BIGINT)) AS BIGINT) AS total_tokens,
         | CAST(sum(list_sum(list_transform(ws, x -> CAST(ceil(length(x) / 4.0) AS BIGINT)))) AS BIGINT) AS total_bpe_est,
         | count(*) AS n_docs
         |FROM tok GROUP BY lang ORDER BY lang""".stripMargin),


    "t05_pii_scrub" ->
      """WITH p AS (SELECT doc_id,
        | text || ' contact user' || doc_id || '@example.com'
        |      || ' from 10.0.0.' || (doc_id % 256)
        |      || ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        |FROM documents)
        |SELECT doc_id, scrubbed,
        | CAST(len(string_split(scrubbed, '<EMAIL>')) - 1 AS BIGINT) AS n_email,
        | CAST(len(string_split(scrubbed, '<IP>')) - 1 AS BIGINT) AS n_ipv4,
        | CAST(len(string_split(scrubbed, '<SSN>')) - 1 AS BIGINT) AS n_ssn
        |FROM (SELECT doc_id,
        | regexp_replace(regexp_replace(regexp_replace(text,
        |   '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |   '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '<IP>', 'g'),
        |   '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g') AS scrubbed
        |FROM p) ORDER BY doc_id""".stripMargin,


    // WordPiece twin (t37): the identical vocabulary seed (top-40
    // substrings + singles) and all 6 greedy longest-match steps,
    // unrolled (see wordPieceOracleSql).
    "t37_wordpiece" -> wordPieceOracleSql(topPieces = 40, maxInputChars = 6),
  )
}
