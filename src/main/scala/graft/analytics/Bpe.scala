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
    * lexicographically on (a, b), so the sequence is reproducible on any
    * engine with the same word set.
    */
  def train(docs: DataFrame, nMerges: Int,
      textCol: String = "text"): (Seq[Merge], DataFrame) = {
    var vocab = wordFreqs(docs, textCol)
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
    * final symbols, ids assigned in lexicographic order. Global window
    * over a vocabulary-sized set (id assignment is a build-once artifact,
    * like the t09 frequency table — never a corpus-sized sort).
    */
  def tokenIds(vocab: DataFrame): DataFrame =
    vocab.select(explode(split(col("symstr"), " ")).as("tokstr")).distinct()
      .withColumn("tok_id",
        (row_number().over(Window.orderBy(col("tokstr"))) - 1).cast(LongType))

  /** Encode documents against a trained vocabulary: per document, the
    * real BPE token count and the comma-joined token-id sequence (in
    * token order — collect + array_sort on (pos, spos), the t09
    * position-determinism recipe). The corpus is scanned once; vocabulary
    * and id table broadcast. Documents with no tokens encode to
    * (0, ""). Assumes every corpus word is in `vocab` (true whenever
    * encoding the corpus the vocabulary was trained on); production OOV
    * handling replays the merge list via [[applyMerge]] on the missing
    * words first.
    */
  def encode(docs: DataFrame, vocab: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ids = tokenIds(vocab)
    val toks = Par.spreadForCpu(docs)
      .select(col(idCol), posexplode(TextAnalysis.tokens(col(textCol)))
        .as(Seq("pos", "word")))
    val sub = toks
      .join(broadcast(vocab.select(col("word"), split(col("symstr"), " ").as("syms"))),
        Seq("word"))
      .select(col(idCol), col("pos"), posexplode(col("syms")).as(Seq("spos", "tokstr")))
      .join(broadcast(ids), Seq("tokstr"))
    val enc = sub
      .groupBy(col(idCol))
      .agg(collect_list(struct(col("pos"), col("spos"), col("tok_id"))).as("ts"))
      .select(col(idCol),
        transform(array_sort(col("ts")), x => x.getField("tok_id").cast("string")).as("ids"))
      .select(col(idCol), size(col("ids")).cast(LongType).as("n_bpe"),
        array_join(col("ids"), ",").as("ids_str"))
    docs.select(col(idCol)).join(enc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bpe"), lit(0L)).as("n_bpe"),
        coalesce(col("ids_str"), lit("")).as("ids_str"))
  }
}
