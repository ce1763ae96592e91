package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing — the step between a curated document set and a
  * training run: concatenate documents (in a deterministic order) into
  * fixed token-budget training sequences and record, per document, which
  * sequence it lands in and at what offset. Downstream, a tokenizer writes
  * each document's tokens at (seq_id, offset) and splits the ones that
  * cross a boundary — the same convention as fixed-width chunking, so the
  * assignment here is pure arithmetic over token counts.
  */
object Packing {

  /** Greedy contiguous packing: within each `partCol` stratum, documents
    * in `idCol` order fill `budget`-token sequences back-to-back; each
    * document is assigned to the sequence containing its START offset
    * (`seq_id = start / budget`, `offset = start % budget`, where `start`
    * is the running token count before it). Documents longer than the
    * remaining room span into the next sequence — the splitter's concern,
    * not the planner's — so no token of the stream is ever skipped and no
    * sequence under-fills except the stratum's last.
    *
    * Scale shape: ONE window per stratum (no global sort) — `partCol` is
    * the shuffle key and sequences are namespaced by it. At 100 TB the
    * stratum is (source, hash-shard) rather than language, which bounds
    * every window's width while keeping the assignment deterministic;
    * the arithmetic is unchanged.
    */
  def packSequences(docs: DataFrame, budget: Int, partCol: String = "lang",
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    packFromCounts(
      docs.select(col(partCol), col(idCol),
        TextAnalysis.tokenCountFromTokens(TextAnalysis.tokens(col(textCol))).as("n_tokens")),
      budget, partCol, idCol)
      .select(col(partCol), col(idCol), col("n_tokens"),
        col("seq_id"), col("off"))

  /** The packing arithmetic alone, over ALREADY-COMPUTED token counts —
    * split out so a pipeline that has scored its documents once (q101's
    * release capstone rides q38's n_tokens) packs WITHOUT re-tokenizing;
    * [[packSequences]] is the tokenize-then-pack composition. Appends
    * `start`, `seq_id`, `off` to the input frame.
    */
  def packFromCounts(scored: DataFrame, budget: Int, partCol: String = "lang",
      idCol: String = "doc_id", countCol: String = "n_tokens"): DataFrame = {
    require(budget > 0, s"token budget must be positive, got $budget")
    val w = Window.partitionBy(col(partCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    scored
      .withColumn("start", sum(col(countCol)).over(w) - col(countCol))
      // pure INTEGER division (SQL `div`), matching the oracle's `//`:
      // a double-rounded `/` quotient can cross the integer boundary for
      // start within ~2/budget of a multiple of budget near 2^53 and
      // mis-bin the document — start is a token count, but 100 TB-scale
      // strata make 2^53 tokens merely improbable, not impossible
      .withColumn("seq_id",
        expr(s"start div CAST($budget AS BIGINT)").cast(LongType))
      .withColumn("off", pmod(col("start"), lit(budget.toLong)).cast(LongType))
  }
}
