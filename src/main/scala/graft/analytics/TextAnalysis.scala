package graft.analytics

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, token-count estimates, quality scoring, n-gram language ID,
  * and document fingerprinting. All are per-row column expressions —
  * embarrassingly parallel, no shuffle, whole-stage-codegen friendly — which
  * is exactly the shape that survives a 100 TB scan.
  */
object TextAnalysis {

  /** Whitespace tokenization of normalized text (lowercase, collapsed
    * whitespace). Empty tokens filtered.
    */
  def tokens(text: Column): Column =
    filter(split(trim(lower(text)), "\\s+"), t => length(t) > 0)

  /** Exact whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast(LongType)

  /** BPE-ish subword-count estimate: each word contributes
    * ceil(len/4) units — the classic "~4 chars per token" heuristic,
    * computed exactly so it is oracle-checkable.
    */
  def bpeTokenEstimate(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + ceil(length(t).cast(DoubleType) / 4.0).cast(LongType))

  /** Ratio of punctuation characters to total characters. */
  def punctRatio(text: Column): Column = {
    val total = length(text)
    when(total === 0, lit(0.0)).otherwise(
      (total - length(regexp_replace(text, "[\\p{Punct}]", ""))).cast(DoubleType)
        / total.cast(DoubleType))
  }

  /** Small closed stopword sets per language for the n-gram(1) language-ID
    * heuristic and the stopword-ratio quality feature.
    */
  val Stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un"),
    "de" -> Seq("der", "die", "das", "und", "zu", "ein", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "que", "un", "est"))

  private def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit(_)): _*))).cast(LongType)

  /** Stopword ratio against the English set (quality feature). */
  def stopwordRatio(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      stopwordHits(toks, Stopwords("en")).cast(DoubleType)
        / size(toks).cast(DoubleType))
  }

  /** Mean word length in characters. */
  def avgWordLen(text: Column): Column = {
    val toks = tokens(text)
    when(size(toks) === 0, lit(0.0)).otherwise(
      aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast(DoubleType)
        / size(toks).cast(DoubleType))
  }

  /** Composite quality score in [0,1]: rewards reasonable length and
    * stopword presence, penalizes punctuation density. Weights are part of
    * the operator's declared semantics (deterministic, oracle-checkable).
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text).cast(DoubleType) / 500.0, lit(1.0))
    lit(0.4) * lenScore + lit(0.4) * stopwordRatio(text) +
      lit(0.2) * (lit(1.0) - punctRatio(text))
  }

  /** Language-ID by stopword-marker voting: argmax of per-language hit
    * counts with a fixed priority order (en, es, de, fr) breaking ties;
    * "und" when no marker hits at all.
    */
  def langId(text: Column): Column = {
    val toks = tokens(text)
    val scores = Seq("en", "es", "de", "fr").map(l => l -> stopwordHits(toks, Stopwords(l)))
    val best = greatest(scores.map(_._2): _*)
    scores.foldLeft(when(best === 0, lit("und"))) { case (acc, (lang, s)) =>
      acc.when(s === best, lit(lang))
    }.otherwise(lit("und"))
  }

  /** Content fingerprint: md5 of normalized text (lowercased, whitespace
    * collapsed). Exact-dedup key that is portable across engines.
    */
  def contentFingerprint(text: Column): Column =
    md5(regexp_replace(trim(lower(text)), "\\s+", " "))

  /** Rolling polynomial hash over the token stream (base 1000003 over
    * per-token xxhash64) — an order-sensitive 64-bit document fingerprint,
    * computed in one pass per row.
    */
  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc * lit(1000003L) + xxhash64(t))
}
