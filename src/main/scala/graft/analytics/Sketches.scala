package graft.analytics

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mergeable frequency sketches — the E-family's bounded-memory answer to
  * "top terms over a stream you cannot afford to shuffle". A full
  * `groupBy(term)` materializes the whole vocabulary (fine for documents'
  * 31-token pool, fatal for open-vocabulary 100 TB text); a Misra-Gries
  * summary holds exactly k counters per partition and merges
  * associatively, so the partial-aggregation path Spark already runs for
  * typed aggregators IS the sketch deployment: per-partition summaries →
  * pairwise merge → one driver-sized candidate set.
  */
object Sketches {

  /** Misra-Gries heavy-hitters summary (Misra & Gries 1982) with the
    * mergeable-summaries combine rule (Agarwal et al., PODS 2012).
    *
    * State: ≤ k (term, counter) pairs.
    *  - reduce: increment a present term; insert if a slot is free; else
    *    decrement EVERY counter by 1 (the arriving singleton cancels with
    *    them), dropping zeros.
    *  - merge: sum both summaries' counters, then subtract the (k+1)-th
    *    largest value from every counter and drop non-positives — at most
    *    k survive (only counters STRICTLY above the cut).
    *
    * Guarantee (order- and partitioning-invariant, which is what the spec
    * asserts): every decrement step cancels equal mass from ≥ k+1 distinct
    * terms' counts, so total undercount per term ≤ n/(k+1). Hence any term
    * with true frequency > n/(k+1) has a positive counter in ANY
    * merge tree's final summary — the candidate set provably contains all
    * heavy hitters; exact counts for the survivors come from a second
    * pass (q47's shape: sketch pass + exact pass over the candidates).
    *
    * The candidate SET is deterministic only down to the guarantee (which
    * near-threshold terms survive depends on merge order), so q47's
    * oracle contract is the q30/q35 sketch pattern: the exact heavy
    * hitters are hash-matched, and membership in the sketch is an
    * asserted-TRUE flag backed by the proof above.
    */
  final class MisraGries(k: Int)
      extends Aggregator[String, Map[String, Long], Seq[String]] {
    require(k >= 1, s"need at least one counter, got $k")

    override def zero: Map[String, Long] = Map.empty

    override def reduce(b: Map[String, Long], term: String): Map[String, Long] =
      b.get(term) match {
        case Some(c)            => b.updated(term, c + 1L)
        case None if b.size < k => b.updated(term, 1L)
        case None =>
          b.collect { case (t, c) if c > 1L => t -> (c - 1L) }
      }

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val sum = b.foldLeft(a) { case (m, (t, c)) =>
        m.updated(t, m.getOrElse(t, 0L) + c)
      }
      if (sum.size <= k) sum
      else {
        // (k+1)-th largest counter value is the uniform subtrahend
        val cut = sum.valuesIterator.toIndexedSeq
          .sorted(Ordering[Long].reverse).apply(k)
        sum.collect { case (t, c) if c > cut => t -> (c - cut) }
      }
    }

    override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }
}
