package graft.analytics

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
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
  /** The ONE Misra-Gries summary merge — shared by the batch
    * [[MisraGries]] Aggregator and the streaming
    * [[graft.streaming.Stream.HeavyHittersProcessor]] so the two can
    * never apply different decrement rules (the bandBucketKeys no-drift
    * convention). Sums the two summaries, then (if over k counters)
    * subtracts the (k+1)-th largest value uniformly and drops
    * non-positive counters — the Agarwal et al. (PODS'12) mergeable-
    * summaries rule; works for ANY input maps (an exact per-batch count
    * map included), preserving undercount ≤ n/(k+1).
    */
  private[graft] def mgMerge(k: Int)(a: Map[String, Long],
      b: Map[String, Long]): Map[String, Long] = {
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

    override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
      mgMerge(k)(a, b)

    override def finish(b: Map[String, Long]): Seq[String] = b.keys.toSeq.sorted

    override def bufferEncoder: Encoder[Map[String, Long]] =
      Encoders.kryo[Map[String, Long]]
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** K-Minimum-Values set sketch and the overlap estimator built on it
    * (Beyer et al. 2007, "On synopses for distinct-value estimation
    * under multiset operations"): a set's sketch is its k smallest
    * md5(key) values; cardinality ≈ (k−1)/u_k where u_k is the k-th
    * smallest hash mapped to (0,1]. The property that matters for a
    * 100 TB release pipeline is MERGEABILITY UNDER SET OPS: the union's
    * sketch is computable from the two sketches alone (k smallest of
    * their union), and an element of the union sketch that appears in
    * BOTH input sketches is certifiably in A∩B — so
    * |A∩B| ≈ (matches/|sketch(U)|)·|A∪B|̂ comes from 2·k hashes, never
    * the data (the denominator is the union sketch's actual size: k
    * once the union overflows it, exact-count territory below). A
    * sketch that holds its whole set (n < k) estimates EXACTLY n.
    * Snapshot diffing across shards = ship k hashes per shard, not rows.
    *
    * Everything is deterministic (md5 order, exact integer counts, one
    * fixed-shape double expression per estimate), so unlike HLL the
    * estimates themselves hash-match the SQL twin. Returns one row:
    * exact n_a/n_b/n_inter beside est_a/est_b/est_union/est_inter
    * (round 4). Exact counts are computed here for the exhibit; the
    * production path drops them and keeps only the sketches.
    *
    * Scale shape: each sketch is a TakeOrderedAndProject (top-k by
    * hash, partial per partition, k rows to the driver-side merge —
    * never a global sort); the estimator touches only 1-row aggregates
    * and k-row joins.
    */
  def kmvOverlap(elemsA: DataFrame, elemsB: DataFrame, hashCol: String,
      k: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    // no persist: each sketch is a k-row TakeOrderedAndProject — cheaper
    // to recompute per consumer than to leak cache entries across the
    // catalog (the t26 lesson)
    def sk(e: DataFrame) = e.select(col(hashCol).as("h")).distinct()
      .orderBy(col("h")).limit(k)
    val skA = sk(elemsA)
    val skB = sk(elemsB)
    val skU = sk(skA.unionByName(skB)) // mergeability: sketches only
    // (k−1)/u_k with u_k = first 32 hash bits mapped to (0,1] — except
    // when the sketch holds the WHOLE set (n < k), where standard KMV
    // returns the exact count (the (n−1)/u_k form biases small sets
    // low); u_k = 0 (a hash starting "00000000") is guarded to NULL
    // rather than dividing by zero
    def est(skdf: DataFrame, name: String) = skdf
      .agg(max(col("h")).as("hk"), count(lit(1)).as("n"))
      .select(when(col("n") < k, round(col("n").cast("double"), 4))
        .otherwise(round((col("n") - 1).cast("double") /
          nullif(conv(substring(col("hk"), 1, 8), 16, 10).cast("double") /
            lit(4294967296.0), lit(0.0)), 4)).as(name),
        col("n").as(s"${name}_sk_n"))
    val matches = skU
      .join(skA.withColumnRenamed("h", "h2"), col("h") === col("h2"), "left_semi")
      .join(skB.withColumnRenamed("h", "h2"), col("h") === col("h2"), "left_semi")
      .agg(count(lit(1)).as("matches"))
    val exact = elemsA.select(col(hashCol).as("h")).distinct()
      .withColumn("ina", lit(1L))
      .join(elemsB.select(col(hashCol).as("h")).distinct()
        .withColumn("inb", lit(1L)), Seq("h"), "full_outer")
      .agg(sum(coalesce(col("ina"), lit(0L))).as("n_a"),
        sum(coalesce(col("inb"), lit(0L))).as("n_b"),
        sum(when(col("ina").isNotNull && col("inb").isNotNull, 1L)
          .otherwise(0L)).as("n_inter"))
    // est_inter scales matches by the union sketch's ACTUAL size, not
    // the constant k — with a fully-held union (|sketch(U)| < k) the
    // k-denominator reads a complete containment as < 1.0 overlap
    exact
      .join(est(skA, "est_a")).join(est(skB, "est_b"))
      .join(est(skU, "est_union")).join(matches)
      .select(lit(k).as("k"), col("n_a"), col("n_b"), col("n_inter"),
        col("est_a"), col("est_b"), col("est_union"), col("matches"),
        round(col("matches").cast("double") / col("est_union_sk_n") *
          col("est_union"), 4).as("est_inter"))
  }
}
