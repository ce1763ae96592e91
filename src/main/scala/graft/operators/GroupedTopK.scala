package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Grouped top-k as a partially-aggregated bounded-state operator.
  *
  * Spark itself already rescues the adjacent `row_number() over (…) <= k`
  * pattern (q37's qualityQuota shape): since 3.5, `InferWindowGroupLimit`
  * plans Sort → WindowGroupLimit(Partial) BELOW the exchange, so only k
  * rows per (map partition, key) shuffle — the window form's shuffle is
  * already n-independent (measured in OperatorsSpec; do not "fix" q37).
  * What the window plan CANNOT avoid is the full per-map-partition
  * `Sort [key, score desc, id]` feeding the partial group limit: every
  * input row is sorted, O(n log n) comparisons, and at 100 TB that sort
  * (with its spills) IS the plan's cost. It also only fires when the
  * rank filter is syntactically adjacent to the window — a top-k
  * consumed as a VALUE (nested in another aggregation, joined, or
  * re-aggregated) gets the unbounded window plan.
  *
  * Top-k is an associative, commutative reduction — `topK(A ∪ B) =
  * topK(topK(A) ∪ topK(B))` for any split, because a row outside a
  * part's top k is outside the union's top k (k rows in its own part
  * already beat it). So it aggregates: a typed [[TopKAgg]] under
  * `groupBy(keys).agg(...)` runs on Spark's ObjectHashAggregate
  * partial/final path with NO sort anywhere below the exchange — each
  * map task keeps at most 2k−1 (score, id) pairs per key at O(n log k)
  * amortized comparisons, and the exchange carries ONE ≤k-element buffer
  * row per (map partition, key) instead of k individual rows. And being
  * an aggregate, the per-group top array composes wherever the
  * WindowGroupLimit pattern-match cannot reach. OperatorsSpec pins the
  * row-for-row equivalence with the window form, the no-sort plan shape,
  * and the shuffle-record receipt (≤ partitions·|keys| buffers).
  *
  * Determinism: the total order is (score desc, id asc); with unique
  * ids the selected SET and its ranking are a pure function of the input
  * multiset, so the result is partitioning- and merge-order-invariant
  * (the ParityGate property). Null scores or ids are dropped before the
  * aggregate (a null score is unrankable; the window twin's
  * `desc_nulls_last` would instead rank them beyond any real row —
  * callers that need nulls keep the window form). NaN scores are
  * rejected by the same filter (`isnan`): Spark's `Ordering[Double]`
  * sorts NaN above +Infinity while SQL engines disagree, so admitting
  * them would make the contract engine-specific.
  */
object GroupedTopK {

  /** The ONE (score desc, id asc) total order shared by the batch
    * [[TopKAgg]] and the streaming
    * [[graft.streaming.Stream.GroupedTopKProcessor]] — the
    * bandBucketKeys/mgMerge no-drift convention: batch and stream must
    * never rank by different rules. Safe to encode as (-score, id)
    * because NaN is filtered at the operator boundaries and -0.0 vs 0.0
    * ties fall through to the unique id.
    */
  private[graft] val ord: Ordering[(Double, Long)] =
    Ordering.by { case (score, id) => (-score, id) }

  /** Sort + truncate to the k best under [[ord]] (identity below k). */
  private[graft] def compactTo(k: Int, b: Seq[(Double, Long)]): Seq[(Double, Long)] =
    if (b.lengthCompare(k) <= 0) b else b.sorted(ord).take(k)

  /** Exact top-k summary: state is at most 2k−1 (score, id) pairs.
    *
    *  - reduce: append; compact (sort + truncate to k) when the buffer
    *    reaches 2k, so compaction costs O(k log k) every k rows —
    *    amortized O(log k) per row, and the buffer never exceeds 2k−1.
    *  - merge: concatenate and compact — the topK(topK ∪ topK) identity
    *    above makes this exact for ANY merge tree.
    *  - finish: sort the surviving ≤2k−1 pairs, emit exactly min(k, n)
    *    in rank order (the output array IS the ranking).
    *
    * Buffer/output encoders are ExpressionEncoders over product types
    * (tungsten rows, no kryo) — the buffer crosses the wire once per
    * (map partition, key).
    */
  final class TopKAgg(k: Int)
      extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    require(k >= 1, s"top-k needs k >= 1, got $k")

    private def compact(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      GroupedTopK.compactTo(k, b)

    override def zero: Seq[(Double, Long)] = Vector.empty

    override def reduce(b: Seq[(Double, Long)], row: (Double, Long)): Seq[(Double, Long)] = {
      val grown = b :+ row
      if (grown.lengthCompare(2 * k) >= 0) compact(grown) else grown
    }

    override def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      compact(a ++ b)

    override def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] =
      b.sorted(ord).take(k)

    override def bufferEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
    override def outputEncoder: Encoder[Seq[(Double, Long)]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Double, Long)]]()
  }

  /** Top-k rows per key group: `keys…, rnk (1-based), idCol, scoreCol` —
    * the exact rows `row_number() over (partition by keys order by score
    * desc, id) <= k` keeps, at aggregate shuffle cost. `idCol` must be
    * unique (it is the tiebreak that makes the selection deterministic);
    * rows with null/NaN score or null id are dropped (see object doc).
    */
  def topKPerKey(df: DataFrame, keys: Seq[String], scoreCol: String,
      idCol: String, k: Int): DataFrame = {
    val topk = udaf(new TopKAgg(k),
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaLong))
    val keyCols: Seq[Column] = keys.map(col)
    df.where(col(scoreCol).isNotNull && !isnan(col(scoreCol).cast("double")) &&
        col(idCol).isNotNull)
      .groupBy(keyCols: _*)
      .agg(topk(col(scoreCol).cast("double"), col(idCol).cast("bigint")).as("top"))
      .select(keyCols :+ posexplode(col("top")).as(Seq("pos", "t")): _*)
      .select(keyCols ++ Seq(
        (col("pos") + 1).cast("bigint").as("rnk"),
        col("t._2").as(idCol),
        col("t._1").as(scoreCol)): _*)
  }
}
