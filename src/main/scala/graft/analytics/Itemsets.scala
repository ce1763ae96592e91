package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset mining, the pair level — co-occurrence analysis over
  * transactions (co-purchased parts, co-cited pages, co-occurring tags)
  * with the a-priori guarantee doing the scale work: a pair can only be
  * frequent if BOTH items are, so items below `minItemSupport` are pruned
  * BEFORE the self-join and the pair space shrinks from |items|² to the
  * frequent-item co-occurrence actually present in the data.
  *
  * Scale shape: one distinct shuffle, one item-support aggregation, one
  * transaction-keyed self-join of the PRUNED item list (per-transaction
  * fan-out is C(k,2) over frequent items only — the knob a pipeline turns
  * when a pathological basket appears is `minItemSupport`), one pair
  * aggregation. Lift is a single double division of exact integer counts
  * (cross-engine bit-identical, no rounding).
  */
object Itemsets {

  /** Frequent co-occurring pairs with support counts and lift.
    * `tx` rows are (transaction, item) observations (duplicates fine —
    * the first distinct collapses them). Output: (p1, p2, n_pairs, s1,
    * s2, lift) with p1 < p2, gated at `minPairSupport`.
    */
  def frequentPairs(tx: DataFrame, txCol: String, itemCol: String,
      minItemSupport: Long, minPairSupport: Long,
      checkpoint: Boolean = true): DataFrame = {
    val items = tx.select(col(txCol).as("o"), col(itemCol).as("p")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTx = items.select(col("o")).distinct()
      .agg(count(lit(1)).as("n_tx"))
    val sup = items.groupBy(col("p")).agg(count(lit(1)).as("s"))
    val pruned = items.join(sup.where(col("s") >= minItemSupport), Seq("p"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pairs = pruned.select(col("o"), col("p").as("p1"), col("s").as("s1"))
      .join(pruned.select(col("o"), col("p").as("p2"), col("s").as("s2")),
        Seq("o"))
      .where(col("p1") < col("p2"))
      .groupBy(col("p1"), col("p2"), col("s1"), col("s2"))
      .agg(count(lit(1)).as("n_pairs"))
      .where(col("n_pairs") >= minPairSupport)
    val projected = pairs.crossJoin(broadcast(nTx))
      .select(col("p1"), col("p2"), col("n_pairs"), col("s1"), col("s2"),
        ((col("n_pairs") * col("n_tx")).cast("double") /
          (col("s1") * col("s2")).cast("double")).as("lift"))
    // checkpoint=false exposes the full tree for plan audits; the
    // default materializes before the caches release
    if (!checkpoint) return projected
    val out = projected.localCheckpoint(eager = false)
    out.count() // materialize before releasing the caches
    items.unpersist(blocking = false)
    pruned.unpersist(blocking = false)
    out
  }

  /** Directed association rules from [[frequentPairs]]: every frequent
    * pair yields both orientations, confidence(A→B) = n_pairs/s(A),
    * gated at `minConfidence` — the recommendation/market-basket step on
    * top of the symmetric co-occurrence counts (confidence is the
    * DIRECTED signal lift can't give: bread→brand-X butter can be
    * near-certain while the reverse is weak, same lift both ways).
    *
    * Scale: a projection + filter over the pair table — the mining cost
    * IS [[frequentPairs]]; no new shuffle. Confidence and lift are
    * single double divisions of exact integer counts (bit-identical
    * cross-engine, no rounding discipline needed).
    */
  def associationRules(tx: DataFrame, txCol: String, itemCol: String,
      minItemSupport: Long, minPairSupport: Long,
      minConfidence: Double): DataFrame = {
    val pairs = frequentPairs(tx, txCol, itemCol, minItemSupport, minPairSupport)
    val fwd = pairs.select(col("p1").as("antecedent"), col("p2").as("consequent"),
      col("n_pairs"), col("s1").as("s_ante"), col("s2").as("s_cons"), col("lift"))
    val rev = pairs.select(col("p2").as("antecedent"), col("p1").as("consequent"),
      col("n_pairs"), col("s2").as("s_ante"), col("s1").as("s_cons"), col("lift"))
    fwd.unionByName(rev)
      .withColumn("confidence",
        col("n_pairs").cast("double") / col("s_ante").cast("double"))
      .where(col("confidence") >= minConfidence)
  }
}
