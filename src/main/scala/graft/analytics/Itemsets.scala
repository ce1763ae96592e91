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

  /** GSP-style sequential-pattern mining (Srikant & Agrawal, EDBT 1996)
    * up to length 3: ordered event patterns `e1 > e2 > e3` where each
    * step occurs within `maxGapUs` of the previous (the GSP max-gap
    * constraint — without it every long-lived user supports every
    * pattern), counted ONCE per user (existence), gated at a RELATIVE
    * support threshold (`minSupPct` percent of distinct users, compared
    * in exact integers: support·100 ≥ n_users·pct — no rounding
    * surface). Distinct from q63's adjacent transitions (gaps allowed
    * here) and q65's fixed CEP pattern (patterns are MINED, not given).
    *
    * The a-priori anti-monotone guarantee does the scale work twice:
    * occurrences are pruned to frequent items BEFORE the first
    * user-keyed self-join, and length-3 candidates must extend a
    * frequent 2-pattern on BOTH flanks ((e1,e2) and (e2,e3) frequent) —
    * the GSP join-based candidate generation, applied as broadcast
    * gates. Every join is keyed on the user (one hash shuffle,
    * co-partitioned thereafter); per-user instance fan-out is bounded by
    * the events admitted per max-gap window, which is the knob a
    * pipeline turns when a pathological always-on user appears.
    *
    * `occ` rows are (user_id, etype, us); ordering is strict on `us`
    * (same-microsecond events are unordered, so neither engine counts
    * them as a sequence — deterministic cross-engine). Output:
    * (level 1|2|3, pattern "a>b>c", support, n_users), one row per
    * surviving pattern.
    */
  def seqPatterns(occ0: DataFrame, maxGapUs: Long, minSupPct: Int): DataFrame = {
    require(maxGapUs > 0 && minSupPct >= 0 && minSupPct <= 100)
    val ss = occ0.sparkSession
    import ss.implicits._
    val occ = occ0.select(col("user_id"), col("etype"), col("us"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the frequent-pattern tables are CONTROL data, bounded by
    // |event types|^level — they come to the driver (the s29-cellIds
    // discipline), so each gate is one collect instead of a broadcast
    // exchange re-running its upstream plan per consumer (measured: the
    // in-plan variant spent 7 s of job overhead on 110k pair instances)
    val nUsers: Long = occ.select(col("user_id")).distinct().count()
    def keep(support: Long): Boolean = support * 100 >= nUsers * minSupPct
    val f1 = occ.select(col("user_id"), col("etype")).distinct()
      .groupBy(col("etype")).agg(count(lit(1)).as("support"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .filter { case (_, s) => keep(s) }.sortBy(_._1).toSeq
    val occ1 = occ.where(col("etype").isin(f1.map(_._1): _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val p2 = occ1.select(col("user_id"), col("etype").as("e1"), col("us").as("us1"))
      .join(occ1.select(col("user_id"), col("etype").as("e2"), col("us").as("us2")),
        Seq("user_id"))
      .where(col("us2") > col("us1") && col("us2") - col("us1") <= maxGapUs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val f2 = p2.select(col("user_id"), col("e1"), col("e2")).distinct()
      .groupBy(col("e1"), col("e2")).agg(count(lit(1)).as("support"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
      .filter { case (_, _, s) => keep(s) }.sortBy(t => (t._1, t._2)).toSeq
    // GSP candidate generation: extend instances of frequent (e1,e2) by a
    // third event whose (e2,e3) flank is itself frequent (both gates are
    // driver-side pattern-key membership — '>' is the pattern separator,
    // so event types must not contain it, same as the output contract)
    val f2keys = f2.map { case (a, b, _) => s"$a>$b" }
    val f3 = p3Supports(p2, occ1, maxGapUs, f2keys)
      .filter { case (_, s) => keep(s) }
    val out =
      f1.map { case (t, s) => (1, t, s, nUsers) } ++
        f2.map { case (a, b, s) => (2, s"$a>$b", s, nUsers) } ++
        f3.map { case (p, s) => (3, p, s, nUsers) }
    occ.unpersist(blocking = false)
    occ1.unpersist(blocking = false)
    p2.unpersist(blocking = false)
    out.toDF("level", "pattern", "support", "n_users")
  }

  /** Length-3 support counting for [[seqPatterns]]: frequent-pair
    * instances extended by one in-gap event, gated on BOTH flanks,
    * existence-counted per user. Separated so the instance-join shape is
    * readable: the only corpus-sized tables are p2 and occ1, already
    * co-partitioned on user_id.
    */
  private def p3Supports(p2: DataFrame, occ1: DataFrame, maxGapUs: Long,
      f2keys: Seq[String]): Seq[(String, Long)] = {
    if (f2keys.isEmpty) return Seq.empty
    def pkey(a: org.apache.spark.sql.Column*) = concat_ws(">", a: _*)
    p2.where(pkey(col("e1"), col("e2")).isin(f2keys: _*))
      .join(occ1.select(col("user_id"), col("etype").as("e3"), col("us").as("us3")),
        Seq("user_id"))
      .where(col("us3") > col("us2") && col("us3") - col("us2") <= maxGapUs &&
        pkey(col("e2"), col("e3")).isin(f2keys: _*))
      .select(col("user_id"), pkey(col("e1"), col("e2"), col("e3")).as("pattern"))
      .distinct()
      .groupBy(col("pattern")).agg(count(lit(1)).as("support"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy(_._1).toSeq
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
