package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling operators for training-data curation. The workhorse is the
  * DETERMINISTIC stratified sample: at 100 TB a training subset must be
  * reproducible run-to-run and engine-to-engine (audits, ablations,
  * incremental rebuilds), which rules out partition-order-dependent RNG
  * (`df.sample`/`sampleBy` draw per-row Bernoulli streams seeded by
  * partition index — repartitioning silently changes the sample).
  */
object Sampling {

  /** Exactly-k-per-stratum sample, ordered by a PORTABLE pseudo-random
    * permutation: md5 of the row id. Every engine that can hash can
    * reproduce the subset bit-for-bit; strata smaller than k are taken
    * whole. One shuffle on the stratum key; the per-stratum sort is
    * O(|stratum| log |stratum|) in the window operator — at scale, strata
    * are the partition unit, never the corpus.
    */
  def deterministicStratified(df: DataFrame, stratumCol: String, k: Int,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("bigint"))
      .where(col("sample_rank") <= k)
  }

  /** Temperature mixture sampling at α = 0.5 — the "square-root sampling"
    * rebalance for skewed language/source mixtures (big strata are
    * down-weighted, small strata over-represented relative to their share):
    * per-stratum quota = ceil(sqrt(count)), selected by the SAME portable
    * md5 permutation as [[deterministicStratified]]. The quota boundary is
    * expressed as the integer predicate `(rank−1)² < count` — equivalent to
    * `rank ≤ ceil(√count)` for integer rank ≥ 1 — so no float `pow` sits on
    * the cross-engine gate (IEEE pow at a perfect-square boundary could
    * flip ceil by one between engines). Same scale shape as the stratified
    * sample: one shuffle on the stratum key, per-stratum window sort.
    */
  /** Temperature-scaled domain mixture (the Llama/XLM-R data-mixing
    * rule): given per-domain sizes, sampling weight
    * w_i ∝ p_i^α with α = 1/2 (the square-root temperature — exact as
    * `sqrt`, so both engines compute the identical IEEE value; a general
    * `pow` is not cross-engine bit-stable), where p_i is the domain's
    * share of total characters. Upsampling factor w_i/p_i > 1 boosts
    * tail domains; `epochs` says how many passes over domain i a
    * `tokenBudget`-token run makes (tokens ≈ chars/4). Determinism: the
    * normalizing Σ√p folds round-9 terms as an exact DECIMAL so the
    * weights are addition-order-free.
    *
    * Scale shape: one partial+final aggregate keyed by domain, then
    * arithmetic on the DOMAIN table (control-plane sized — at 100 TB a
    * corpus has thousands of domains, not billions), broadcast back if a
    * per-row sampling decision needs it. Nothing corpus-sized shuffles.
    */
  def temperatureMix(df: DataFrame, domainCol: String, sizeCol: String,
      tokenBudget: Long, charsPerToken: Int = 4): DataFrame = {
    val perDom = df.groupBy(col(domainCol))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(sizeCol)).cast("long").as("n_chars"))
    // the corpus total folds from the DOMAIN table, not a second corpus
    // scan — exact (longs), and the corpus is read once
    val chars = perDom.agg(sum(col("n_chars")).cast("long").as("chars_all"))
    val withP = perDom.crossJoin(broadcast(chars))
      .withColumn("p", col("n_chars").cast("double") /
        col("chars_all").cast("double"))
      .withColumn("w_raw", round(sqrt(col("p")), 9))
    val z = withP.agg(sum(col("w_raw").cast("decimal(28,9)")).as("z"))
    withP.crossJoin(broadcast(z))
      .select(col(domainCol), col("n_docs"), col("n_chars"),
        round(col("p"), 9).as("share"),
        round(col("w_raw") / col("z").cast("double"), 9).as("weight"),
        round(col("w_raw") / col("z").cast("double") / col("p"), 6)
          .as("upsample"),
        round(lit(tokenBudget.toDouble) *
          (col("w_raw") / col("z").cast("double")) /
          (col("n_chars").cast("double") / charsPerToken), 6).as("epochs"))
  }

  def sqrtMixture(df: DataFrame, stratumCol: String, idCol: String): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("sample_rank", row_number().over(w).cast("bigint"))
      .withColumn("stratum_n", count(lit(1)).over(Window.partitionBy(col(stratumCol))))
      .where((col("sample_rank") - 1) * (col("sample_rank") - 1) < col("stratum_n"))
  }

  /** Deterministic training-shard assignment — the corpus "shuffle" step
    * of a training-data pipeline: every epoch reader wants the corpus in
    * a reproducible pseudo-random order, split into fixed shards. Shard =
    * first 32 bits of the md5 permutation value mod `nShards` (uniform,
    * content-blind, portable); within-shard position = rank along the
    * same permutation. Scale property: ONE shuffle on the shard key and a
    * per-shard window sort — never a global sort of the corpus. Shards
    * are the parallel unit for the write and for every epoch read after;
    * the same hash drives bucket AND order, so the assignment survives
    * any upstream repartitioning bit-for-bit.
    */
  def shardAssignment(df: DataFrame, nShards: Int, idCol: String): DataFrame = {
    val hashed = df.withColumn("perm", md5(col(idCol).cast("string")))
      .withColumn("shard",
        conv(substring(col("perm"), 1, 8), 16, 10).cast("bigint") % nShards)
    val w = Window.partitionBy(col("shard")).orderBy(col("perm"), col(idCol))
    hashed.withColumn("pos", row_number().over(w).cast("bigint"))
  }

  /** Consistent-hash ring vnodes (the [[shardRebalance]] model artifact):
    * `vnodes` virtual nodes per shard, position = md5-low-60 of the
    * literal "s<shard>:r<replica>", sorted by (position, shard) — the
    * SAME Scala-computed longs are the operator's literal arrays AND the
    * oracle twin's VALUES rows, so the two engines walk an identical
    * ring (the lshPlanesValues discipline). Lives with the operator, not
    * the twin: the oracle layer consumes analytics helpers, never the
    * reverse.
    */
  private[graft] def ringVnodes(nShards: Int, vnodes: Int): Seq[(Long, Int)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5Low60(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.substring(17, 32), 16)
    }
    (for (i <- 0 until nShards; j <- 0 until vnodes)
      yield (md5Low60(s"s$i:r$j"), i)).sortBy { case (p, s) => (p, s) }
  }

  /** Shard-rebalance planner: the data movement of growing a shard fleet
    * from n to n+1, measured under TWO placement strategies — naive
    * mod-hash (shard = pos mod n: growing the fleet remaps ~n/(n+1) of
    * ALL keys) and CONSISTENT HASHING (Karger et al. 1997) with `vnodes`
    * virtual nodes per shard on a 2⁶⁰ ring, where only keys inside the
    * new node's arcs move (~1/(n+1)) — the migration-cost number a
    * storage/serving fleet plans expansion with. The consistent-hashing
    * LOCALITY guarantee (every ring-moved key lands ON the new shard)
    * travels as a measured column (`n_moved_to_new`), not a claim.
    *
    * Determinism/portability: key position = md5-low-60 (15 hex chars —
    * positive, exact in a BIGINT on both engines); vnode positions are
    * Scala-computed md5 literals embedded in BOTH the plan and the twin
    * (the lshPlanesValues discipline). Scale shape: the ring lookup is a
    * HOF count over a sorted (n+1)·vnodes literal array — pure per-row
    * projection, ZERO shuffle before the 2-row summary aggregate. The
    * per-row cost is O(shards·vnodes); fleets are control-plane-sized
    * (hundreds of shards × tens of vnodes scans fine in codegen), and a
    * genuinely huge ring would swap the linear HOF for a binary-search
    * Catalyst expression — the arc table, not the corpus, is what grows.
    */
  def shardRebalance(docs: DataFrame, n: Int, vnodes: Int,
      idCol: String = "doc_id"): DataFrame = {
    val pos = conv(substring(md5(col(idCol).cast("string")), 18, 15), 16, 10)
      .cast("bigint")
    def owner(table: Seq[(Long, Int)]) = {
      val ps = typedLit(table.map(_._1))
      val ss = typedLit(table.map(_._2.toLong))
      // first vnode at-or-after pos; off the end wraps to the first
      val idx = size(filter(ps, x => x < col("pos")))
      element_at(ss, pmod(idx, lit(table.size)) + 1)
    }
    val a = docs
      .select(col(idCol), pos.as("pos"))
      .select(col(idCol),
        pmod(col("pos"), lit(n.toLong)).as("m_old"),
        pmod(col("pos"), lit(n.toLong + 1L)).as("m_new"),
        owner(ringVnodes(n, vnodes)).as("r_old"),
        owner(ringVnodes(n + 1, vnodes)).as("r_new"))
    // ONE aggregate carries both strategies' counters (a union of two
    // aggregates would scan the projection twice); the 1-row result
    // reshapes to the 2-row summary
    def moved(oldC: String, newC: String) =
      sum(when(col(oldC) =!= col(newC), 1L).otherwise(0L))
    def movedToNew(oldC: String, newC: String) =
      sum(when(col(oldC) =!= col(newC) && col(newC) === n.toLong, 1L)
        .otherwise(0L))
    a.agg(count(lit(1)).as("n_docs"),
        moved("m_old", "m_new").as("mm"), movedToNew("m_old", "m_new").as("mmn"),
        moved("r_old", "r_new").as("rm"), movedToNew("r_old", "r_new").as("rmn"))
      .select(explode(array(
        struct(lit("mod").as("strategy"), col("n_docs"),
          col("mm").as("n_moved"), col("mmn").as("n_moved_to_new")),
        struct(lit("ring").as("strategy"), col("n_docs"),
          col("rm").as("n_moved"), col("rmn").as("n_moved_to_new")))).as("s"))
      .select(col("s.strategy"), col("s.n_docs"), col("s.n_moved"),
        col("s.n_moved_to_new"),
        round(col("s.n_moved").cast("double") / col("s.n_docs"), 6).as("moved_frac"))
  }

  /** Leakage-free (group-aware) train/validation split: every row of a
    * group lands in the SAME split, so correlated rows — near-duplicate
    * cluster members, same-domain pages — can never straddle train and
    * validation (the split-leakage failure mode a row-wise random split
    * has by construction). Group key → md5 → first 32 bits as a uniform
    * u32; train iff u32 < round(trainFrac·2³²) — an INTEGER threshold,
    * so no float boundary sits on the cross-engine gate, and the
    * assignment is reproducible under any partitioning (the q36/q41
    * permutation contract). Pure per-row projection once the group key
    * is on the row: no join, no shuffle.
    */
  def groupAwareSplit(df: DataFrame, groupCol: String,
      trainFrac: Double): DataFrame = {
    require(trainFrac >= 0.0 && trainFrac <= 1.0, s"trainFrac=$trainFrac")
    val cut = math.round(trainFrac * 4294967296.0) // ·2^32
    df.withColumn("split",
      when(conv(substring(md5(col(groupCol).cast("string")), 1, 8), 16, 10)
        .cast("bigint") < cut, lit("train")).otherwise(lit("val")))
  }

  /** Weighted sampling without replacement (Efraimidis–Spirakis 2006),
    * deterministic: each row draws u ∈ (0,1] from the PORTABLE md5
    * permutation ((u32+1)/2³² — exact integer operands) and ranks by
    * `key = ln(u)/w` descending (the monotone twin of the classic
    * u^(1/w)); the per-stratum top-k is a weight-proportional sample
    * without replacement. This is the curation middle ground q37 (hard
    * top-k by quality) and q36 (uniform) bracket: quality BIASES
    * selection but low-quality docs retain mass — distribution-preserving
    * where a hard cutoff collapses diversity. The one float chain
    * (exact-u → ln → ÷w → round 9) is the t09 recipe; weights must be
    * strictly positive. Same scale shape as every sampler here: one
    * stratum shuffle, per-stratum window sort, reproducible under any
    * partitioning.
    */
  def weightedSample(df: DataFrame, stratumCol: String, weightCol: String,
      k: Int, idCol: String): DataFrame = {
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("bigint") + 1).cast("double") / lit(4294967296.0)
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("es_key").desc, col(idCol))
    df.withColumn("es_key", round(log(u) / col(weightCol), 9))
      .withColumn("sample_rank", row_number().over(w).cast("bigint"))
      .where(col("sample_rank") <= k)
  }

  /** Probabilistic Bernoulli sample — the cheap one-pass path when
    * reproducibility across repartitioning is NOT required (the per-row
    * RNG stream is seeded by partition). Kept as the documented contrast
    * to [[deterministicStratified]]; fraction accuracy is invariant-tested.
    */
  def bernoulli(df: DataFrame, fraction: Double, seed: Long): DataFrame =
    df.sample(withReplacement = false, fraction, seed)

  /** Merkle manifest of a sharded corpus — the reproducibility receipt a
    * training-data release ships next to its shards: row fingerprint →
    * id-range block hash → shard hash → one corpus root. Any single-row
    * change flips exactly its block, its shard, and the root, leaving
    * every other shard's hash bit-identical — so a consumer can verify a
    * 100 TB corpus shard-by-shard (or re-verify ONE re-downloaded shard)
    * without ever re-reading the rest.
    *
    * Determinism and scale share one design: all three levels fold in a
    * DATA-DERIVED order (doc id within block, block id within shard,
    * shard id at the root — never partition order), and the two-level
    * block/shard split is the q87/hits blocked-fold discipline: each
    * aggregation concatenates at most `blockSize` row hashes (or one
    * shard's block hashes), so no single reduce ever materializes a
    * shard-sized string. Sharding is [[shardAssignment]]'s md5
    * permutation; blocks are `id div blockSize` ranges. Output: one row
    * per shard (shard, n_docs, n_blocks, shard_hash, root_hash).
    */
  def merkleManifest(df: DataFrame, nShards: Int, blockSize: Int,
      idCol: String, payloadCol: String): DataFrame =
    manifestFromBlocks(
      merkleBlocks(merkleRows(df, nShards, blockSize, idCol, payloadCol)))

  private def orderedFold(pairs: org.apache.spark.sql.Column) =
    md5(array_join(transform(array_sort(pairs), x => x.getField("h")), ""))

  /** The manifest's row layer: (id, rh, shard, blk) — split out (with
    * [[merkleBlocks]] / [[manifestFromBlocks]]) so q102's INCREMENTAL
    * maintenance path can classify a delta batch's rows into touched
    * (shard, blk) blocks with exactly the operator's own derivations.
    */
  def merkleRows(df: DataFrame, nShards: Int, blockSize: Int,
      idCol: String, payloadCol: String): DataFrame =
    df.select(col(idCol).as("id"),
        md5(concat(col(idCol).cast("string"), lit("|"), col(payloadCol)))
          .as("rh"))
      .withColumn("shard",
        conv(substring(md5(col("id").cast("string")), 1, 8), 16, 10)
          .cast("bigint") % nShards)
      .withColumn("blk", expr(s"id div $blockSize"))

  /** Block layer: per (shard, blk), the doc count and the id-ordered
    * row-hash fold. */
  def merkleBlocks(rows: DataFrame): DataFrame =
    rows.groupBy(col("shard"), col("blk"))
      .agg(count(lit(1)).as("n_docs"),
        orderedFold(collect_list(struct(col("id").as("o"), col("rh").as("h"))))
          .as("bh"))

  /** Shard + root layers over a block table. The input is persisted:
    * the block table is control-sized (shards×blocks rows) and feeds
    * BOTH the shard fold and (via shards) the root fold + final join —
    * without the lineage cut the whole upstream chain (and its corpus
    * scan) re-executes per consumer, which the q101 capstone's
    * zero-extra-scans plan audit pins. Session-owned cache, the d03
    * convention (Bench clearCache).
    */
  def manifestFromBlocks(blocks0: DataFrame): DataFrame = {
    val blocks = blocks0
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val shards = blocks.groupBy(col("shard"))
      .agg(sum(col("n_docs")).as("n_docs"), count(lit(1)).as("n_blocks"),
        orderedFold(collect_list(struct(col("blk").as("o"), col("bh").as("h"))))
          .as("shard_hash"))
    val root = shards.agg(
      orderedFold(collect_list(struct(col("shard").as("o"),
        col("shard_hash").as("h")))).as("root_hash"))
    shards.join(broadcast(root))
      .select(col("shard"), col("n_docs"), col("n_blocks"),
        col("shard_hash"), col("root_hash"))
  }
}
