package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DoubleType, LongType, StringType}

/** Deduplication operators over the `documents` table: exact,
  * n-gram Jaccard, MinHash+LSH, SimHash, and embedding-cosine near-dup.
  *
  * Scale design: everything is expressed as shingle/signature explosion +
  * hash-partitioned self-joins on small keys — the 100 TB shape. No
  * all-pairs cross join anywhere: candidate generation always goes through
  * an inverted index (shingle → docs) or an LSH band bucket, so the shuffle
  * key space is bounded and AQE can handle skewed buckets.
  *
  * Expression-shape rule (round-2/3 postmortem): Spark's higher-order
  * functions re-evaluate any non-lambda subexpression embedded in a lambda
  * BODY once per array element (and `CollapseProject` happily inlines a
  * single-use alias into that body). Embedding `tokens(text)` inside a
  * per-shingle lambda turned a linear pipeline into
  * O(tokens × shingles × k) per row — 1824 s at sf0.1 for seconds of real
  * work. Every operator here therefore (a) materializes expensive
  * intermediates as real columns across projection boundaries, and (b) uses
  * lambda bodies that reference only lambda variables, attributes, and
  * literals. Arguments of `transform`/`aggregate` are evaluated once per
  * row, so single-use chains in argument position are fine.
  */
object Dedup {

  /** Exact dedup by full text: one survivor (min id) per distinct text.
    * A single hash aggregation — at 100 TB you'd pre-hash the text
    * (md5/xxhash64) so the shuffle carries 16-byte keys instead of full
    * documents; `byFingerprint` below is that variant.
    */
  def exact(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup on the md5 content fingerprint — constant-width shuffle
    * keys; the scale path for exact dedup.
    */
  def byFingerprint(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(TextAnalysis.contentFingerprint(col(textCol)).as("fp"), col(idCol))
      .groupBy(col("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  private def spreadForCpu(df: DataFrame): DataFrame = Par.spreadForCpu(df)

  /** Word n-gram shingles (distinct) from an already-tokenized ARRAY COLUMN
    * (`ws` must be an attribute, not an expression tree — see the
    * expression-shape rule above). Documents shorter than n words yield an
    * empty shingle set.
    */
  def shinglesFromTokens(ws: Column, n: Int): Column = {
    val grams = transform(sequence(lit(0), size(ws) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*))
    array_distinct(when(size(ws) >= n, grams).otherwise(array().cast(ArrayType(StringType))))
  }

  /** id + token-array projection (the shared first stage of every shingle
    * pipeline), spread across cores.
    */
  private def tokenized(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    spreadForCpu(docs)
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("ws"))

  /** id + distinct word-n-gram shingle set per document, with tokenization
    * materialized on its own projection boundary.
    */
  def shingleSets(docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    tokenized(docs, idCol, textCol)
      .select(col("id"), shinglesFromTokens(col("ws"), n).as("sh"))

  /** Decontamination flags: mark every corpus document that shares at
    * least one n-gram shingle with a contamination set (held-out eval /
    * benchmark documents) — the standard pre-training hygiene step that
    * keeps test data out of the training corpus. Returns the FULL corpus
    * as (id, contaminated) so the caller has a total keep/drop decision
    * (drop contaminated, keep the rest), the d07 output convention.
    *
    * Scale shape: benchmark sets are tiny relative to a 100 TB corpus, so
    * the contamination shingle UNIVERSE (distinct shingles, not documents)
    * is broadcast; the corpus side is one scan — explode shingles,
    * broadcast-semi-join, distinct ids — with no corpus shuffle before
    * the final flag join. Documents shorter than n tokens have no
    * shingles and are never flagged; contamination documents present in
    * the corpus flag themselves via total self-overlap.
    */
  def contaminationFlags(docs: DataFrame, contaminated: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val contamShingles = broadcast(
      shingleSets(contaminated, n, idCol, textCol)
        .select(explode(col("sh")).as("sh")).distinct())
    val hits = shingleSets(docs, n, idCol, textCol)
      .select(col("id"), explode(col("sh")).as("sh"))
      .join(contamShingles, Seq("sh"), "left_semi")
      .select(col("id")).distinct()
    docs.select(col(idCol).as("id"))
      .join(hits.withColumn("contaminated", lit(true)), Seq("id"), "left")
      .select(col("id"), coalesce(col("contaminated"), lit(false)).as("contaminated"))
  }

  /** Exact n-gram Jaccard near-dup pairs between a probe set and the corpus,
    * via an inverted shingle index: explode probe and corpus shingles, join
    * on the shingle, count intersections, then J = |∩| / (|A|+|B|-|∩|).
    * Only pairs sharing ≥1 shingle are ever materialized.
    *
    * `maxDf` caps the document frequency of index shingles: a shingle shared
    * by m corpus documents yields O(m·probes) join rows, so at 100 TB a stop-
    * word-like shingle is a skew bomb — standard practice drops shingles with
    * DF > K from the index (they carry no near-dup signal). The default
    * (`Long.MaxValue`) keeps the operator EXACT; passing a finite cap makes
    * it approximate — intersections are *undercounted* for pairs glued by
    * shingles above the cap, which can drop true pairs near the threshold.
    * Callers at scale should pick K safely above the expected near-dup
    * cluster size (the engine's d03 query uses 1000 against a corpus whose
    * max DF is 25, so its output is provably unchanged).
    */
  def ngramJaccardPairs(probes: DataFrame, corpus: DataFrame, n: Int,
      threshold: Double, idCol: String = "doc_id", textCol: String = "text",
      maxDf: Long = Long.MaxValue): DataFrame =
    intersectionCounts(probes, corpus, n, idCol, textCol, maxDf)
      .withColumn("jaccard",
        col("inter").cast(DoubleType) /
          (col("a_size") + col("b_size") - col("inter")).cast(DoubleType))
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))

  /** ASYMMETRIC containment near-dup pairs: C(A→B) = |A∩B| / |A|. Finds
    * sub-document duplication — a probe document contained in a larger
    * corpus document (boilerplate paragraphs, quoted articles, prefix
    * crawls) scores ~1.0 here while its symmetric Jaccard can be
    * arbitrarily low. The standard second axis of text dedup next to
    * [[ngramJaccardPairs]]; same inverted-index candidate generation.
    */
  def containmentPairs(probes: DataFrame, corpus: DataFrame, n: Int,
      threshold: Double, idCol: String = "doc_id", textCol: String = "text",
      maxDf: Long = Long.MaxValue): DataFrame =
    intersectionCounts(probes, corpus, n, idCol, textCol, maxDf)
      .withColumn("containment",
        col("inter").cast(DoubleType) / col("a_size").cast(DoubleType))
      .where(col("containment") >= threshold)
      .select(col("a_id"), col("b_id"), col("containment"))

  /** Shared candidate stage of the exact pair operators: per probe/corpus
    * pair sharing ≥1 shingle, the shingle-set sizes and intersection count
    * via the inverted shingle index (never all-pairs).
    */
  private def intersectionCounts(probes: DataFrame, corpus: DataFrame, n: Int,
      idCol: String, textCol: String, maxDf: Long): DataFrame = {
    def exploded(sets: DataFrame, side: String): DataFrame =
      sets.select(col("id").as(s"${side}_id"),
        size(col("sh")).cast(LongType).as(s"${side}_size"),
        explode(col("sh")).as("shingle"))
    // The corpus shingle sets feed two plan branches (the hot-shingle DF
    // census and the index join) — persist the compact (id, shingles) form
    // so the tokenize→shingle pipeline runs once.
    val bSets = shingleSets(corpus, n, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val aEx = exploded(shingleSets(probes, n, idCol, textCol), "a")
    val bEx = exploded(bSets, "b")
    // with the exact default cap the census could never filter anything —
    // skip the full-corpus DF aggregation entirely
    val bIndexed = if (maxDf == Long.MaxValue) bEx else {
      val hotShingles = bEx.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df")).where(col("df") > maxDf)
        .select(col("shingle"))
      bEx.join(broadcast(hotShingles), Seq("shingle"), "left_anti")
    }
    aEx.join(bIndexed, Seq("shingle"))
      .where(col("a_id") =!= col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_size"), col("b_size"))
      .agg(count(lit(1)).as("inter"))
  }

  /** MinHash signature from per-shingle base hashes in ONE `aggregate` pass:
    * the running element-wise minimum of the k universal hashes
    * h_i(x) = a_i·x + b_i (mod 2^64) over a single xxhash64 per shingle.
    * One multiply-add per (shingle, position) — k× cheaper than k
    * independent string hashes, same collision estimate. Constants are
    * seeded (deterministic plans). Empty set → all Long.MaxValue; a NULL
    * `hashes` array also yields all Long.MaxValue (the outer `coalesce`
    * preserves the pre-round-3 contract — the raw `aggregate` form would
    * null-propagate instead).
    *
    * `hashes` must be an attribute or single-use argument chain; the lambda
    * bodies touch only lambda variables and the (a,b) literal array.
    */
  /** The (a_i, b_i) constants of the k universal hashes — THE single
    * source shared by the declarative operator below, the native
    * `minhash_sig` expression, and the d10 oracle builder, so none of the
    * three can drift (odd multipliers so h·a is a bijection mod 2^64).
    */
  def minhashConstants(k: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(k)((rnd.nextLong() | 1L, rnd.nextLong()))
  }

  def minhashFromHashes(hashes: Column, k: Int, seed: Long = 42L): Column = {
    val ab = typedLit(minhashConstants(k, seed))
    coalesce(
      aggregate(hashes, array_repeat(lit(Long.MaxValue), k),
        (acc, h) => zip_with(acc, ab,
          (m, c) => least(m, h * c.getField("_1") + c.getField("_2")))),
      array_repeat(lit(Long.MaxValue), k))
  }

  /** id + k-element MinHash signature per document (sub-n-token docs
    * dropped). Each stage of tokenize → shingle → base-hash → signature sits
    * on its own projection boundary. The drop filter is expressed on the
    * TOKEN count, not `size(sh) > 0` (equivalent: ≥ n tokens ⇔ ≥ 1
    * shingle): predicate pushdown rewrites a filter on a derived column into
    * the underlying expression tree, and the shingle-set version re-ran the
    * whole tokenize→shingle pipeline — with `tokens` inlined into the
    * per-element lambda — inside the scan filter (round-3 profiling: that
    * single pushed filter was ~5× the cost of the real signature work).
    */
  def minhashSignatures(docs: DataFrame, n: Int, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tok = tokenized(docs, idCol, textCol).where(size(col("ws")) >= n)
    if (docs.sparkSession.catalog.functionExists("minhash_sig")) {
      // native fused kernel (graft.plans.MinHashSig via GraftExtensions):
      // bit-identical to the declarative chain below (DedupSpec), one
      // codegen'd loop instead of three interpreted HOF projections
      tok.select(col("id"),
        call_function("minhash_sig", col("ws"), lit(n), lit(k), lit(42L)).as("sig"))
    } else {
      tok
        .select(col("id"), shinglesFromTokens(col("ws"), n).as("sh"))
        .select(col("id"), transform(col("sh"), s => xxhash64(s)).as("hs"))
        .select(col("id"), minhashFromHashes(col("hs"), k).as("sig"))
    }
  }

  /** MinHash signatures over the PORTABLE md5-low64 shingle hash — the
    * same tokenize → shingle → hash → running-min chain as
    * [[minhashSignatures]] with [[md5Low64]] substituted for xxhash64, so
    * any SQL engine with md5 can reproduce the signatures bit-for-bit
    * (the d10/d11 oracle path). Use the xxhash64 variant in production.
    */
  def minhashSignaturesPortable(docs: DataFrame, n: Int, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    tokenized(docs, idCol, textCol).where(size(col("ws")) >= n)
      .select(col("id"), shinglesFromTokens(col("ws"), n).as("sh"))
      .select(col("id"), transform(col("sh"), s => md5Low64(s)).as("hs"))
      .select(col("id"), minhashFromHashes(col("hs"), k).as("sig"))

  /** MinHash + banded LSH candidate pairs with estimated Jaccard.
    *
    * signature(k) → split into `bands` bands of k/bands rows → bucket key =
    * xxhash64(band index, band slice) → explode → self-join per bucket on
    * NARROW (bucket, id) rows only → distinct candidate (a_id, b_id)
    * pairs → join the k-element signatures back (one row per pair, not per
    * band collision) → estimate J as the fraction of agreeing positions,
    * keep those ≥ threshold.
    *
    * Cache lifecycle: the internal persists (signature table here, corpus
    * shingle sets in [[ngramJaccardPairs]]) are deduplicated by plan in the
    * CacheManager, so repeated invocations reuse one entry, but they are
    * NOT auto-unpersisted — a long-lived session should call
    * `spark.catalog.clearCache()` between unrelated workloads (Bench does).
    *
    * Scale notes: a near-duplicate cluster of c docs collides in ~every
    * band, producing O(bands·c²) join rows — so the bucket self-join must
    * carry nothing but 16-byte pair keys, and the signature arrays are
    * attached only after `distinct()` collapses those to O(c²). All
    * shuffles are on compact keys; AQE handles residual bucket skew.
    *
    * The signature table is `persist()`ed: it is consumed by FOUR plan
    * branches (both sides of the bucket self-join, both signature re-joins),
    * and without the lineage cut the full tokenize→shingle→minhash pipeline
    * re-executes per branch. The cache holds only (id, k longs) per doc —
    * MEMORY_AND_DISK spills safely at scale.
    */
  /** The ONE banding projection: all `bands` bucket hashes per signature
    * row — xxhash64 of a slice of the in-memory array (no string concat).
    * Shared by [[minhashCandidates]] and [[incrementalNearDup]] so the
    * bucket scheme cannot drift between the d04/d11 family and the d21
    * gate (their oracles all express banding as slice equality).
    */
  /** The ONE banded-LSH bucket-key expression — every consumer (the
    * batch candidate join here, d17/d21's incremental probes, and the
    * streaming signature store) derives bucket keys from THIS
    * definition, so batch and stream can never hash to different
    * buckets.
    */
  private[graft] def bandBucketKeys(sig: Column, bands: Int,
      rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      xxhash64(b, slice(sig, b * rowsPerBand + 1, lit(rowsPerBand))))

  private[graft] def bandBuckets(sigs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    sigs.select(
      col("id"),
      explode(bandBucketKeys(col("sig"), bands, rowsPerBand)).as("bucket"))

  /** The ONE estimate formula: agreeing-position fraction over the full
    * k — shared for the same no-drift reason as [[bandBuckets]]. */
  private def estJaccard(a: Column, b: Column, k: Int): Column =
    size(filter(zip_with(a, b, (x, y) => x === y), v => v))
      .cast(DoubleType) / k

  def minhashCandidates(docs: DataFrame, n: Int, k: Int, bands: Int,
      threshold: Double, idCol: String = "doc_id", textCol: String = "text",
      portableHash: Boolean = false): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val rowsPerBand = k / bands
    // `portableHash` swaps ONLY the per-shingle base hash (md5-low64 vs
    // xxhash64); banding, bucket join, and est_jaccard are the same code
    // path, so a cross-engine oracle on the portable variant (d11) proves
    // the whole band→bucket-join→estimate chain the production variant
    // runs. (The internal bucket key stays xxhash64(band, slice) — it is a
    // pure partitioning key whose equality coincides with band-slice
    // equality; the oracle expresses the banding as slice equality.)
    val sigs = (if (portableHash) minhashSignaturesPortable(docs, n, k, idCol, textCol)
                else minhashSignatures(docs, n, k, idCol, textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val buckets = bandBuckets(sigs, bands, rowsPerBand)
    val candidates = buckets.select(col("bucket"), col("id").as("a_id"))
      .join(buckets.select(col("bucket"), col("id").as("b_id")), Seq("bucket"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    candidates
      .join(sigs.select(col("id").as("a_id"), col("sig").as("a_sig")), Seq("a_id"))
      .join(sigs.select(col("id").as("b_id"), col("sig").as("b_sig")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        estJaccard(col("a_sig"), col("b_sig"), k).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** LSH (bands, rowsPerBand) operating curve — the tuning artifact d26
    * measures one point of (r15 verdict task 3): precision/recall of the
    * banded-candidate + full-k-estimate chain against an exact-Jaccard
    * ground truth, swept across a grid of band counts from ONE shared
    * signature pass (the s25/d35 shared-pass pattern — the expensive
    * tokenize→shingle→minhash pipeline runs once, persisted; each grid
    * level adds only its own banding projection and bucket self-join).
    *
    * For a power-of-two grid over a fixed k, each coarser band is the
    * concatenation of finer ones, so candidate sets are NESTED along the
    * grid (a width-2r slice match implies both width-r halves match) —
    * recall and n_est are non-decreasing in `bands` by construction, the
    * monotonicity DedupSpec pins. `truthPairs` is caller-supplied
    * (a_id, b_id) ground truth (d26's exact n-gram-Jaccard chain), so
    * the sweep never recomputes it per level either.
    *
    * Scale shape: identical to [[minhashCandidates]] per level — compact
    * 16-byte pair keys through every bucket self-join, signatures
    * attached post-distinct — times a constant grid size; the persisted
    * signature table is the only shared state (session-owned cache, the
    * d03 convention).
    */
  def lshBandSweep(docs: DataFrame, truthPairs: DataFrame, n: Int, k: Int,
      bandsGrid: Seq[Int], threshold: Double,
      idCol: String = "doc_id", textCol: String = "text",
      portableHash: Boolean = false): DataFrame = {
    require(bandsGrid.nonEmpty, "need at least one band count")
    require(bandsGrid.distinct.size == bandsGrid.size,
      s"duplicate band counts produce duplicate curve rows: $bandsGrid")
    bandsGrid.foreach(b =>
      require(b >= 1 && k % b == 0, s"k=$k must be divisible by bands=$b"))
    // Single-pass restructure (r17 optimization round; guide §2.4): the
    // grid nests (each level's bands must divide the finest level's, so a
    // coarse slice is a concatenation of finest slices and a coarse match
    // IMPLIES a finest-level match) — therefore ONE bucket self-join at
    // the finest level generates a candidate superset for every level,
    // per-level candidacy is a slice-equality predicate over the joined
    // signatures (exactly the oracle's banding semantics —
    // lshSweepOracleSql's `x.slc = y.slc`), and the whole curve is ONE
    // full-outer join + ONE conditional aggregation. The former shape ran
    // a bucket self-join, two signature re-joins, and a full-outer
    // compare PER LEVEL over the shared persisted tables (4× the shuffle
    // passes; truth no longer needs a persist with a single consumer).
    bandsGrid.foreach(b => require(bandsGrid.max % b == 0,
      s"grid must nest (every bands must divide max): $bandsGrid"))
    val sigs = (if (portableHash) minhashSignaturesPortable(docs, n, k, idCol, textCol)
                else minhashSignatures(docs, n, k, idCol, textCol))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val maxBands = bandsGrid.max
    val buckets = bandBuckets(sigs, maxBands, k / maxBands)
    val cand = buckets.select(col("bucket"), col("id").as("a_id"))
      .join(buckets.select(col("bucket"), col("id").as("b_id")), Seq("bucket"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    // per-level candidacy: some width-rpb aligned slice agrees (the
    // bucket key's xxhash64 equality coincides with slice equality — the
    // d11 note — so the finest level's predicate matches its own
    // generation join)
    def slicesAgree(bands: Int): Column = {
      val rpb = k / bands
      exists(sequence(lit(0), lit(bands - 1)), i =>
        slice(col("a_sig"), i * rpb + 1, lit(rpb)) ===
          slice(col("b_sig"), i * rpb + 1, lit(rpb)))
    }
    val sorted = bandsGrid.sorted
    val est = cand
      .join(sigs.select(col("id").as("a_id"), col("sig").as("a_sig")), Seq("a_id"))
      .join(sigs.select(col("id").as("b_id"), col("sig").as("b_sig")), Seq("b_id"))
      .select(Seq(col("a_id"), col("b_id"),
        (estJaccard(col("a_sig"), col("b_sig"), k) >= threshold).as("pass")) ++
        sorted.map(b => slicesAgree(b).as(s"c_$b")): _*)
    val joined = est
      .join(truthPairs.select(col("a_id"), col("b_id"), lit(1L).as("t")),
        Seq("a_id", "b_id"), "full_outer")
      .select(Seq(col("pass"), coalesce(col("t"), lit(0L)).as("t")) ++
        sorted.map(b => col(s"c_$b")): _*)
    val aggCols = Seq(sum(col("t")).as("n_true")) ++ sorted.flatMap { b =>
      val e = col(s"c_$b") && col("pass") // null (truth-only row) → otherwise 0
      Seq(sum(when(e, 1L).otherwise(0L)).as(s"n_est_$b"),
        sum(when(e, col("t")).otherwise(0L)).as(s"tp_$b"))
    }
    joined.agg(aggCols.head, aggCols.tail: _*)
      .select(explode(array(sorted.map { b =>
        val nEst = col(s"n_est_$b")
        val tp = col(s"tp_$b")
        struct(lit(b.toLong).as("bands"), lit((k / b).toLong).as("rows_per_band"),
          col("n_true"), nEst.as("n_est"), tp.as("tp"),
          // NULL, not NaN, when a level admits zero pairs (0/0 is IEEE
          // NaN on both engines but NaN survives the hash compare badly)
          when(nEst > 0, tp.cast("double") / nEst.cast("double")).as("precision"),
          when(col("n_true") > 0,
            tp.cast("double") / col("n_true").cast("double")).as("recall"))
      }: _*)).as("l"))
      .select(col("l.bands").as("bands"), col("l.rows_per_band").as("rows_per_band"),
        col("l.n_true").as("n_true"), col("l.n_est").as("n_est"),
        col("l.tp").as("tp"), col("l.precision").as("precision"),
        col("l.recall").as("recall"))
  }

  /** SimHash Hamming-radius operating curve (d37) — the fingerprint
    * family's member of the operating-curve series (d35 threshold, d36
    * band/row, s25 nProbe): precision/recall of "near-dup = Hamming
    * distance ≤ r" against the exact n-gram-Jaccard ground truth, for a
    * grid of radii, from ONE fingerprint pass.
    *
    * Candidate generation is the Manku/Jain/Sarma (WWW'07) block
    * pigeonhole: the 64-bit fingerprint splits into FOUR 16-bit blocks,
    * and any pair within Hamming distance ≤ 3 must agree EXACTLY on at
    * least one block — so the block equi-self-join yields a candidate
    * set that provably contains every pair of every radius level, and
    * each level's pair set is EXACT (n_est is not an estimate), never an
    * all-pairs scan. One shared (candidate, hamming) table feeds all
    * levels; radii nest (hd ≤ r is monotone in r), so recall and n_est
    * are non-decreasing in the radius BY CONSTRUCTION (DedupSpec pin).
    *
    * Scale shape: fingerprints are one per-row projection; the block
    * index is 4 narrow rows per doc; candidates are a bucketed
    * self-join on 18-byte (block, value) keys; hamming is one codegen'd
    * bit_count(xor) per candidate. `radii` must stay ≤ 3 — the 4-block
    * pigeonhole guarantee does not reach radius 4.
    */
  def simhashRadiusSweep(docs: DataFrame, truthPairs: DataFrame,
      radii: Seq[Int], idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(radii.nonEmpty, "need at least one radius")
    require(radii.distinct.size == radii.size,
      s"duplicate radii produce duplicate curve rows: $radii")
    radii.foreach(r => require(r >= 0 && r <= 3,
      s"4-block pigeonhole covers radius <= 3 only, got $r"))
    val fps = simhashedPortable(docs, idCol, textCol)
      .select(col(idCol).cast("long").as("id"), col("simhash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val blocks = fps.select(col("id"), posexplode(array((0 to 3).map(b =>
      shiftright(col("simhash"), 16 * b).bitwiseAND(lit(65535L))): _*))
      .as(Seq("b", "v")))
    val candHd = blocks.select(col("b"), col("v"), col("id").as("a_id"))
      .join(blocks.select(col("b"), col("v"), col("id").as("b_id")), Seq("b", "v"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
      .join(fps.select(col("id").as("a_id"), col("simhash").as("fa")), Seq("a_id"))
      .join(fps.select(col("id").as("b_id"), col("simhash").as("fb")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("fa").bitwiseXOR(col("fb"))).cast("long").as("hd"))
    // ONE full-outer join + ONE conditional aggregation for the whole
    // radius grid (r17 optimization round; guide §2.4 "remove shuffles
    // outright"): radii nest (hd ≤ r is monotone in r), so every level's
    // (n_est, tp) is a conditional sum over the SAME (candidate ⋈ truth)
    // row set — the former per-level full-outer joins re-joined and
    // re-aggregated the shared persisted tables once per radius (4× the
    // passes, 4× the shuffles; candHd/truth no longer need a persist at
    // all with a single consumer). Per-level sums match the per-level
    // joins exactly: a truth-only row has hd NULL (never ≤ r → 0), a
    // candidate above the radius contributes 0 where the old join simply
    // omitted it.
    val radSorted = radii.sorted
    val joined = candHd
      .join(truthPairs.select(col("a_id"), col("b_id"), lit(1L).as("t")),
        Seq("a_id", "b_id"), "full_outer")
      .select(col("hd"), coalesce(col("t"), lit(0L)).as("t"))
    val aggCols = Seq(count(col("hd")).as("n_cand"), sum(col("t")).as("n_true")) ++
      radSorted.flatMap(r => Seq(
        sum(when(col("hd") <= r, 1L).otherwise(0L)).as(s"n_est_$r"),
        sum(when(col("hd") <= r, col("t")).otherwise(0L)).as(s"tp_$r")))
    joined.agg(aggCols.head, aggCols.tail: _*)
      .select(explode(array(radSorted.map { r =>
        val nEst = col(s"n_est_$r")
        val tp = col(s"tp_$r")
        struct(lit(r.toLong).as("radius"), col("n_cand"),
          col("n_true"), nEst.as("n_est"), tp.as("tp"),
          // NULL, not NaN, when a radius admits zero pairs (0/0 is IEEE
          // NaN on both engines but NaN survives the hash compare badly)
          when(nEst > 0, tp.cast("double") / nEst.cast("double")).as("precision"),
          when(col("n_true") > 0,
            tp.cast("double") / col("n_true").cast("double")).as("recall"))
      }: _*)).as("l"))
      .select(col("l.radius").as("radius"), col("l.n_cand").as("n_cand"),
        col("l.n_true").as("n_true"), col("l.n_est").as("n_est"),
        col("l.tp").as("tp"), col("l.precision").as("precision"),
        col("l.recall").as("recall"))
  }

  /** 64-bit SimHash per document. When the `simhash64` native expression is
    * registered (graft.plans.GraftExtensions via `spark.sql.extensions`),
    * the whole hash runs as one fused codegen'd loop; otherwise the
    * declarative fallback below computes the identical value
    * (equivalence asserted in DedupSpec) through three projection
    * boundaries — token hashes → 64-element vote vector → folded long —
    * so each intermediate is evaluated once per row.
    */
  def simhashed(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val tokenized = spreadForCpu(docs)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("ws"))
    if (docs.sparkSession.catalog.functionExists("simhash64")) {
      // coalesce: the native expression null-propagates a NULL token array
      // (standard expression semantics), while the declarative fold yields
      // 0L for it — align on the declarative value so both paths are
      // bit-identical even on null-text rows
      tokenized.select(col(idCol),
        coalesce(call_function("simhash64", col("ws")), lit(0L)).as("simhash"))
    } else declarativeSimhash(tokenized, idCol, t => xxhash64(t))
  }

  /** The declarative vote/fold SimHash construction over a tokenized frame
    * (`ws` attribute), parameterized by the per-token hash — ONE definition
    * shared by [[simhashed]]'s fallback and [[simhashedPortable]] so the
    * bit construction cannot diverge between d05 and d08.
    */
  private def declarativeSimhash(tokenized: DataFrame, idCol: String,
      tokenHash: Column => Column): DataFrame = {
    def bitVotes(h: Column): Column = array(
      (0 until 64).map(i =>
        when(shiftright(h, i).bitwiseAND(lit(1L)) =!= 0, lit(1L)).otherwise(lit(-1L))): _*)
    val folded = (0 until 64).map(i =>
      when(element_at(col("votes"), i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
    tokenized
      .select(col(idCol), transform(col("ws"), t => tokenHash(t)).as("hs"))
      .select(col(idCol), aggregate(col("hs"), array_repeat(lit(0L), 64),
        (acc, h) => zip_with(acc, bitVotes(h), _ + _)).as("votes"))
      .select(col(idCol), folded.as("simhash"))
  }

  /** The declarative xxhash64 vote/fold path regardless of whether the
    * native `simhash64` expression is registered — the comparison arm of
    * d05's native≡declarative contract (the q30-style flag the driver gate
    * asserts every round, complementing the 500-case DedupSpec test).
    */
  private[graft] def simhashedDeclarativeXx(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    declarativeSimhash(
      spreadForCpu(docs).select(col(idCol), TextAnalysis.tokens(col(textCol)).as("ws")),
      idCol, t => xxhash64(t))

  /** Hamming distance between two 64-bit simhashes. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** Signed 64-bit value of the LOW 8 bytes of md5 — a PORTABLE per-token
    * hash: md5 is bit-identical across engines, so unlike the
    * xxhash64-family operators this is reproducible by any SQL engine
    * (DuckDB: `CAST('0x' || substr(md5(t), 17, 16) AS UBIGINT)` re-centered
    * to signed). Slower than xxhash64 (crypto rounds + hex decode) — use
    * [[simhashed]] in production and this variant where cross-engine
    * verifiability matters.
    */
  def md5Low64(c: Column): Column =
    conv(substring(md5(c), 17, 16), 16, -10).cast(LongType)

  /** 64-bit SimHash with the portable md5 token hash — same vote/fold
    * construction as [[simhashed]]'s declarative path, different token
    * hash. Exists so the simhash FAMILY has a full DuckDB-oracle-checked
    * representative (d08) alongside the fast xxhash64 one (d05, invariant-
    * tested only).
    */
  def simhashedPortable(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    declarativeSimhash(
      spreadForCpu(docs).select(col(idCol), TextAnalysis.tokens(col(textCol)).as("ws")),
      idCol, md5Low64)

  /** Connected components over an undirected edge list: every vertex gets
    * `cluster_id` = the minimum vertex id reachable from it. This is the
    * cluster-resolution step a dedup pipeline needs between near-dup PAIRS
    * (d03/d04/d06 output) and a keep/drop decision — transitive closure
    * turns pairwise matches into duplicate clusters, and min-id gives a
    * deterministic canonical survivor per cluster.
    *
    * Algorithm: iterative min-label propagation. Each round every vertex
    * takes the min of its own label and its neighbors' labels (one shuffle
    * join + one aggregation per round); converged when no label changes.
    * Rounds needed = the graph diameter. Near-dup clusters are small and
    * dense (quasi-cliques glued by shared content), so diameter is a small
    * constant — for adversarial long-chain graphs swap in the
    * large-star/small-star contraction (Kiveris et al., "Connected
    * Components in MapReduce and Beyond"), which converges in O(log n)
    * rounds with the same per-round shape.
    *
    * Scale mechanics: each iteration `localCheckpoint`s the label table —
    * without the lineage cut, round k would replay rounds 1..k-1 (and the
    * convergence probe would replay everything again); with it, each round
    * is one shuffle over (id, label) pairs — 16 bytes/vertex, orders of
    * magnitude smaller than the documents. The per-round driver round-trip
    * is a convergence PROBE (a scalar label-sum aggregation — see the
    * monotonicity argument at the probe itself), not a data collect — the
    * standard shape for iterative graph algorithms (GraphX Pregel does
    * the same). Edge list is persisted once, both directions.
    *
    * The iteration runs only over EDGE ENDPOINTS; vertices that appear in
    * no edge are their own component by definition and are attached with
    * one left join at the end. In a dedup corpus the overwhelming majority
    * of documents are singletons, so the per-round shuffle is sized by the
    * duplicate mass (2·|E| bound), not the corpus.
    */
  def connectedComponents(edges: DataFrame, vertices: DataFrame,
      idCol: String = "id", srcCol: String = "src", dstCol: String = "dst",
      maxIter: Int = 50): DataFrame = {
    val bidir = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .union(edges.select(col(dstCol).as("src"), col(srcCol).as("dst")))
      .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst"))
      .distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // initial labels already fold in the FIRST propagation round for free:
    // min(self, direct neighbors) is a plain aggregation over the edge
    // list — no join. Each loop iteration then extends the horizon by one
    // hop, so a diameter-2 component (the common near-dup cluster) needs
    // one joined round plus the convergence check instead of three.
    // LAZY checkpoints throughout the loop: the convergence probe's sum
    // aggregation reads every partition, so it materializes the round's
    // checkpoint as a side effect — one job per round instead of an eager
    // checkpoint job plus a probe job.
    var labels = bidir.groupBy(col("src"))
      .agg(min(col("dst")).as("mn"))
      .select(col("src").as("id"), least(col("src"), col("mn")).as("label"))
      .localCheckpoint(eager = false)
    // Convergence probe: labels only ever DECREASE (min-propagation is
    // monotone) and the endpoint id set is fixed, so the label sum is
    // strictly decreasing until the fixpoint — equal sum ⟺ no label
    // changed. One scalar aggregation per round instead of the previous
    // next⋈old join probe (halves the per-round job count). decimal(38)
    // keeps the sum exact: long ids can overflow Long summed over
    // billions of endpoints, and a wrapped sum could alias two states.
    def labelSum(df: DataFrame): java.math.BigDecimal = {
      // sum over an empty endpoint set is NULL (edge-free graph) — fold
      // to zero so the probe still converges on the first round
      val s = df.agg(sum(col("label").cast("decimal(38,0)"))).head.getDecimal(0)
      if (s == null) java.math.BigDecimal.ZERO else s
    }
    var prevSum = labelSum(labels)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val msgs = bidir.join(labels, col("src") === col("id"))
        .select(col("dst").as("id"), col("label"))
      val next = labels.union(msgs)
        .groupBy(col("id")).agg(min(col("label")).as("label"))
        .localCheckpoint(eager = false)
      val nextSum = labelSum(next)
      converged = nextSum.compareTo(prevSum) == 0
      prevSum = nextSum
      labels = next
      iter += 1
    }
    bidir.unpersist()
    // partially-propagated labels are a SILENT keep/drop error downstream
    // (one true cluster splits into several, each electing a "survivor") —
    // never return them
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds — the graph " +
        "has a component with diameter > maxIter; raise maxIter (rounds are " +
        "cheap: one compact shuffle each) or switch to " +
        "connectedComponentsContracted, the large-star/small-star " +
        "contraction (Kiveris et al., \"Connected Components in MapReduce " +
        "and Beyond\") that converges in O(log n) rounds on any diameter")
    vertices.select(col(idCol).as("id"))
      .join(labels, Seq("id"), "left")
      .select(col("id"), coalesce(col("label"), col("id")).as("cluster_id"))
  }

  /** Connected components by LARGE-STAR/SMALL-STAR CONTRACTION (Kiveris et
    * al., "Connected Components in MapReduce and Beyond", SoCC'14) — the
    * escape hatch [[connectedComponents]]'s non-convergence error points
    * at. Min-label propagation needs one round per hop of component
    * DIAMETER; this contraction restructures the edge set itself and
    * converges in O(log n) rounds on ANY topology, so it is the shape for
    * adversarial graphs (long duplication chains, crawl-link structures)
    * where diameter is unbounded.
    *
    * Per round, with edges kept oriented high→low:
    *  - large-star: every node attaches its LARGER neighbors to the
    *    minimum of its closed neighborhood — expressed as a per-src `min`
    *    aggregation joined back to the bidirected edge list (no neighbor
    *    list is ever materialized, so a hot node costs a skew-join, not an
    *    OOM);
    *  - small-star: every node attaches its smaller-or-equal neighbors
    *    (and itself) to that minimum — same aggregation + join over the
    *    canonical orientation.
    * Both emit strictly-smaller-id parents, so edge weight sums decrease
    * monotonically; the fixpoint is a forest of stars rooted at each
    * component's min id. Convergence is detected EXACTLY (symmetric
    * difference of consecutive edge sets empty — one union+group job), not
    * by a collision-prone checksum. Labels then read directly off the
    * star edges; vertices absent from every edge are their own component.
    *
    * Same state discipline as [[connectedComponents]]: lazy
    * localCheckpoint per round cuts lineage, per-round shuffles carry only
    * (src, dst) id pairs.
    */
  def connectedComponentsContracted(edges: DataFrame, vertices: DataFrame,
      idCol: String = "id", srcCol: String = "src", dstCol: String = "dst",
      maxIter: Int = 30): DataFrame = {
    def canonical(df: DataFrame): DataFrame =
      df.select(greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
    def largeStar(cur: DataFrame): DataFrame = {
      val bidir = cur.union(cur.select(col("dst").as("src"), col("src").as("dst")))
      val mins = bidir.groupBy(col("src")).agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("src"), col("mn")).as("m"))
      // no distinct here: duplicate edges don't perturb smallStar's min
      // aggregation, and its trailing distinct canonicalizes the round's
      // output — one shuffle per round saved
      bidir.join(mins, Seq("src"))
        .where(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst")) // m ≤ src < dst: stays high→low
        .where(col("src") =!= col("dst"))
    }
    def smallStar(cur: DataFrame): DataFrame = {
      // input is high→low, so every dst ≤ src and m = min(closed nbhd)
      val mins = cur.groupBy(col("src")).agg(min(col("dst")).as("m"))
      cur.join(mins, Seq("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(mins.select(col("src"), col("m").as("dst")))
        .where(col("src") =!= col("dst"))
        .distinct()
    }
    var e = canonical(
      edges.select(col(srcCol).as("src"), col(dstCol).as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull && col("src") =!= col("dst")))
      .distinct()
      .localCheckpoint(eager = false)
    var prevCount = e.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(eager = false)
      // two-tier fixpoint test: the count (a cheap scan of the
      // just-materialized checkpoint; equal counts are NECESSARY for
      // equality) gates the exact symmetric-difference check (a full
      // union+group shuffle; both sets are distinct, so equal iff no
      // (src, dst) appears in exactly one) — mid-run rounds pay one scan,
      // not one extra shuffle
      val nextCount = next.count()
      converged = nextCount == prevCount &&
        e.union(next).groupBy(col("src"), col("dst"))
          .count().where(col("count") === 1).isEmpty
      prevCount = nextCount
      e = next
      iter += 1
    }
    if (!converged) throw new IllegalStateException(
      s"connectedComponentsContracted did not converge in $maxIter rounds — " +
        "contraction needs O(log n) rounds, so this indicates maxIter far " +
        "below log2(|V|) or a defect; raise maxIter")
    // fixpoint = star forest: src → its component min; roots and isolated
    // vertices carry their own id
    vertices.select(col(idCol).as("id"))
      .join(e.select(col("src").as("id"), col("dst").as("cluster_id")), Seq("id"), "left")
      .select(col("id"), coalesce(col("cluster_id"), col("id")).as("cluster_id"))
  }

  /** Full dedup-cluster resolution over a corpus: exact n-gram Jaccard
    * pairs (inverted shingle index — never all-pairs) → connected
    * components → per-document (cluster_id, cluster_size, is_survivor)
    * with the min-id canonical survivor rule. Singleton documents are their
    * own cluster (kept), so the output is a total keep/drop decision for
    * the corpus.
    */
  def dedupClusters(docs: DataFrame, n: Int, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text",
      maxDf: Long = Long.MaxValue): DataFrame = {
    val pairs = ngramJaccardPairs(docs, docs, n, threshold, idCol, textCol, maxDf)
      .where(col("a_id") < col("b_id"))
    clustersFromPairs(pairs, docs, idCol)
  }

  /** The 100 TB dedup-cluster path: candidate pairs from banded MinHash LSH
    * (never the exact all-sharing-a-shingle join — its cost grows with the
    * SQUARE of duplicate-cluster size) → connected components → the same
    * (cluster_id, cluster_size, is_survivor) resolution as [[dedupClusters]].
    * `threshold` filters candidates on ESTIMATED Jaccard (signature
    * agreement), so clustering is approximate exactly where the candidate
    * generation is; at high thresholds (exact/near-exact copies) the two
    * operators agree — asserted in DedupSpec.
    */
  def dedupClustersApprox(docs: DataFrame, n: Int, k: Int, bands: Int,
      threshold: Double, idCol: String = "doc_id", textCol: String = "text",
      portableHash: Boolean = false): DataFrame = {
    val pairs = minhashCandidates(docs, n, k, bands, threshold, idCol, textCol, portableHash)
    clustersFromPairs(pairs, docs, idCol)
  }

  /** Content-defined chunking + chunk-level dedup — the storage-dedup
    * scheme (Rabin/FastCDC family) applied to token streams: cut a
    * document where the hash of the w-gram ENDING at a position is
    * ≡ 0 (mod divisor), so boundaries depend on CONTENT, not offsets —
    * an insertion early in a document shifts every fixed-size block but
    * leaves all later CDC chunks (and their fingerprints) intact. Chunk
    * fingerprints shared across documents then localize WHICH PARTS of
    * two near-dup documents coincide — finer than d02's whole-doc
    * fingerprint, cheaper than d15's per-gram span index (one hash per
    * position, but chunks ~divisor tokens, not grams).
    *
    * Emits one row per chunk: (id, chunk_idx, start_pos, chunk_len,
    * chunk_fp, is_dup) with `is_dup` = the fingerprint occurs more than
    * once corpus-wide. All integer/md5 arithmetic — no float gate. Scale:
    * the chunking is a pure per-row HOF chain (O(n) hashes per doc);
    * the only shuffle keys on chunk_fp (the dedup index — at 100 TB the
    * persisted, bucketed artifact incremental ingests probe, d17-style).
    *
    * Documents shorter than w tokens form a single cut-less chunk;
    * token-less documents have no content to chunk and emit no rows.
    */
  def cdcChunkDedup(docs: DataFrame, w: Int = 4, divisor: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = Par.spreadForCpu(docs)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("ws"))
      .where(size(col("ws")) >= 1)
    val n = size(col("ws")).cast(LongType)
    // 1-based cut positions p ∈ [w, n]: the w-gram ending at p hashes ≡ 0
    val cuts = when(n >= w,
        filter(sequence(lit(w.toLong), n), p =>
          pmod(md5Low64(array_join(
            slice(col("ws"), (p - w + 1).cast("int"), lit(w)), " ")),
            lit(divisor.toLong)) === 0))
      .otherwise(array().cast("array<bigint>"))
    val withCuts = toks.select(col(idCol), col("ws"), n.as("n_tokens"), cuts.as("cuts"))
    val starts = concat(array(lit(1L)), transform(col("cuts"), c => c + 1))
    val ends = concat(col("cuts"), array(col("n_tokens")))
    // a cut at the last token leaves an empty trailing span — drop it
    val spans = filter(zip_with(starts, ends, (s, e) =>
      struct(s.as("st"), e.as("en"))), x => x.getField("st") <= x.getField("en"))
    val per = withCuts
      .select(col(idCol), col("ws"), col("n_tokens"),
        posexplode(spans).as(Seq("chunk_idx", "ch")))
      .select(col(idCol), col("chunk_idx").cast(LongType).as("chunk_idx"),
        col("ch.st").as("start_pos"),
        (col("ch.en") - col("ch.st") + 1).as("chunk_len"),
        md5(array_join(slice(col("ws"), col("ch.st").cast("int"),
          (col("ch.en") - col("ch.st") + 1).cast("int")), " ")).as("chunk_fp"))
    val counts = per.groupBy(col("chunk_fp")).agg(count(lit(1)).as("fp_n"))
    per.join(counts, Seq("chunk_fp"))
      .select(col(idCol), col("chunk_idx"), col("start_pos"), col("chunk_len"),
        col("chunk_fp"), (col("fp_n") > 1).as("is_dup"))
  }

  /** Soft dedup — reweighting instead of removal (the SoftDeDup idea:
    * down-weight duplicated content in the training mix rather than
    * dropping all-but-one copy; loss-weighting keeps coverage while
    * removing the duplication bias). Each document in a near-dup cluster
    * of size s carries `weight = round(1/s, 9)`, so every cluster
    * contributes exactly one document's worth of expected gradient mass;
    * singletons keep weight 1.0.
    *
    * Input is any cluster frame shaped like [[dedupClusters]] /
    * [[dedupClustersApprox]] output (doc_id, cluster_id, cluster_size, …).
    * Pure per-row projection on top of the clustering — the weight adds
    * no shuffle beyond what the clustering already paid.
    */
  def softDedupWeights(clusters: DataFrame, idCol: String = "doc_id"): DataFrame =
    clusters.select(col(idCol), col("cluster_id"), col("cluster_size"),
      round(lit(1.0) / col("cluster_size").cast(DoubleType), 9).as("weight"))

  /** Incremental dedup — the rolling-build staple: classify a NEW batch
    * of documents against an existing corpus without touching the corpus
    * rows themselves. `dup_corpus` = content fingerprint already present
    * in the corpus (every copy, including the batch's first); `dup_batch`
    * = novel fingerprint that another batch document with a smaller id
    * already claimed; `new` = the keeper.
    *
    * Scale shape: the corpus collapses to its DISTINCT fingerprint index
    * (in production the index is persisted and bucketed by fp, so the
    * membership join is co-located and the corpus is never re-scanned per
    * batch); the batch side is one fingerprint projection, one join on
    * the 16-byte key, and one within-batch min-id window. Batch size,
    * not corpus size, drives the incremental cost.
    */
  def incrementalDedup(corpus: DataFrame, batch: DataFrame,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val corpusFps = corpus
      .select(TextAnalysis.contentFingerprint(col(textCol)).as("fp"))
      .distinct().withColumn("in_corpus", lit(true))
    val b = batch.select(col(idCol).as("id"),
      TextAnalysis.contentFingerprint(col(textCol)).as("fp"))
    val wf = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    b.join(corpusFps, Seq("fp"), "left")
      .withColumn("first_id", min(col("id")).over(wf))
      .select(col("id").as(idCol),
        when(coalesce(col("in_corpus"), lit(false)), lit("dup_corpus"))
          .when(col("id") =!= col("first_id"), lit("dup_batch"))
          .otherwise(lit("new")).as("status"))
  }

  /** Incremental NEAR-duplicate gate — [[incrementalDedup]]'s
    * rolling-build step lifted from exact fingerprints to MinHash/LSH:
    * classify each batch document against the corpus's banded signature
    * index, and against lower-id batch peers, WITHOUT ever forming a
    * corpus-corpus pair.
    *
    * Statuses (priority order): `dup_corpus` — some corpus doc estimates
    * ≥ `threshold`; `dup_batch` — no corpus match but a LOWER-id batch
    * doc does (pairwise greedy semantics: the lowest id of a batch
    * near-dup chain survives — chains that need transitive closure are
    * d12's job, this is the per-ingest gate); `new` otherwise (including
    * sub-n-token docs, which have no signature). `match_id` /
    * `est_jaccard` carry the winning class's best match (highest
    * estimate, ties to the lowest id) — `m/k` is a dyadic rational, so
    * the double compares exactly cross-engine.
    *
    * Scale shape: corpus signatures + band buckets are ONE corpus pass —
    * in a rolling ingest that index is the persisted artifact
    * (bucketBy(bucket) parquet), amortized across batches exactly like
    * d17's fingerprint index and d20's gram index. The probe side is
    * batch-sized: batch bands hash-join the index on bucket, candidates
    * are (batch doc × its collisions), and signature re-joins attach k
    * longs per surviving pair only.
    */
  def incrementalNearDup(corpus: DataFrame, batch: DataFrame,
      n: Int, k: Int, bands: Int, threshold: Double,
      idCol: String = "doc_id", textCol: String = "text",
      portableHash: Boolean = false): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val rpb = k / bands
    def sigsOf(df: DataFrame) =
      (if (portableHash) minhashSignaturesPortable(df, n, k, idCol, textCol)
       else minhashSignatures(df, n, k, idCol, textCol))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cs = sigsOf(corpus)
    val bs = sigsOf(batch)
    val corpusIdx = bandBuckets(cs, bands, rpb)
    val batchBands = bandBuckets(bs, bands, rpb)
    def estim(a: Column, b: Column): Column = estJaccard(a, b, k)
    def best(cands: DataFrame): DataFrame =
      // winning match per batch doc: highest estimate, ties → lowest id.
      // max_by (not a window): partial+final aggregate with map-side
      // combine — est_jaccard is a never-null dyadic rational, and
      // maximizing (est, -match_id) is exactly (est DESC, match_id ASC)
      cands.groupBy(col("id"))
        .agg(max_by(struct(col("match_id"), col("est_jaccard")),
          struct(col("est_jaccard"), negate(col("match_id")))).as("win"))
        .select(col("id"), col("win.match_id").as("match_id"),
          col("win.est_jaccard").as("est_jaccard"))
    val corpusBest = best(batchBands
      .join(corpusIdx.withColumnRenamed("id", "match_id"), Seq("bucket"))
      .select(col("id"), col("match_id")).distinct()
      .join(bs.select(col("id"), col("sig").as("b_sig")), Seq("id"))
      .join(cs.select(col("id").as("match_id"), col("sig").as("m_sig")), Seq("match_id"))
      .select(col("id"), col("match_id"), estim(col("b_sig"), col("m_sig")).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold))
    val batchBest = best(batchBands
      .join(batchBands.select(col("bucket"), col("id").as("match_id")), Seq("bucket"))
      .where(col("match_id") < col("id"))
      .select(col("id"), col("match_id")).distinct()
      .join(bs.select(col("id"), col("sig").as("b_sig")), Seq("id"))
      .join(bs.select(col("id").as("match_id"), col("sig").as("m_sig")), Seq("match_id"))
      .select(col("id"), col("match_id"), estim(col("b_sig"), col("m_sig")).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold))
    batch.select(col(idCol).as("id"))
      .join(corpusBest.select(col("id"),
        col("match_id").as("c_id"), col("est_jaccard").as("c_j")), Seq("id"), "left")
      .join(batchBest.select(col("id"),
        col("match_id").as("p_id"), col("est_jaccard").as("p_j")), Seq("id"), "left")
      .select(col("id").as(idCol),
        when(col("c_id").isNotNull, lit("dup_corpus"))
          .when(col("p_id").isNotNull, lit("dup_batch"))
          .otherwise(lit("new")).as("status"),
        when(col("c_id").isNotNull, col("c_id")).otherwise(col("p_id")).as("match_id"),
        when(col("c_id").isNotNull, col("c_j")).otherwise(col("p_j")).as("est_jaccard"))
  }

  /** Bloom-filter decontamination — the 100 TB scale path of
    * [[contaminationFlags]]. The exact variant broadcasts the DISTINCT
    * contamination shingles as an in-memory set; fine while benchmark
    * suites are small, but the broadcast grows with the contamination
    * set and stops fitting executor memory long before a large held-out
    * corpus does. This variant folds the contamination shingles into a
    * fixed-size bloom filter (Spark's own runtime-filter sketch, exposed
    * via the engine's `bloom_agg`/`bloom_contains` functions) built by
    * one aggregation and shipped to every task as a scalar-subquery
    * constant; the corpus side stays a single codegen'd scan + probe.
    *
    * Error is ONE-SIDED: `bloom_contains` has no false negatives, so
    * every exactly-contaminated document is flagged; false positives
    * over-flag at the filter's fpp (pick `numBits` ≈ 10–20× the distinct
    * shingle count for ≲1%). Returns `(id, bloom_hit)` for every corpus
    * document — short documents (< n tokens) have no shingles and are
    * never flagged.
    */
  def contaminationFlagsBloom(spark: org.apache.spark.sql.SparkSession,
      docs: DataFrame, contaminated: DataFrame, n: Int,
      estItems: Long, numBits: Long,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    // per-call view names + drop-after-build: spark.sql resolves views
    // EAGERLY at analysis, so once `hits` exists the plan no longer
    // references the catalog entries — fixed names would make concurrent
    // or interleaved calls silently rebind each other's inputs and leak
    // session-global state
    val tag = Dedup.bloomViewTag.incrementAndGet()
    val contamView = s"graft_bloom_contam_$tag"
    val corpusView = s"graft_bloom_corpus_$tag"
    shingleSets(contaminated, n, idCol, textCol)
      .select(explode(col("sh")).as("s")).distinct()
      .createOrReplaceTempView(contamView)
    shingleSets(docs, n, idCol, textCol)
      .select(col("id"), explode(col("sh")).as("s"))
      .createOrReplaceTempView(corpusView)
    // the bloom rides as a scalar-subquery CONSTANT (bloom_contains
    // requires one); docs whose every probe misses — or with no shingles
    // at all — resolve to false via the left join below
    val hits =
      try spark.sql(
        s"""SELECT id, max(bloom_contains(
           |    (SELECT bloom_agg(xxhash64(s), ${estItems}L, ${numBits}L)
           |     FROM $contamView),
           |    xxhash64(s))) AS bloom_hit
           |FROM $corpusView GROUP BY id""".stripMargin)
      finally {
        spark.catalog.dropTempView(contamView)
        spark.catalog.dropTempView(corpusView)
      }
    docs.select(col(idCol).as("id"))
      .join(hits, Seq("id"), "left")
      .select(col("id"), coalesce(col("bloom_hit"), lit(false)).as("bloom_hit"))
  }

  private val bloomViewTag = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Duplicate n-gram SPAN coverage — the exact-substring dedup family
    * (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    * Better": duplicated *spans* are removed, not whole documents). A
    * position-indexed word n-gram occurring in ≥2 DISTINCT documents marks
    * its n token positions as duplicated; per document this reports the
    * count of token positions covered by at least one duplicated n-gram
    * and the covered fraction — the keep/trim decision for span-level
    * dedup.
    *
    * Scale shape: positional grams `(doc, pos, hash(gram))` form an
    * inverted index that is exploded ONCE — "gram appears in ≥2 distinct
    * documents" is `min(id) ≠ max(id)` over a window partitioned by the
    * gram key, which replaces the groupBy + semi-join formulation (that
    * shape re-derives the whole gram explode on both sides of the join;
    * this one shuffles the gram rows a single time). The per-document
    * union of overlapping spans is then a lag window over span STARTS
    * (first span contributes n, each later one `min(n, pos − prev)`),
    * never an explode of the n covered positions: that n× row blowup is
    * the difference between a shuffle of gram starts and a shuffle of
    * the whole corpus at 100 TB. Gram keys: `portableHash = true` (the
    * catalog query) uses md5 hex so DuckDB reproduces them; `false` is
    * the production family — xxhash64 longs, 8-byte shuffle keys instead
    * of 32-char strings, exactly the d04-vs-d11 trade (coverage output
    * is hash-family-invariant absent a 64-bit collision; asserted equal
    * in DedupSpec). Suffix-array machinery (the paper's exact algorithm)
    * is deliberately traded for fixed-n grams: fixed n loses
    * shorter-than-n duplicates but keeps the whole operator in two
    * shuffles of narrow keys.
    */
  def duplicateSpanCoverage(docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text",
      portableHash: Boolean = true): DataFrame = {
    val (grams, dupStarts) = dupSpanStarts(tokenized(docs, idCol, textCol), n, portableHash)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    val cov = dupStarts
      .withColumn("prev", lag(col("pos"), 1).over(w))
      .groupBy(col("id"))
      .agg(sum(when(col("prev").isNull, lit(n))
        .otherwise(least(lit(n), col("pos") - col("prev")))).as("dup_tokens"))
    grams.select(col("id").as(idCol), col("n_toks"))
      .join(cov.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("n_toks"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
      .withColumn("dup_ratio",
        round(col("dup_tokens").cast(DoubleType) / greatest(col("n_toks"), lit(1L)), 6))
  }

  /** Shared first stage of the span family (d15 coverage / d18 trim):
    * positional gram-hash rows, and the subset whose gram occurs in ≥2
    * DISTINCT documents (`min(id) ≠ max(id)` over the gram window — one
    * explode, one shuffle; see [[duplicateSpanCoverage]]'s scale notes).
    * Returns (grams = (id, n_toks, gh array), dupStarts = (id, pos)).
    * `toks` is the `tokenized` projection — callers choose the corpus.
    */
  private def dupSpanStarts(toks: DataFrame, n: Int,
      portableHash: Boolean): (DataFrame, DataFrame) = {
    val (grams, pos) = positionalGrams(toks, n, portableHash)
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    val dupStarts = pos
      .withColumn("dup", min(col("id")).over(wg) =!= max(col("id")).over(wg))
      .where(col("dup"))
      .select(col("id"), col("pos"))
    (grams, dupStarts)
  }

  /** Positional gram-hash stage shared across the span family:
    * grams = (id, n_toks, gh array) — < n tokens → empty array, so every
    * document keeps a row here and in each final left join; pos = the
    * exploded (id, pos, g) rows. The positional gram windowing is the ONE
    * shared definition (ngramsFromTokens, in argument position so it
    * evaluates once per row); only the keying is the span family's own.
    */
  private def positionalGrams(toks: DataFrame, n: Int,
      portableHash: Boolean): (DataFrame, DataFrame) = {
    val key: Column => Column = if (portableHash) md5 else (g => xxhash64(g))
    val grams = toks.select(col("id"), size(col("ws")).cast(LongType).as("n_toks"),
      transform(TextAnalysis.ngramsFromTokens(col("ws"), n), g => key(g)).as("gh"))
    val pos = grams.select(col("id"), posexplode(col("gh")))
      .toDF("id", "pos", "g")
    (grams, pos)
  }

  /** Cross-snapshot INCREMENTAL span dedup — d15's coverage with d17's
    * rolling-build shape: score a NEW batch's duplicated-span coverage
    * against an existing corpus WITHOUT re-scoring the corpus. A batch
    * gram position is duplicated when its gram exists in the corpus gram
    * index, OR occurs in ≥2 distinct batch documents (the within-batch
    * d15 rule); the per-document span union is the same lag window.
    *
    * Scale shape: the corpus collapses to its DISTINCT gram-key index —
    * built once per snapshot and, in production, persisted bucketed by
    * gram key so each batch's membership probe is a co-located join and
    * the corpus is never re-read per batch (the d17 fingerprint-index
    * story, one level deeper). Batch size drives the incremental cost:
    * one batch explode, one window over batch grams, one keyed join
    * against the index ([[graft.ScaleSmoke]] measures the
    * batch-cost-vs-corpus-blowup invariant).
    */
  def incrementalSpanCoverage(corpus: DataFrame, batch: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text",
      portableHash: Boolean = true): DataFrame = {
    val corpusIdx = positionalGrams(tokenized(corpus, idCol, textCol), n, portableHash)
      ._2.select(col("g")).distinct()
      .withColumn("in_corpus", lit(true))
    val (grams, pos) = positionalGrams(tokenized(batch, idCol, textCol), n, portableHash)
    val wg = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    val cov = pos
      .withColumn("batch_dup", min(col("id")).over(wg) =!= max(col("id")).over(wg))
      .join(corpusIdx, Seq("g"), "left")
      .where(col("batch_dup") || coalesce(col("in_corpus"), lit(false)))
      .withColumn("prev", lag(col("pos"), 1).over(w))
      .groupBy(col("id"))
      .agg(sum(when(col("prev").isNull, lit(n))
        .otherwise(least(lit(n), col("pos") - col("prev")))).as("dup_tokens"))
    grams.select(col("id").as(idCol), col("n_toks"))
      .join(cov.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .select(col(idCol), col("n_toks"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"))
      .withColumn("dup_ratio",
        round(col("dup_tokens").cast(DoubleType) / greatest(col("n_toks"), lit(1L)), 6))
  }

  /** Duplicate-span TRIM — the output side of Lee et al. 2022: d15 only
    * REPORTS coverage; this emits the cleaned document with every
    * duplicated span removed. Same dup-start derivation as
    * [[duplicateSpanCoverage]] ([[dupSpanStarts]]), then per document:
    *  - merge overlapping/adjacent spans [pos, pos+n) into maximal
    *    islands with the classic gaps-and-islands window (new island when
    *    `pos − prev > n`; island = running sum of the new-island flag) —
    *    island COUNT per doc is bounded by n_toks/n, so the
    *    collect_list of (lo, hi) intervals below is bounded per row, never
    *    corpus-sized;
    *  - keep token positions covered by NO island (a per-row HOF filter
    *    over the interval array — O(tokens × islands) per row, no
    *    shuffle) and re-join the survivors into `trimmed_text`.
    * `n_toks − n_kept` equals d15's `dup_tokens` by construction (the lag
    * union and the island complement count the same positions) — asserted
    * in DedupSpec, so coverage and trim cannot drift apart.
    */
  def duplicateSpanTrim(docs: DataFrame, n: Int,
      idCol: String = "doc_id", textCol: String = "text",
      portableHash: Boolean = true): DataFrame = {
    val toks = tokenized(docs, idCol, textCol)
    val (_, dupStarts) = dupSpanStarts(toks, n, portableHash)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id")).orderBy(col("pos"))
    val islands = dupStarts
      .withColumn("prev", lag(col("pos"), 1).over(w))
      .withColumn("new_isl",
        when(col("prev").isNull || col("pos") - col("prev") > n, 1L).otherwise(0L))
      .withColumn("isl", sum(col("new_isl")).over(w))
      .groupBy(col("id"), col("isl"))
      .agg(min(col("pos")).as("lo"), (max(col("pos")) + n - 1).as("hi"))
      .groupBy(col("id"))
      .agg(sort_array(collect_list(struct(col("lo"), col("hi")))).as("ivs"))
    toks.join(islands, Seq("id"), "left")
      .select(col("id"), col("ws"), col("ivs"))
      .select(col("id"), col("ws"), size(col("ws")).cast(LongType).as("n_toks"),
        when(size(col("ws")) === 0, array().cast("array<int>"))
          .otherwise(filter(sequence(lit(0), size(col("ws")) - 1),
            p => col("ivs").isNull ||
              !exists(col("ivs"), iv =>
                p >= iv.getField("lo") && p <= iv.getField("hi")))).as("kept"))
      .select(col("id").as(idCol), col("n_toks"),
        size(col("kept")).cast(LongType).as("n_kept"),
        concat_ws(" ", transform(col("kept"), p => element_at(col("ws"), p + 1)))
          .as("trimmed_text"))
  }

  /** Winnowed (MOSS-style) k-gram fingerprints: per document, every
    * k-token gram is hashed (portable md5-low64 of the space-joined
    * gram, cf. reference receiver.py's content hashing at the DOCUMENT
    * grain — this is the sub-document grain), then each sliding window
    * of `w` consecutive gram hashes selects its minimum — RIGHTMOST
    * minimum on ties, the MOSS rule — and the distinct selected
    * (position, hash) pairs are the document's fingerprints.
    *
    * Guarantee (Schleimer et al. 2003): any token run of length
    * ≥ w + k − 1 shared by two documents yields at least one shared
    * fingerprint; the index is ~2/(w+1) the size of the full gram
    * index.
    *
    * Scale: the whole selection is per-row higher-order-function work
    * (O(tokens·w) per document, no shuffle, no gram explode) — only the
    * SELECTED fingerprints ever leave the row, so the downstream
    * inverted index is winnowed-size, not gram-size. Output:
    * (idCol, pos, h, n_grams).
    */
  def winnowedFingerprints(docs: DataFrame, k: Int, w: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val grams = spreadForCpu(docs)
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("ws"))
      .where(size(col("ws")) >= k)
      .select(col(idCol),
        transform(sequence(lit(0), size(col("ws")) - k),
          i => md5Low64(array_join(slice(col("ws"), i + 1, lit(k)), " ")))
          .as("gh"))
    val zero = struct(lit(-1).as("p"), lit(Long.MaxValue).as("v"))
    grams
      .select(col(idCol), size(col("gh")).cast(LongType).as("n_grams"),
        array_distinct(transform(
          sequence(lit(0), greatest(size(col("gh")) - w, lit(0))),
          j => aggregate(
            sequence(j, least(j + lit(w - 1), size(col("gh")) - 1)),
            zero,
            (acc, i) => when(
              element_at(col("gh"), i + 1) <= acc.getField("v"),
              struct(i.as("p"), element_at(col("gh"), i + 1).as("v")))
              .otherwise(acc)))).as("fps"))
      .select(col(idCol), col("n_grams"), explode(col("fps")).as("f"))
      .select(col(idCol), col("f").getField("p").cast(LongType).as("pos"),
        col("f").getField("v").as("h"), col("n_grams"))
  }

  /** Maximal EXACT repeated substrings (token level) — the
    * exact-substring dedup of Lee et al. 2022 ("Deduplicating Training
    * Data Makes Language Models Better") as a winnowing-anchored
    * exact-extend pass, the d34 step past d15/d18's fixed-gram
    * granularity: d15 marks positions covered by duplicated n-grams; this
    * emits the maximal exactly-equal token runs themselves, verified
    * token-for-token, with their positions in BOTH occurrences.
    *
    * Pipeline: (1) [[winnowedFingerprints]] anchors (Schleimer guarantee:
    * any shared run of ≥ w+k−1 tokens shares a selected fingerprint
    * INSIDE the run — so minLen = w+k−1 gives full coverage); (2) each
    * fingerprint occurrence pairs with its ADJACENT occurrence in the
    * occurrence list sorted by CONTEXT KEY (the anchor plus the next
    * `ctxTokens` tokens) — lead() over the fingerprint key, the genuine
    * suffix-array adjacency: true partners of a run agree on the key
    * through the run and sort adjacent, while a bare-k-gram occurrence
    * diverges at token k+1 and cannot interleave them. O(occurrences)
    * pairs total where all-pairs would be Σ df², the boilerplate-key
    * explosion; (3) each anchor pair VERIFIES its k anchor tokens
    * (64-bit fingerprints alone admit birthday collisions at 10¹²-gram
    * scale) and extends left and right to the maximal equal run by
    * zip-compared token slices (per-row HOF, no shuffle), dropped under
    * `minLen`. Same-document repeats pair like cross-document ones.
    *
    * Coverage contract (documented trade): every occurrence of a
    * duplicated run ≥ w+k−1 appears in at least one emitted maximal
    * repeat, PROVIDED no other occurrence shares its anchor's full
    * context key without sharing the run — an interleaver under the
    * context order must itself share ≥ k+ctxTokens tokens, making it a
    * true partner whose chain pair still covers the occurrence; only
    * for runs diverging beyond the context window does adjacency become
    * approximate (linear pair budget instead of Σ df²; the planted
    * spec covers 2-way, 3-way, and bare-gram-interleaver cases).
    *
    * Scale shape: winnowed index (~2/(w+1) of grams), ONE
    * fingerprint-keyed shuffle for the adjacency window, two id-keyed
    * joins to fetch the token arrays, per-row extension. No pair term
    * beyond occurrence count, no document×document join anywhere.
    * Output: (doc_a, a_start, doc_b, b_start, rep_len), distinct,
    * 0-based token offsets, (doc_a, a_start) ≤ (doc_b, b_start)
    * lexicographically.
    */
  def maximalExactRepeats(docs: DataFrame, k: Int, w: Int, minLen: Int,
      idCol: String = "doc_id", textCol: String = "text",
      ctxTokens: Int = 24): DataFrame = {
    require(minLen >= k, s"minLen=$minLen must cover the $k-token anchor")
    val toks = tokenized(docs, idCol, textCol)
      .select(col("id"), col("ws"), size(col("ws")).cast(LongType).as("n"))
    // SUFFIX-ordered adjacency (the r14 review finding): occurrences of
    // a fingerprint sort by their CONTEXT KEY — the anchor plus the next
    // `ctxTokens` tokens — before (id, pos). True partners of a shared
    // run agree on that key through the run, so they sort ADJACENT; an
    // occurrence that interleaves under the old (id, pos) order while
    // sharing only the bare k-gram diverges at token k+1 and sorts away.
    // An occurrence that DOES share the full context key is a true
    // ≥ k+ctxTokens partner itself, so chain pairing still covers every
    // occurrence; only beyond the context window does adjacency become
    // approximate again (documented in the contract above).
    val fps = winnowedFingerprints(docs, k, w, idCol, textCol)
    val fpsCtx = fps
      .select(col(idCol).as("id"), col("pos"), col("h"))
      .join(toks.select(col("id"), col("ws")), Seq("id"))
      .withColumn("ctx", array_join(
        slice(col("ws"), (col("pos") + 1).cast("int"), lit(k + ctxTokens)), " "))
      .select(col("id"), col("pos"), col("h"), col("ctx"))
    val wFp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("h")).orderBy(col("ctx"), col("id"), col("pos"))
    val pairs = fpsCtx
      .withColumn("id_b", lead(col("id"), 1).over(wFp))
      .withColumn("pb", lead(col("pos"), 1).over(wFp))
      .where(col("id_b").isNotNull)
      .select(col("id").as("id_a"), col("pos").as("pa"),
        col("id_b"), col("pb"))
      .distinct() // several anchor grams inside one run → one pair row
    // first mismatch position in a zipped equality array = the exact
    // extension length (array_position is 1-based, 0 = no mismatch)
    def ext(za: Column): Column = {
      val p = array_position(za, lit(false))
      when(p === 0, size(za).cast(LongType)).otherwise(p - 1)
    }
    val extended = pairs
      .join(toks.select(col("id").as("id_a"), col("ws").as("wsa"), col("n").as("na")), Seq("id_a"))
      .join(toks.select(col("id").as("id_b"), col("ws").as("wsb"), col("n").as("nb")), Seq("id_b"))
      // the k anchor tokens are VERIFIED, not trusted from the 64-bit
      // fingerprint: at ~10¹² grams birthday collisions are expected,
      // and "exact" must mean token-for-token (the r14 review finding)
      .where(slice(col("wsa"), (col("pa") + 1).cast("int"), lit(k)) ===
        slice(col("wsb"), (col("pb") + 1).cast("int"), lit(k)))
      .withColumn("mr", greatest(least(col("na") - col("pa") - k,
        col("nb") - col("pb") - k), lit(0L)))
      .withColumn("ml", least(col("pa"), col("pb")))
      .withColumn("extr", ext(zip_with(
        slice(col("wsa"), (col("pa") + k + 1).cast("int"), col("mr").cast("int")),
        slice(col("wsb"), (col("pb") + k + 1).cast("int"), col("mr").cast("int")),
        (x, y) => x === y)))
      .withColumn("extl", ext(zip_with(
        reverse(slice(col("wsa"), (col("pa") - col("ml") + 1).cast("int"), col("ml").cast("int"))),
        reverse(slice(col("wsb"), (col("pb") - col("ml") + 1).cast("int"), col("ml").cast("int"))),
        (x, y) => x === y)))
      .select(col("id_a"), (col("pa") - col("extl")).as("sa"),
        col("id_b"), (col("pb") - col("extl")).as("sb"),
        (col("extl") + k + col("extr")).as("rep_len"))
      .where(col("rep_len") >= minLen)
    // canonical orientation: context order can deliver either occurrence
    // first — normalize so (doc_a, a_start) ≤ (doc_b, b_start)
    val sw = col("id_b") < col("id_a") ||
      (col("id_b") === col("id_a") && col("sb") < col("sa"))
    extended
      .select(
        when(sw, col("id_b")).otherwise(col("id_a")).as("doc_a"),
        when(sw, col("sb")).otherwise(col("sa")).as("a_start"),
        when(sw, col("id_a")).otherwise(col("id_b")).as("doc_b"),
        when(sw, col("sa")).otherwise(col("sb")).as("b_start"),
        col("rep_len"))
      .distinct()
  }

  /** Exact Jaccard ≥ ½ set-similarity SELF-JOIN over whitespace token
    * sets, with the execution regime picked by the MEASURED vocabulary —
    * the round-12 lesson: prefix filtering (PPJoin) assumes a sparse,
    * high-entropy vocabulary where rare tokens exist; on a dense
    * vocabulary (the `documents` corpus has 31 distinct tokens, median
    * df = 77% of the corpus) every "rare" token is near-universal and
    * the prefix index fans out ~9× MORE candidate rows than all-pairs
    * (measured 112.6M at sf0.1). The two regimes:
    *
    *  - vocab ≤ `denseVocabMax` (≤ 64) AND measured distinct-mask count
    *    M ≤ `denseMaskMax`: [[bitsetJaccardPairs]] — each token set is a
    *    64-bit mask, identical sets collapse first (exact dedup, the d01
    *    move), and candidate evaluation is `bit_count(a & b)` arithmetic
    *    over DISTINCT masks only. No token self-join exists in the plan
    *    at all. The M gate exists because the candidate stage is M×M —
    *    see the probe comment at the regime split.
    *  - otherwise: [[ppjoinPairs]] — canonical PPJoin with the length
    *    AND positional filters round 12 omitted.
    *
    * The vocabulary probe is one bounded scan (`limit(max+1)` on the
    * distinct tokens — never a full collect of a data-sized vocabulary).
    * Threshold fixed at t = ½ so every gate is integer-exact:
    * J ≥ ½ ⟺ 3·|A∩B| ≥ |A|+|B|. Output: (doc_a, doc_b, inter, un,
    * jaccard) with doc_a < doc_b; docs with empty token sets excluded
    * (J is undefined against the empty set).
    */
  def jaccardSelfJoin(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", denseVocabMax: Int = 64,
      smallCorpusMax: Long = 1L << 20, denseMaskMax: Long = 1L << 16): DataFrame = {
    require(denseVocabMax <= 64, s"dense path packs one 64-bit mask, got $denseVocabMax")
    val probe = spreadForCpu(docs)
      .select(explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("tok"))
      .distinct().limit(denseVocabMax + 1).collect().map(_.getString(0))
    if (probe.length <= denseVocabMax) {
      // Second gate — the r14 finding: a ≤64-token vocabulary bounds the
      // mask SPACE at 2^64, not the observed mask count M, and the dense
      // path's candidate stage is an M×M broadcast-nested-loop. A corpus
      // whose mask space is rich (M ~ 10⁵⁺) would sit in a near-quadratic
      // BNLJ however small its vocabulary, so M is MEASURED with the same
      // bounded limit-count discipline as the vocabulary and corpus
      // probes (the distinct-mask table is tiny; only a scalar reaches
      // the driver). The probe costs one extra mask-fold scan of the
      // corpus — linear, and cheap insurance against an unbounded
      // quadratic stage. Above the bound, route to the sparse regime
      // (ppjoinPairs, proven exact against all-pairs truth), whose cost
      // tracks the prefix-index fan-out rather than M².
      val vocab = probe.sorted
      val mCap = math.min(denseMaskMax, Int.MaxValue - 2L).toInt
      // persisted (session-owned, the d33 discipline): the probe's count
      // MATERIALIZES the mask fold, and the pair stage then reads the
      // cache in every consuming branch (dm aggregation, both expansion
      // broadcasts, the identical-set self-join) instead of re-running
      // the tokenize+fold corpus pass per branch — measured 6.4 → 3.4 s
      // at sf0.1 once the probe landed; without it the probe's "one
      // extra linear pass" was really tokenize×2
      val masks = tokenMasks(docs, idCol, textCol, vocab)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val m = masks.select(col("mask")).distinct().limit(mCap + 1).count()
      if (m <= denseMaskMax)
        bitsetJaccardPairsImpl(docs, idCol, textCol, vocab, smallCorpusMax,
          preMasks = Some(masks))
      else {
        masks.unpersist(blocking = false) // sparse route never reads it
        ppjoinPairs(docs, idCol, textCol)
      }
    } else ppjoinPairs(docs, idCol, textCol)
  }

  /** Dense-vocabulary exact Jaccard ≥ ½ pairs: token sets as 64-bit
    * masks. Plan shape: (1) per-row mask fold (no shuffle), (2) ONE
    * mask-keyed aggregation to the M distinct sets, (3) M×M candidate
    * evaluation by `bit_count(a & b)` over a broadcast of the distinct
    * masks — 16 bytes/row, so M up to ~10⁷ broadcasts fine, and with a
    * ≤ 64-token vocabulary M is bounded by the observed subset count,
    * not the corpus size: 100× more documents adds ~0 new masks, which
    * is exactly why the collapse must happen BEFORE pair generation —
    * and (4) expansion of qualifying mask pairs back to document pairs,
    * which is output-sized (the irreducible cost: at sf0.1 the answer
    * itself is 8.9M pairs) — regime-switched on the MEASURED corpus size
    * (exchange-free broadcast under `smallCorpusMax` docs, chunked
    * per-mask id lists above it; see the split inside the impl).
    * Identical-set documents pair at J = 1 without any candidate
    * evaluation.
    */
  def bitsetJaccardPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", smallCorpusMax: Long = 1L << 20): DataFrame = {
    val vocab = spreadForCpu(docs)
      .select(explode(array_distinct(TextAnalysis.tokens(col(textCol)))).as("tok"))
      .distinct().limit(65).collect().map(_.getString(0))
    require(vocab.length <= 64, s"bitset path needs vocab <= 64, measured ${vocab.length}+")
    bitsetJaccardPairsImpl(docs, idCol, textCol, vocab.sorted, smallCorpusMax)
  }

  /** Per-document 64-bit token-set mask (id, mask, sz): one fold per
    * row via a constant-folded literal token→bit map, no shuffle.
    * Shared by the dense regime's candidate machinery and by
    * [[jaccardSelfJoin]]'s mask-count probe so both see ONE definition
    * of the mask. Empty token sets are excluded (J undefined vs ∅).
    */
  private def tokenMasks(docs: DataFrame, idCol: String, textCol: String,
      vocab: Array[String]): DataFrame = {
    // literal token→bit-value map: constant-folded, O(|vocab|) per-row
    val bitVal = map(vocab.zipWithIndex.flatMap {
      case (tk, i) => Seq(lit(tk), lit(1L << i)) }: _*)
    spreadForCpu(docs)
      .select(col(idCol).as("id"),
        array_distinct(TextAnalysis.tokens(col(textCol))).as("ts"))
      .where(size(col("ts")) > 0)
      .select(col("id"),
        aggregate(col("ts"), lit(0L), (acc, tk) => acc.bitwiseOR(element_at(bitVal, tk))).as("mask"))
      .withColumn("sz", expr("bit_count(mask)").cast(LongType))
  }

  private def bitsetJaccardPairsImpl(docs: DataFrame, idCol: String,
      textCol: String, vocab: Array[String],
      smallCorpusMax: Long, preMasks: Option[DataFrame] = None): DataFrame = {
    // BOUNDED probe picks the expansion regime (documented at the regime
    // split below): limit(max+1) never scans past the threshold — the
    // d32 vocabulary-probe discipline, not a full count of a corpus
    // that may be derived (ScaleSmoke's 20-way union) rather than a scan
    val probeCap = math.min(smallCorpusMax, Int.MaxValue - 1L).toInt
    val nDocs =
      if (smallCorpusMax <= 0L) 1L // forced scale regime: skip the probe
      else docs.limit(probeCap + 1).count()
    val masks = preMasks.getOrElse(tokenMasks(docs, idCol, textCol, vocab))
    val dm = masks.groupBy(col("mask")).agg(count(lit(1)).as("cnt"))
      .withColumn("sz", expr("bit_count(mask)").cast(LongType))
    // qualifying DISTINCT-mask pairs: broadcast nested-loop over the
    // collapsed masks with the integer gate inline — M² cheap codegen
    // predicate evaluations, zero shuffle
    val mp = dm.as("x").join(broadcast(dm.as("y")),
        col("x.mask") < col("y.mask") &&
          lit(3L) * expr("CAST(bit_count(x.mask & y.mask) AS BIGINT)") >=
            col("x.sz") + col("y.sz"))
      .select(col("x.mask").as("ma"), col("y.mask").as("mb"),
        expr("CAST(bit_count(x.mask & y.mask) AS BIGINT)").as("inter"),
        (col("x.sz") + col("y.sz")).as("szsum"))
    // expansion back to document pairs (output-sized). The per-DOCUMENT
    // doc→mask table is CORPUS-sized — the broadcast-size argument above
    // covers only `dm`, the distinct masks — so broadcasting it
    // unconditionally is the r13 finding (fine at 5k docs, driver OOM at
    // 100×). The regime is picked by the MEASURED corpus size, this
    // operator's own probe philosophy:
    //  - corpus ≤ `smallCorpusMax` (default 2²⁰ docs ⇒ ≤ 16 MB of
    //    (id, mask) rows): the doc→mask projections broadcast — the
    //    qualifying-pair stream is never shuffled and the whole
    //    expansion is exchange-free (measured 3× faster than any
    //    shuffle variant at sf0.1, where mp alone is 4.8M rows);
    //  - otherwise: the corpus collapses to CHUNKED per-mask id lists —
    //    chunk index assigned by a mask-keyed window BEFORE the collect,
    //    so no aggregation buffer ever exceeds `chunk` ids however hot a
    //    boilerplate mask gets — and pairs explode ROW-LOCALLY from
    //    joined chunk pairs: total shuffled bytes are O(corpus) for the
    //    window + the M·chunks-row joins, and the output leaves a
    //    Generate, never an Exchange. PlanAuditSpec forces this regime
    //    (smallCorpusMax = 0) and pins ≤ 1 broadcast (= dm); DedupSpec
    //    proves both regimes equal the all-pairs ground truth.
    val (cross, same) =
      if (nDocs <= smallCorpusMax) {
        val cross = mp
          .join(broadcast(masks.select(col("id").as("id_a"), col("mask").as("m_a"))),
            col("ma") === col("m_a"))
          .join(broadcast(masks.select(col("id").as("id_b"), col("mask").as("m_b"))),
            col("mb") === col("m_b"))
          .select(least(col("id_a"), col("id_b")).as("doc_a"),
            greatest(col("id_a"), col("id_b")).as("doc_b"),
            col("inter"), (col("szsum") - col("inter")).as("un"))
        val same = masks.as("p").join(broadcast(masks.as("q")),
            col("p.mask") === col("q.mask") && col("p.id") < col("q.id"))
          .select(col("p.id").as("doc_a"), col("q.id").as("doc_b"),
            col("p.sz").as("inter"), col("p.sz").as("un"))
        (cross, same)
      } else {
        val chunk = 4096
        val wm = org.apache.spark.sql.expressions.Window
          .partitionBy(col("mask")).orderBy(col("id"))
        val idsc = masks
          .withColumn("ci", ((row_number().over(wm) - 1) / chunk).cast("int"))
          .groupBy(col("mask"), col("ci"))
          .agg(sort_array(collect_list(col("id"))).as("idc"))
        val cross = mp.hint("shuffle_hash")
          .join(idsc.select(col("mask").as("ma"), col("idc").as("ia")), Seq("ma"))
          .join(idsc.select(col("mask").as("mb"), col("idc").as("ib"))
            .hint("shuffle_hash"), Seq("mb"))
          .select(explode(col("ia")).as("id_a"), col("ib"),
            col("inter"), col("szsum"))
          .select(col("id_a"), explode(col("ib")).as("id_b"),
            col("inter"), col("szsum"))
          .select(least(col("id_a"), col("id_b")).as("doc_a"),
            greatest(col("id_a"), col("id_b")).as("doc_b"),
            col("inter"), (col("szsum") - col("inter")).as("un"))
        // identical-set pairs (J = 1): chunk-pair self-join per mask;
        // ids are chunk-sorted, so ci < cj pairs arrive ordered and the
        // residual id_a < id_b filter only prunes within-chunk pairs
        val same = idsc.as("p")
          .join(idsc.as("q").hint("shuffle_hash"),
            col("p.mask") === col("q.mask") && col("p.ci") <= col("q.ci"))
          .select(col("p.mask").as("mask"), col("p.idc").as("ia"),
            col("q.idc").as("ib"))
          .withColumn("sz", expr("bit_count(mask)").cast(LongType))
          .select(explode(col("ia")).as("id_a"), col("ib"), col("sz"))
          .select(col("id_a"), explode(col("ib")).as("id_b"), col("sz"))
          .where(col("id_a") < col("id_b"))
          .select(col("id_a").as("doc_a"), col("id_b").as("doc_b"),
            col("sz").as("inter"), col("sz").as("un"))
        (cross, same)
      }
    cross.unionByName(same)
      .withColumn("jaccard",
        round(col("inter").cast(DoubleType) / col("un").cast(DoubleType), 9))
  }

  /** Sparse-vocabulary exact Jaccard ≥ ½ pairs: canonical PPJoin
    * (Xiao et al. 2011). Tokens are globally ordered by (df, token) —
    * rarest first — via a row-local `array_sort`, never a
    * vocabulary-wide rank window; each document indexes only its first
    * |x| − ⌈|x|/2⌉ + 1 tokens, and candidate generation applies BOTH
    * exactness-preserving filters inline in the join condition (so they
    * prune during the probe, before any candidate row materializes):
    *
    *  - length: J ≥ ½ requires |A| ≤ 2|B| and |B| ≤ 2|A|;
    *  - positional: the FIRST common token in the global order at
    *    1-based prefix positions (pa, pb) bounds the overlap by
    *    1 + min(|A|−pa, |B|−pb), which must reach ⌈(|A|+|B|)/3⌉.
    *
    * Both are necessary conditions on the first common token of every
    * true pair (which the prefix theorem guarantees sits in both
    * prefixes), so recall stays exactly 1.0 — proven against the
    * all-pairs ground truth in DedupSpec. Verification recomputes the
    * exact intersection only for surviving candidates. Round 12's
    * version had NEITHER filter and fanned out 112.6M candidates on a
    * vocabulary this join should never be pointed at — the regime
    * choice lives in [[jaccardSelfJoin]].
    */
  def ppjoinPairs(docs: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val tokset = spreadForCpu(docs)
      .select(col(idCol).as("id"), TextAnalysis.tokens(col(textCol)).as("ws"))
      .select(col("id"), explode(array_distinct(col("ws"))).as("tok"))
    val dfT = tokset.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val ordered = tokset.join(dfT, Seq("tok"))
      .groupBy(col("id"))
      .agg(array_sort(collect_list(struct(col("df"), col("tok")))).as("st"))
      .withColumn("plen", expr("CAST(size(st) - (size(st) + 1) DIV 2 + 1 AS INT)"))
    val prefix = ordered
      .select(col("id"), size(col("st")).cast(LongType).as("sz"),
        posexplode(slice(col("st"), lit(1), col("plen"))))
      .select(col("id"), col("sz"), (col("pos") + 1).cast(LongType).as("p"),
        col("col").getField("tok").as("tok"))
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.tok") === col("b.tok") && col("a.id") < col("b.id") &&
          lit(2L) * col("b.sz") >= col("a.sz") &&
          lit(2L) * col("a.sz") >= col("b.sz") &&
          lit(3L) * (lit(1L) + least(col("a.sz") - col("a.p"), col("b.sz") - col("b.p"))) >=
            col("a.sz") + col("b.sz"))
      .select(col("a.id").as("doc_a"), col("b.id").as("doc_b")).distinct()
    val sizes = ordered.select(col("id"), size(col("st")).cast(LongType).as("sz"))
    cand
      .join(tokset.as("ta"), col("doc_a") === col("ta.id"))
      .join(tokset.as("tb"),
        col("doc_b") === col("tb.id") && col("ta.tok") === col("tb.tok"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
      .join(sizes.as("sa"), col("doc_a") === col("sa.id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.id"))
      .where(lit(3L) * col("inter") >= col("sa.sz") + col("sb.sz"))
      .select(col("doc_a"), col("doc_b"), col("inter"),
        (col("sa.sz") + col("sb.sz") - col("inter")).as("un"),
        round(col("inter").cast(DoubleType) /
          (col("sa.sz") + col("sb.sz") - col("inter")).cast(DoubleType), 9)
          .as("jaccard"))
  }

  private[analytics] def clustersFromPairs(pairs: DataFrame, docs: DataFrame, idCol: String): DataFrame = {
    val cc = connectedComponents(pairs, docs.select(col(idCol)),
      idCol = idCol, srcCol = "a_id", dstCol = "b_id")
    cc.withColumn("cluster_size",
        count(lit(1)).over(org.apache.spark.sql.expressions.Window.partitionBy(col("cluster_id"))))
      .select(col("id").as(idCol), col("cluster_id"), col("cluster_size"),
        (col("id") === col("cluster_id")).as("is_survivor"))
  }
}
