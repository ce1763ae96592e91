package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Blocked fuzzy record linkage — the entity-resolution step of a
  * training-data pipeline (the same corpus crawled twice, vendor feeds
  * with typos, OCR'd registries) without the all-pairs product.
  *
  * The scale contract is MULTI-PASS BLOCKING (the record-linkage
  * literature's standard recall guarantee): each blocking key is an
  * equality join, and a candidate pair forms when ANY key matches. With
  * keys chosen as disjoint substrings of the name, a single-character
  * corruption falls in exactly one key, so the others still match — edit
  * distance ≤ 1 ⇒ guaranteed candidate, no similarity scan ever runs
  * corpus × corpus. Each per-key join is an ordinary shuffled equi-join,
  * the union dedups on the pair id — counts-not-pairs everywhere.
  *
  * EVERY key must carry entropy on its own: one low-entropy key is one
  * giant block, i.e. a hidden cross product (a contiguous high-digit key
  * over zero-padded ids measured 13× superlinear at ScaleSmoke 20×).
  * For position-aligned identifiers, INTERLEAVED position picks keep the
  * disjointness guarantee while spreading the high-entropy positions
  * across all keys — the d24 recipe.
  */
object EntityResolution {

  /** Match each dirty record to its best clean master record.
    *
    * `dirty` must carry (`d_id`, `d_name`); `clean` (`c_id`, `c_name`).
    * `blockKeys` maps a name column to one blocking key per pass.
    * Candidates (pairs agreeing on ≥ 1 key) are scored with
    * `levenshtein` and gated at `maxDist`; per dirty record the winner is
    * the (distance, c_id)-minimal candidate — deterministic under ties,
    * which REAL blocking produces (near-identical master rows). The
    * output also surfaces `n_cands`, the within-gate candidate count, the
    * ambiguity diagnostic an ER pipeline alerts on.
    *
    * Scale: |blockKeys| shuffled equi-joins + one distinct on (d_id,c_id)
    * + one d_id-partitioned window — the window's partition is a single
    * dirty record's candidate set, bounded by block sizes, never global.
    */
  def blockedFuzzyMatch(dirty: DataFrame, clean: DataFrame,
      blockKeys: Seq[Column => Column], maxDist: Int): DataFrame = {
    require(blockKeys.nonEmpty, "need at least one blocking key")
    // Disjoint passes instead of union + distinct (r17 optimization
    // round; guide §2.4): pass i admits a pair only when NO earlier key
    // also matches (a cheap null-safe predicate on the joined row — the
    // keys are already computed substring concats), so the union is the
    // exact candidate SET by construction and the distinct() — which
    // hash-deduplicated the full blocked fan-out of wide name rows
    // (measured: 1.94 M candidate rows at sf0.1, 2.5 s of the query's
    // 2.9 s) — is gone. Same candidate set: a pair matching keys {i, j}
    // (i < j) surfaced once from the distinct before and surfaces once
    // (from pass i) now; null keys match nothing in both shapes.
    // spread the probe side first: the blocked fan-out and the
    // Levenshtein DP below both run IN the probe-side scan stage (the
    // clean side broadcasts), and a byte-small dirty table arrives as
    // ONE split — the whole candidate pipeline was measured
    // single-threaded at sf0.1 (the Par.spreadForCpu contract: no-op
    // once the input has at least one split per core)
    val dirtySpread = Par.spreadForCpu(dirty)
    val cands = blockKeys.zipWithIndex.map { case (key, i) =>
      val noEarlier = blockKeys.take(i).map(k =>
        !coalesce(k(col("d_name")) === k(col("c_name")), lit(false)))
      val cond = ((key(col("d_name")) === key(col("c_name"))) +: noEarlier)
        .reduce(_ && _)
      dirtySpread.join(clean, cond)
        .select(col("d_id"), col("d_name"), col("c_id"), col("c_name"))
    }.reduce(_ unionByName _)
    // the THRESHOLD form early-exits the DP once a row exceeds maxDist
    // (O(maxDist·len) not O(len²) — the production win on long strings);
    // it returns -1 above the bound, which the gate folds away. Within
    // the gate the value equals plain levenshtein, so the SQL twin's
    // unbounded form stays bit-identical.
    val scored = cands
      .select(col("d_id"), col("c_id"),
        levenshtein(col("d_name"), col("c_name"), maxDist)
          .cast("bigint").as("dist"))
      .where(col("dist") >= 0 && col("dist") <= maxDist)
    val w = Window.partitionBy(col("d_id"))
    scored
      .withColumn("rn", row_number().over(w.orderBy(col("dist"), col("c_id"))))
      .withColumn("n_cands", count(lit(1)).over(w))
      .where(col("rn") === 1)
      .select(col("d_id"), col("c_id").as("matched_id"), col("dist"),
        col("n_cands"))
  }

  /** Edit-distance SELF-join: all pairs with Levenshtein ≤ `k` — the
    * string-metric sibling of the set-metric d32 (typo families, OCR
    * variants, fat-fingered identifiers; [[blockedFuzzyMatch]] finds
    * each record's best master, this finds EVERY close pair).
    *
    * Exact, via PREFIX-filtered q-grams (the Ed-Join recipe, Xiao et
    * al. VLDB 2008, on Gravano's count bound): one edit destroys at
    * most `q` gram instances, so ed(a,b) ≤ k ⇒ the gram MULTISETS
    * share ≥ max − k·q instances — and by the prefix-filter theorem
    * any such pair shares an element among each side's k·q+1 smallest
    * gram instances under a common total order. Gram instances are
    * (gram, occurrence#) pairs — set machinery on them IS multiset
    * machinery, the same clipped-counting idea as t26 — ordered by
    * (df, gram, occ), rarest first, via a row-local array_sort (never
    * a vocabulary-wide rank window). Candidates come ONLY from the
    * (k·q+1)-instance prefix index with the length filter
    * (||a|−|b|| ≤ k) inline, then verify straight with ONE
    * threshold-form `levenshtein` (O(k·len) and candidate-sized).
    * The first cut of this operator aggregated the FULL gram index
    * (Σ df² ≈ 69M rows at sf0.1) before its count filter — 87 s, the
    * d32 mistake re-made; the prefix index generates 15× fewer rows
    * and no pair-grain aggregation at all (measured 4.7M at sf0.1).
    *
    * Strings with |s| ≤ q−1+k·q are EXCLUDED (the gram bound goes
    * non-positive and can no longer guarantee a shared gram — below
    * that length the right tool is a length-banded all-pairs pass,
    * affordable by definition). The d32 discipline applies unchanged:
    * identical strings collapse BEFORE pair generation (d01's
    * groupBy), pairs form over DISTINCT strings only (at 100 TB key
    * them by md5(s) so shuffles carry 16-byte keys), duplicate
    * families re-expand at the end — candidate work is invariant
    * under exact-duplicate blowup, output is output-sized.
    * Output: (doc_a, doc_b, dist), doc_a < doc_b, dist ≤ k.
    */
  def editDistancePairs(strs: DataFrame, idCol: String, strCol: String,
      k: Int, q: Int): DataFrame = {
    require(k >= 0 && q >= 1, s"need k >= 0 and q >= 1, got k=$k q=$q")
    val minLenExcl = q - 1 + k * q
    val s0 = Par.spreadForCpu(strs)
      .select(col(idCol).as("id"), col(strCol).as("s"))
      .where(length(col("s")) > minLenExcl)
    val ds = s0.groupBy(col("s")).agg(count(lit(1)).as("cnt"))
      .withColumn("len", length(col("s")).cast("long"))
    // gram instances: (gram, occurrence#) per DISTINCT string
    val gi = ds.select(col("s"), col("len"),
        explode(expr(
          s"transform(sequence(0, length(s) - $q), i -> substring(s, i + 1, $q))"))
          .as("g"))
      .groupBy(col("s"), col("len"), col("g")).agg(count(lit(1)).as("c"))
      .select(col("s"), col("len"), col("g"),
        explode(expr("sequence(1, CAST(c AS INT))")).as("o"))
    val dfG = gi.groupBy(col("g")).agg(count(lit(1)).as("df"))
    // persisted: BOTH sides of the candidate self-join read this —
    // without the lineage cut the whole gram-instance pipeline
    // (explode → occurrence numbering → df join → per-string sort)
    // executes twice (the d04 cache-reuse discipline; session-owned,
    // dropped by clearCache())
    val prefix = gi.join(dfG, Seq("g"))
      .groupBy(col("s"), col("len"))
      .agg(array_sort(collect_list(struct(col("df"), col("g"), col("o")))).as("es"))
      .select(col("s"), col("len"),
        explode(slice(col("es"), 1, k * q + 1)).as("e"))
      .select(col("s"), col("len"), col("e.g").as("g"), col("e.o").as("o"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // verification runs IN the join projection — candidate rows stream
    // through the O(k·len) threshold DP and die before any exchange;
    // the distinct() then dedups only true pairs (verify-then-distinct:
    // measured 4.7M candidate rows → 237 pairs at sf0.1; the reverse
    // order shuffles 3.6M distinct string-pairs to verify them)
    val close = prefix.as("a").join(prefix.as("b"),
        col("a.g") === col("b.g") && col("a.o") === col("b.o") &&
          col("a.s") < col("b.s") &&
          abs(col("a.len") - col("b.len")) <= k)
      .select(col("a.s").as("sa"), col("b.s").as("sb"),
        levenshtein(col("a.s"), col("b.s"), k).cast("long").as("dist"))
      .where(col("dist") >= 0 && col("dist") <= k)
      .distinct()
    val cross = close
      .join(s0.select(col("id").as("ia"), col("s").as("sa")), Seq("sa"))
      .join(s0.select(col("id").as("ib"), col("s").as("sb")), Seq("sb"))
      .select(least(col("ia"), col("ib")).as("doc_a"),
        greatest(col("ia"), col("ib")).as("doc_b"), col("dist"))
    val same = s0.as("p").join(s0.as("r"),
        col("p.s") === col("r.s") && col("p.id") < col("r.id"))
      .select(col("p.id").as("doc_a"), col("r.id").as("doc_b"),
        lit(0L).as("dist"))
    cross.unionByName(same)
  }
}
