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

  /** Word n-gram shingles (distinct), normalized. Documents shorter than n
    * words yield an empty shingle set.
    */
  def shingles(text: Column, n: Int): Column = {
    val ws = TextAnalysis.tokens(text)
    val grams = transform(sequence(lit(0), size(ws) - n),
      i => concat_ws(" ", (0 until n).map(j => element_at(ws, i + j + 1)): _*))
    array_distinct(when(size(ws) >= n, grams).otherwise(array().cast(ArrayType(StringType))))
  }

  /** Exact n-gram Jaccard near-dup pairs between a probe set and the corpus,
    * via an inverted shingle index: explode probe and corpus shingles, join
    * on the shingle, count intersections, then J = |∩| / (|A|+|B|-|∩|).
    * Only pairs sharing ≥1 shingle are ever materialized.
    */
  def ngramJaccardPairs(probes: DataFrame, corpus: DataFrame, n: Int,
      threshold: Double, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    def shingled(df: DataFrame, side: String): DataFrame =
      df.select(col(idCol).as(s"${side}_id"), shingles(col(textCol), n).as("sh"))
        .withColumn(s"${side}_size", size(col("sh")).cast(LongType))
    val a = shingled(probes, "a")
    val b = shingled(corpus, "b")
    val aEx = a.select(col("a_id"), col("a_size"), explode(col("sh")).as("shingle"))
    val bEx = b.select(col("b_id"), col("b_size"), explode(col("sh")).as("shingle"))
    aEx.join(bEx, Seq("shingle"))
      .where(col("a_id") =!= col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_size"), col("b_size"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard",
        col("inter").cast(DoubleType) /
          (col("a_size") + col("b_size") - col("inter")).cast(DoubleType))
      .where(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** MinHash signature from per-shingle base hashes: the classic
    * universal-hash family h_i(x) = a_i·x + b_i (mod 2^64) over a single
    * xxhash64 per shingle. One hash + k multiply-adds per shingle — k×
    * cheaper than k independent string hashes, same collision estimate.
    * Constants are seeded (deterministic plans). Empty set → Long.MaxValue.
    */
  def minhashFromHashes(hashes: Column, k: Int, seed: Long = 42L): Column = {
    val rnd = new scala.util.Random(seed)
    val as = typedLit(Seq.fill(k)(rnd.nextLong() | 1L)) // odd multipliers
    val bs = typedLit(Seq.fill(k)(rnd.nextLong()))
    transform(sequence(lit(0), lit(k - 1)), i =>
      coalesce(
        array_min(transform(hashes,
          h => h * element_at(as, i + 1) + element_at(bs, i + 1))),
        lit(Long.MaxValue)))
  }

  /** MinHash signature of a shingle-set column (convenience wrapper; the
    * two-step select in [[minhashCandidates]] evaluates the base hashes
    * once per row instead of once per signature position).
    */
  def minhashSignature(shingleSet: Column, k: Int): Column =
    minhashFromHashes(transform(shingleSet, s => xxhash64(s)), k)

  /** MinHash + banded LSH candidate pairs with estimated Jaccard.
    *
    * signature(k) → split into `bands` bands of k/bands rows → bucket key =
    * (band, xxhash64(band slice)) → explode → self-join per bucket on
    * NARROW (band, bucket, id) rows only → distinct candidate (a_id, b_id)
    * pairs → join the k-element signatures back (one row per pair, not per
    * band collision) → estimate J as the fraction of agreeing positions,
    * keep those ≥ threshold.
    *
    * Scale notes: a near-duplicate cluster of c docs collides in ~every
    * band, producing O(bands·c²) join rows — so the bucket self-join must
    * carry nothing but 16-byte pair keys, and the signature arrays are
    * attached only after `distinct()` collapses those to O(c²). (Carrying
    * the signatures through the self-join — the v1 shape — was a 95%-of-
    * runtime hotspot at sf0.1 and an OOM risk at scale.) All shuffles are
    * on compact keys; AQE handles residual bucket skew.
    */
  def minhashCandidates(docs: DataFrame, n: Int, k: Int, bands: Int,
      threshold: Double, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val rowsPerBand = k / bands
    val sigs = docs
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col("id"), transform(col("sh"), s => xxhash64(s)).as("hs"))
      .select(col("id"), minhashFromHashes(col("hs"), k).as("sig"))
    val buckets = sigs.select(
      col("id"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        xxhash64(lit("band"), b, concat_ws(",",
          slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)).cast(ArrayType(StringType))))))
        .as("bucket"))
    val candidates = buckets.select(col("bucket"), col("id").as("a_id"))
      .join(buckets.select(col("bucket"), col("id").as("b_id")), Seq("bucket"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    candidates
      .join(sigs.select(col("id").as("a_id"), col("sig").as("a_sig")), Seq("a_id"))
      .join(sigs.select(col("id").as("b_id"), col("sig").as("b_sig")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        (size(filter(zip_with(col("a_sig"), col("b_sig"), (x, y) => x === y), b => b))
          .cast(DoubleType) / k).as("est_jaccard"))
      .where(col("est_jaccard") >= threshold)
  }

  /** 64-bit SimHash over the token stream: per bit, sum +1/−1 votes across
    * token hashes (bit set → +1); output bit set when the vote is positive.
    * One pass per row: each token hash expands to its ±1 bit-vector once,
    * vectors are summed with `zip_with`, then folded back into a long.
    * (Bit positions are unrolled statically — `shiftright` takes a literal.)
    */
  def simhash(text: Column): Column = {
    val hashes = transform(TextAnalysis.tokens(text), t => xxhash64(t))
    val zeros = array_repeat(lit(0L), 64)
    def bitVotes(h: Column): Column = array(
      (0 until 64).map(i =>
        when(shiftright(h, i).bitwiseAND(lit(1L)) =!= 0, lit(1L)).otherwise(lit(-1L))): _*)
    val votes = aggregate(hashes, zeros, (acc, h) => zip_with(acc, bitVotes(h), _ + _))
    (0 until 64).map(i =>
      when(element_at(votes, i + 1) > 0, lit(1L << i)).otherwise(lit(0L)))
      .reduce((a, b) => a.bitwiseOR(b))
  }

  /** Hamming distance between two 64-bit simhashes. */
  def hammingDistance(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))
}
