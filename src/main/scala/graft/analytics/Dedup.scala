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

  /** MinHash signature: k independent min-hashes over the shingle set.
    * Hash family h_i(s) = xxhash64(i, s) — deterministic, seedable, and
    * computed per row with higher-order functions (no shuffle).
    */
  def minhashSignature(shingleSet: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)), i =>
      coalesce(
        array_min(transform(shingleSet, s => xxhash64(i, s))),
        lit(Long.MaxValue)))

  /** MinHash + banded LSH candidate pairs with estimated Jaccard.
    *
    * signature(k) → split into `bands` bands of k/bands rows → bucket key =
    * (band, xxhash64(band slice)) → explode → self-join per bucket →
    * distinct candidate pairs → estimate J as fraction of agreeing
    * signature positions, keep those ≥ threshold.
    *
    * The only shuffles are the bucket groupBy and the final distinct —
    * both on compact keys. Bucket skew (a hot shingle) is bounded because
    * buckets are over full band-slices, not single shingles.
    */
  def minhashCandidates(docs: DataFrame, n: Int, k: Int, bands: Int,
      threshold: Double, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k % bands == 0, s"k=$k must be divisible by bands=$bands")
    val rowsPerBand = k / bands
    val withSig = docs
      .select(col(idCol).as("id"), shingles(col(textCol), n).as("sh"))
      .where(size(col("sh")) > 0)
      .withColumn("sig", minhashSignature(col("sh"), k))
    val buckets = withSig.select(
      col("id"), col("sig"),
      explode(transform(sequence(lit(0), lit(bands - 1)), b =>
        struct(b.as("band"),
          xxhash64(concat_ws(",",
            slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand)).cast(ArrayType(StringType)))).as("bucket"))))
        .as("bb"))
      .select(col("id"), col("sig"), col("bb.band"), col("bb.bucket"))
    val l = buckets.select(col("band"), col("bucket"), col("id").as("a_id"), col("sig").as("a_sig"))
    val r = buckets.select(col("band"), col("bucket"), col("id").as("b_id"), col("sig").as("b_sig"))
    l.join(r, Seq("band", "bucket"))
      .where(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        (size(filter(zip_with(col("a_sig"), col("b_sig"), (x, y) => x === y), b => b))
          .cast(DoubleType) / k).as("est_jaccard"))
      .distinct()
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
