package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import scala.util.Random

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`).
  *
  * Two paths:
  *  - brute-force cosine top-k (the exactness baseline): broadcast the probe
  *    set against the corpus — a map-side loop with a final per-probe top-k,
  *    no corpus shuffle. Right answer at any corpus size as long as the
  *    probe set is broadcastable.
  *  - LSH (random hyperplanes): bucket the corpus once by sign-pattern,
  *    probe only matching buckets — the 100 TB path; recall tunable via
  *    number of tables/planes.
  */
object Similarity {

  /** Cosine similarity between two float-array columns, computed in double
    * precision with a strict left-to-right accumulation (portable across
    * engines for oracle checks). Null/zero-norm → null.
    */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(transform(a, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v))
    val nb = sqrt(aggregate(transform(b, x => x.cast(DoubleType) * x.cast(DoubleType)),
      lit(0.0), (acc, v) => acc + v))
    when(na > 0 && nb > 0, dot / (na * nb))
  }

  /** Exact cosine top-k: for each probe row, the k nearest corpus rows
    * (self-match excluded). The probe side is broadcast, so the corpus is
    * scanned once with no shuffle; the per-probe top-k is a
    * TakeOrderedAndProject-style window with deterministic (sim desc, id)
    * tie-breaking.
    */
  def bruteForceTopK(corpus: DataFrame, probes: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val p = broadcast(probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"))
    val scored = c.join(p, col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        cosine(col("probe_vec"), col("vec")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Deterministic random hyperplanes (seeded) as literal columns. */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new Random(seed)
    Seq.fill(nPlanes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  private def signBits(vec: Column, planes: Seq[Array[Double]]): Column =
    planes.zipWithIndex.map { case (p, i) =>
      val dot = aggregate(
        zip_with(vec, typedLit(p.toSeq), (x, w) => x.cast(DoubleType) * w),
        lit(0.0), (acc, v) => acc + v)
      when(dot >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /** LSH-bucketed approximate top-k: corpus rows and probes are bucketed by
    * the sign pattern of `nPlanes` random-hyperplane projections; candidates
    * come only from the probe's bucket (equi-join → hash join, no cross
    * product), then exact cosine ranks within candidates. At 100 TB the
    * bucketed corpus would be written bucketBy(bucket) so repeated probe
    * batches never reshuffle it.
    */
  def lshTopK(corpus: DataFrame, probes: DataFrame, k: Int, nPlanes: Int,
      dim: Int, seed: Long = 42L,
      idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val planes = hyperplanes(nPlanes, dim, seed)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("vec"),
      signBits(col(vecCol), planes).as("bucket"))
    val p = broadcast(probes.select(col(idCol).as("probe_id"), col(vecCol).as("probe_vec"),
      signBits(col(vecCol), planes).as("bucket")))
    val scored = c.join(p, Seq("bucket"))
      .where(col("probe_id") =!= col("neighbor_id"))
      .select(col("probe_id"), col("neighbor_id"),
        cosine(col("probe_vec"), col("vec")).as("sim"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("probe_id"))
      .orderBy(col("sim").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("bigint"))
      .where(col("rank") <= k)
      .select(col("probe_id"), col("rank"), col("neighbor_id"), col("sim"))
  }

  /** Embedding-cosine near-duplicate pairs above a threshold, probe set vs
    * corpus (broadcast probe side — the exact-verification step after any
    * candidate generation). The similarity is rounded to `roundDp` decimals
    * BEFORE thresholding (and returned rounded), so the boundary decision is
    * identical across engines — filtering the unrounded value while an
    * oracle compares the rounded one is a data-dependent flake for true sims
    * in [threshold − 5e-(roundDp+1), threshold).
    */
  def cosineNearDupPairs(corpus: DataFrame, probes: DataFrame, threshold: Double,
      idCol: String = "vec_id", vecCol: String = "embedding", roundDp: Int = 6): DataFrame = {
    val p = broadcast(probes.select(col(idCol).as("a_id"), col(vecCol).as("a_vec")))
    val c = corpus.select(col(idCol).as("b_id"), col(vecCol).as("b_vec"))
    c.join(p, col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(cosine(col("a_vec"), col("b_vec")), roundDp).as("sim"))
      .where(col("sim") >= threshold)
  }
}
