package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Distribution-drift detection between two dataset snapshots — the
  * monitoring gate a continuously-ingesting training pipeline runs per
  * feature (did this week's crawl shift against last week's?).
  *
  * Two-sample Kolmogorov–Smirnov per group: D = max over observed values
  * of |ECDF₁ − ECDF₂|, with the asymptotic α=0.05 rejection threshold
  * `1.358·√((n₁+n₂)/(n₁·n₂))` surfaced as a boolean. Everything is exact
  * integer counts and single double divisions of them — no rounding
  * needed anywhere, both engines compute bit-identical doubles.
  *
  * Scale: one shuffle to per-(group, value) counts (this also makes the
  * ECDF's order key unique — [[Prefix]]'s precondition), bucketed prefix
  * sums (NO group-wide-order window), one broadcastable per-group total,
  * and two small argmax shuffles. No pair term, no global sort.
  */
object Drift {

  /** `sideCol` must be 1 (baseline) or 2 (candidate); groups missing a
    * side entirely are dropped (no ECDF to compare). `d_at` is the
    * smallest value attaining D — deterministic under ties.
    */
  def ksDrift(df: DataFrame, groupCol: String, valueCol: String,
      sideCol: String, nBuckets: Int = 32): DataFrame = {
    val counts = df.groupBy(col(groupCol), col(valueCol).as("v"))
      .agg(sum(when(col(sideCol) === 1, 1L).otherwise(0L)).as("c1"),
        sum(when(col(sideCol) === 2, 1L).otherwise(0L)).as("c2"))
    val cums = Prefix.bucketedPrefixSums(counts, Seq(groupCol), "v",
      Seq("c1", "c2"), nBuckets)
    val totals = counts.groupBy(col(groupCol))
      .agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    val diffs = cums.join(totals, Seq(groupCol))
      .where(col("n1") > 0 && col("n2") > 0)
      .withColumn("diff",
        abs(col("c1_cum").cast(DoubleType) / col("n1") -
          col("c2_cum").cast(DoubleType) / col("n2")))
    val mx = diffs.groupBy(col(groupCol), col("n1"), col("n2"))
      .agg(max(col("diff")).as("ks_d"))
    diffs.select(col(groupCol), col("v"), col("diff"))
      .join(mx, Seq(groupCol))
      .where(col("diff") === col("ks_d"))
      .groupBy(col(groupCol), col("n1"), col("n2"), col("ks_d"))
      .agg(min(col("v")).as("d_at"))
      .withColumn("is_drift", col("ks_d") > lit(1.358) *
        sqrt((col("n1").cast(DoubleType) + col("n2").cast(DoubleType)) /
          (col("n1").cast(DoubleType) * col("n2").cast(DoubleType))))
      .select(col(groupCol), col("n1"), col("n2"), col("ks_d"),
        col("d_at"), col("is_drift"))
  }
}
