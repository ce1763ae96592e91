package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-evaluation metrics over scored datasets — the measurement side
  * of the curation pipeline (a quality score is only worth its gate if
  * its ranking power is measured, not assumed).
  */
object Eval {

  /** Exact tie-aware ROC AUC via the Mann–Whitney U identity:
    * AUC = [Σ over distinct scores s of pos(s)·(negBelow(s) + neg(s)/2)]
    *         / (nPos·nNeg),
    * computed as INTEGERS by doubling — u2 = Σ pos(s)·(2·negBelow(s) +
    * neg(s)) — so ties contribute exact midranks and the only float op
    * is the final single division (cross-engine bit-identical). Returns
    * one row: (n_pos, n_neg, u2, auc).
    *
    * Scale: one shuffle to per-score (pos, neg) counts, then
    * [[Prefix.bucketedPrefixSums]] over the score order (bucketed — no
    * global-order window), one 1-row aggregation. The per-score count
    * table is cardinality-of-score sized, not row sized.
    */
  def aucROC(df: DataFrame, scoreCol: String, labelCol: String): DataFrame = {
    val counts = df
      .groupBy(col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("pos"),
        sum(when(col(labelCol), 0L).otherwise(1L)).as("neg"))
      .withColumn("g", lit(0)) // single logical group for the prefix pass
    val cums = Prefix.bucketedPrefixSums(counts, Seq("g"), "s", Seq("neg"))
    cums
      .select(col("pos"), col("neg"),
        (col("neg_cum") - col("neg")).as("neg_below"))
      .agg(sum(col("pos")).as("n_pos"), sum(col("neg")).as("n_neg"),
        sum(col("pos") * (lit(2L) * col("neg_below") + col("neg"))).as("u2"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        (col("u2").cast("double") /
          (lit(2L) * col("n_pos") * col("n_neg")).cast("double")).as("auc"))
  }
}
