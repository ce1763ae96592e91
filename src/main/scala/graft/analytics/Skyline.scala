package graft.analytics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DoubleType

/** 2-D Pareto skyline (minimize x, maximize y) — the trade-off frontier
  * query (best quality at each length budget, cheapest offer at each
  * volume) that SQL expresses as an O(n²) NOT-EXISTS dominance test.
  *
  * The engine shape is the O(n log n) prefix-max identity: over DISTINCT
  * points ordered by (x asc, y desc), a point survives iff its y strictly
  * exceeds the running max of all predecessors — predecessors with equal
  * x carry strictly greater y (dominating), predecessors with smaller x
  * dominate at y ≥ current (strict in x already), and `y > prevMax`
  * refuses exactly those two cases and no others.
  *
  * The 100 TB shape avoids the single-partition global-order window: x is
  * cut into equi-width buckets from a 1-row bounds aggregate (the q52
  * histogram machinery — deterministic, data-derived), the prefix max
  * runs per bucket (partitioned window), and cross-bucket dominance
  * collapses to each bucket's scalar max carried forward (every point in
  * an earlier bucket has strictly smaller x, so only `max(y)` matters) —
  * a bucket-count-sized table joined back by broadcast. One distinct
  * shuffle + one bucket-keyed window; no global sort, no pair term.
  */
object Skyline {

  def skyline2D(df: DataFrame, xCol: String, yCol: String,
      nBuckets: Int = 32): DataFrame = {
    require(nBuckets >= 1, s"need at least one bucket, got $nBuckets")
    val pts = df.select(col(xCol).as("x"), col(yCol).as("y"))
      .where(col("x").isNotNull && col("y").isNotNull).distinct()
    val bounds = pts.agg(min(col("x")).cast(DoubleType).as("lo"),
      max(col("x")).cast(DoubleType).as("hi"))
    val w = (col("hi") - col("lo")) / nBuckets
    val bucketed = pts.crossJoin(broadcast(bounds))
      .select(col("x"), col("y"),
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(floor((col("x").cast(DoubleType) - col("lo")) / w),
            lit(nBuckets - 1L))).cast("long").as("bk"))
    val wLocal = Window.partitionBy(col("bk"))
      .orderBy(col("x").asc, col("y").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val bmax = bucketed.groupBy(col("bk")).agg(max(col("y")).as("bmax"))
    // cumulative max of STRICTLY earlier buckets — bucket-count-sized
    val prevB = bmax.as("a")
      .join(bmax.select(col("bk").as("pbk"), col("bmax").as("pmax")),
        col("pbk") < col("a.bk"), "left")
      .groupBy(col("a.bk").as("bk")).agg(max(col("pmax")).as("pm_prev"))
    bucketed
      .withColumn("pm_local", max(col("y")).over(wLocal))
      .join(broadcast(prevB), Seq("bk"))
      // greatest() skips NULLs; both NULL (first point overall) → survive
      .withColumn("pm", greatest(col("pm_local"), col("pm_prev")))
      .where(col("pm").isNull || col("y") > col("pm"))
      .select(col("x").as(xCol), col("y").as(yCol))
  }
}
