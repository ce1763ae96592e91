package graft.analytics

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DoubleType

/** Distributed prefix (running) sums without a partition-wide-order
  * window — the primitive under ECDF/KS drift (q60) and the same
  * discipline as [[Skyline]]'s bucketed prefix max: a group-wide
  * `Window.orderBy` executes as ONE task per group, which is exactly the
  * `WindowExec: No Partition Defined` shape that superlinears at blowup
  * (the round-12 HITS lesson). Instead: equi-width buckets on the order
  * column from a 1-row bounds aggregate (deterministic, the q52
  * machinery), per-(group, bucket) windows for local running sums, and a
  * carried per-bucket offset — the offsets table is groups × nBuckets
  * rows, its own window partitions are ≤ nBuckets rows, and the join
  * back broadcasts.
  */
object Prefix {

  /** Adds `<v>_cum` (inclusive running sum over `orderCol` within each
    * `partCols` group) for every v in `valueCols`. Requires
    * (partCols, orderCol) to be UNIQUE per row — with ties "running sum
    * at a row" is not well-defined; aggregate to distinct order keys
    * first (exactly what an ECDF does).
    */
  def bucketedPrefixSums(df: DataFrame, partCols: Seq[String],
      orderCol: String, valueCols: Seq[String], nBuckets: Int = 32): DataFrame = {
    require(valueCols.nonEmpty, "need at least one value column")
    val bounds = df.agg(min(col(orderCol)).cast(DoubleType).as("lo"),
      max(col(orderCol)).cast(DoubleType).as("hi"))
    val w = (col("hi") - col("lo")) / nBuckets
    val bucketed = df.crossJoin(broadcast(bounds))
      .withColumn("__bk",
        when(col("hi") === col("lo"), lit(0L))
          .otherwise(least(floor((col(orderCol).cast(DoubleType) - col("lo")) / w),
            lit(nBuckets - 1L))).cast("long"))
      .drop("lo", "hi")
    val part = partCols.map(col)
    val wLocal = Window.partitionBy(part :+ col("__bk"): _*)
      .orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // per-(group, bucket) totals, then the strictly-earlier-bucket
    // offset via a SELF-JOIN on the (groups × nBuckets)-sized totals
    // table — not a per-group ordered window: a constant or low-
    // cardinality group column would collapse that window to a single
    // partition (the q62 constant-group case emitted `WindowExec: No
    // Partition Defined` warnings in bench), and the join is quadratic
    // only in nBuckets
    val totals = bucketed.groupBy(part :+ col("__bk"): _*)
      .agg(sum(col(valueCols.head)).as(s"${valueCols.head}__bt"),
        valueCols.tail.map(v => sum(col(v)).as(s"${v}__bt")): _*)
    val bSide = totals.select(
      partCols.map(p => col(p).as(s"${p}__b")) ++
        Seq(col("__bk").as("__bk_b")) ++
        valueCols.map(v => col(s"${v}__bt").as(s"${v}__btb")): _*)
    val joinCond = partCols
      .map(p => col(p) === col(s"${p}__b"))
      .foldLeft(col("__bk_b") < col("__bk"))(_ && _)
    val offsets = totals.join(bSide, joinCond, "left")
      .groupBy(part :+ col("__bk"): _*)
      .agg(coalesce(sum(col(s"${valueCols.head}__btb")), lit(0L))
          .as(s"${valueCols.head}__off"),
        valueCols.tail.map(v =>
          coalesce(sum(col(s"${v}__btb")), lit(0L)).as(s"${v}__off")): _*)
      .select(part ++ Seq(col("__bk")) ++ valueCols.map(v => col(s"${v}__off")): _*)
    val withLocal = valueCols.foldLeft(bucketed) { (acc, v) =>
      acc.withColumn(s"${v}__loc", sum(col(v)).over(wLocal))
    }
    val joined = withLocal.join(broadcast(offsets),
      partCols :+ "__bk", "inner")
    valueCols.foldLeft(joined) { (acc, v) =>
      acc.withColumn(s"${v}_cum", col(s"${v}__loc") + col(s"${v}__off"))
        .drop(s"${v}__loc", s"${v}__off")
    }.drop("__bk")
  }
}
