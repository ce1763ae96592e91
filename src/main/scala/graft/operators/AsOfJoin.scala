package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) left join: for each left row, the single most
  * recent right row with the same key and `rightTs <= leftTs` — the
  * canonical time-series lookup Spark's join vocabulary lacks.
  *
  * Implemented as UNION + ORDERED WINDOW, not a join: both sides are
  * tagged and unioned, sorted within each key by (ts, side) — right rows
  * before left rows at equal timestamps, so "at-or-before" includes exact
  * matches — and each left row picks up the running `last` non-null right
  * payload. ONE shuffle on the key, no range-join row blowup (a
  * conditional join `l.ts >= r.ts` explodes to O(|matches|) intermediate
  * rows before dedup; the window shape is O(|L|+|R|) always — the 100 TB
  * shape). Rows with no prior right match keep a null payload (left join
  * semantics).
  */
object AsOfJoin {

  /** `left` and `right` must share `keyCols` and `tsCol`; all non-key,
    * non-ts right columns come back prefixed with `rightPrefix`.
    *
    * Tie semantics: among multiple right rows with the SAME (key, ts) the
    * surviving payload is window-frame order, which is not deterministic —
    * pre-aggregate the right side to one row per (key, ts) when duplicates
    * are possible. Column names starting with `_asof_` are reserved.
    *
    * Null semantics match join/ASOF conventions: right rows with a null
    * key or null timestamp are dropped (they can match nothing — without
    * the filter a null-ts row would sort before all time and be "the
    * latest prior" for otherwise-unmatched left rows); left rows with a
    * null key or null ts simply get a null payload.
    */
  def leftAsOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, rightPrefix: String = "right_"): DataFrame = {
    // fail fast with a clear message — a violated precondition otherwise
    // surfaces as an opaque analysis error deep inside the union/window plan
    for ((side, cols) <- Seq("left" -> left.columns, "right" -> right.columns)) {
      val missing = (keyCols :+ tsCol).filterNot(cols.contains)
      require(missing.isEmpty,
        s"AsOfJoin.leftAsOf: $side frame is missing column(s) ${missing.mkString(", ")} " +
          s"(required keyCols=${keyCols.mkString(", ")} tsCol=$tsCol)")
      val reserved = cols.filter(_.startsWith("_asof_"))
      require(reserved.isEmpty,
        s"AsOfJoin.leftAsOf: $side frame contains reserved column(s) ${reserved.mkString(", ")} " +
          "(the '_asof_' prefix is reserved for internal tagging)")
    }
    val rightPayloadCols = right.columns.filterNot(c => keyCols.contains(c) || c == tsCol)
    val payload = struct(rightPayloadCols.map(col).toIndexedSeq: _*)
    val matchableRight = (keyCols :+ tsCol)
      .map(col(_).isNotNull).reduce(_ && _)
    val leftTagged = left.withColumn("_asof_payload",
        lit(null).cast(org.apache.spark.sql.types.StructType(
          right.select(rightPayloadCols.map(col).toIndexedSeq: _*).schema.fields)))
      .withColumn("_asof_side", lit(1))
    val rightTagged = right
      .where(matchableRight)
      .select((keyCols :+ tsCol).map(col) :+ payload.as("_asof_payload"): _*)
      .withColumn("_asof_side", lit(0))
    val unioned = leftTagged.unionByName(rightTagged, allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).asc, col("_asof_side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val matched = unioned
      .withColumn("_asof_match", last(col("_asof_payload"), ignoreNulls = true).over(w))
      .where(col("_asof_side") === 1)
    val leftCols = left.columns.map(col).toIndexedSeq
    val matchCols = rightPayloadCols.map(c =>
      col("_asof_match").getField(c).as(s"$rightPrefix$c")).toIndexedSeq
    matched.select(leftCols ++ matchCols: _*)
  }
}
