package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Event-time dtype dispatch for the driver's `events.ts` column.
  *
  * The testdata generator has shipped `ts` under two physical parquet
  * encodings across rounds:
  *   - INT64 TIMESTAMP(NANOS) — read as LongType nanoseconds under
  *     `spark.sql.legacy.parquet.nanosAsLong=true` (rounds ≤ 9);
  *   - timestamp[us] (no UTC adjustment) — read as TIMESTAMP_NTZ
  *     (round 10 regeneration onward).
  *
  * Every consumer goes through these helpers so a future dtype shift is a
  * one-file change. All outputs are wall-clock-UTC semantics, matching
  * both the DuckDB oracle (`epoch_ns(ts)`) and the session timezone
  * pinned to UTC in [[GraftSession]].
  */
object EventTime {

  /** Event time floored to the second, as TimestampType — the shaping used
    * by the session/sliding window queries and the streaming twin.
    *
    * Long path: `ts - pmod(ts, 1e9)` is the FLOOR multiple (bare `div`
    * truncates toward zero, shifting pre-1970 values a bucket). Timestamp
    * path: `date_trunc` floors natively; the NTZ→LTZ cast is a wall-clock
    * reinterpretation — the identity under the UTC session timezone.
    */
  def secondsFloor(df: DataFrame, field: String = "ts"): Column =
    df.schema(field).dataType match {
      case LongType =>
        timestamp_seconds(
          expr(s"($field - pmod($field, 1000000000)) div 1000000000"))
      case _ =>
        date_trunc("second", col(field)).cast(TimestampType)
    }

  /** Exact epoch microseconds of the event time (q46's interval bounds —
    * full precision, no bucketing; the oracle's `epoch_us`). Long path:
    * floor-divide nanos by 1000 via the pmod guard (bare `div` truncates
    * toward zero, shifting pre-1970 values).
    */
  def epochMicros(df: DataFrame, field: String = "ts"): Column =
    df.schema(field).dataType match {
      case LongType =>
        expr(s"($field - pmod($field, 1000)) div 1000")
      case _ =>
        unix_micros(col(field).cast(TimestampType))
    }

  /** Epoch seconds of the event's hour bucket (q18's grouping key). */
  def hourEpoch(df: DataFrame, field: String = "ts"): Column =
    df.schema(field).dataType match {
      case LongType =>
        expr(s"($field - pmod($field, 3600000000000)) div 3600000000000") * 3600L
      case _ =>
        unix_timestamp(date_trunc("hour", col(field)).cast(TimestampType))
    }
}
