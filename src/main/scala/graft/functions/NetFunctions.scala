package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}

/** Scalar column functions mirroring the reference's two parsers plus its
  * python-truthiness idioms — pure `org.apache.spark.sql.functions` built-ins
  * (codegen'd, no UDFs), per SURVEY.md §2-F.
  */
object NetFunctions {

  /** 3GPP BitRate regex (reference receiver.py:66: `_BITRATE_RE`).
    * Anchored; `\s*` between number and unit; applied to the trimmed input
    * (the reference calls `.strip()` before matching).
    */
  val BitrateRegex = "^(\\d+\\.?\\d*)\\s*(bps|Kbps|Mbps|Gbps|Tbps)$"

  /** Unit → Mbps multiplier (reference receiver.py:67: `_BITRATE_MUL`). */
  private def unitFactor(unit: Column): Column = element_at(
    map(
      lit("bps"), lit(1e-6), lit("Kbps"), lit(1e-3), lit("Mbps"), lit(1.0),
      lit("Gbps"), lit(1e3), lit("Tbps"), lit(1e6)),
    unit)

  /** parse_bitrate_mbps (reference receiver.py:69–75): parse a 3GPP BitRate
    * string ("48.57 Mbps") to Mbps, rounded to 6 dp; null when the (trimmed)
    * input does not match — including a bare number with no unit ("100").
    * Callers str()-coerce numeric inputs first (receiver.py:113) — we cast.
    */
  def parseBitrateMbps(value: Column): Column = {
    val s = trim(value.cast(StringType))
    val num = regexp_extract(s, BitrateRegex, 1)
    val unit = regexp_extract(s, BitrateRegex, 2)
    when(unit === "" || num === "", lit(null).cast(DoubleType))
      .otherwise(round(num.cast(DoubleType) * unitFactor(unit), 6))
  }

  /** The ISO-8601 shapes BOTH engines' parsers accept: strict zero-padded
    * date, optional `T`/space time part with optional seconds + fraction,
    * optional `Z` or `±HH:MM` offset. Spark's `try_to_timestamp` is laxer
    * than the reference's `datetime.fromisoformat` (it trims whitespace and
    * accepts non-padded components like `2026-8-16` — both None in python;
    * caught by the tools/fuzz_normalizers.py differential gate), so inputs
    * outside this grammar null out BEFORE the parse. Known residual
    * deviations, all python-accepts-engine-drops and absent from 3GPP
    * DateTime: compact `YYYYMMDD`, non-`T`/space separators, `±HH:MM:SS`
    * offsets (fromisoformat 3.11 grammar extensions).
    */
  val IsoStrictRegex =
    "^\\d{4}-\\d{2}-\\d{2}([T ]\\d{2}:\\d{2}(:\\d{2}(\\.\\d+)?)?(Z|[+-]\\d{2}:\\d{2})?)?$"

  /** parse_datetime_to_unix (reference receiver.py:78–84): ISO-8601 string
    * (Z suffix or explicit offset) → unix seconds (long, truncated); null on
    * any parse failure. Spark's `try_to_timestamp` accepts `Z`/offsets
    * natively, so the reference's `Z → +00:00` rewrite is unnecessary;
    * [[IsoStrictRegex]] restores the reference parser's strictness.
    * Session TZ must be UTC so offset-less inputs resolve identically.
    */
  def parseDatetimeToUnix(value: Column): Column = {
    val s = value.cast(StringType)
    unix_timestamp(try_to_timestamp(when(s.rlike(IsoStrictRegex), s)))
      .cast(LongType)
  }

  /** Python truthiness for strings: `if info.get("x"):` treats null AND ""
    * as missing (reference receiver.py:92–98, 140–143, 170–175).
    * Returns the value or null.
    */
  def truthyStr(c: Column): Column =
    when(c.isNotNull && length(c) > 0, c)

  /** `timestamp or int(time.time())` — null OR zero falls back to `now`
    * (reference receiver.py:131, 158; a legit epoch-0 becomes now too).
    */
  def tsOrNow(ts: Column, now: Column): Column =
    when(ts.isNull || ts === 0L, now).otherwise(ts)
}
