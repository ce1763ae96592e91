package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference's signature scalar — 3GPP BitRate string → Mbps
  * (reference receiver.py:66–75) — as a fused native expression: ONE
  * compiled-regex match per row instead of the declarative form's two
  * `regexp_extract` passes plus map lookup
  * ([[graft.functions.NetFunctions.parseBitrateMbps]], which remains the
  * portable oracle-documented definition; equivalence is asserted in
  * NetFunctionsSpec over the golden and generative case tables).
  *
  * Exact-parity notes: same anchored regex on the trimmed input, value
  * parsed with Java `Double.parseDouble` (= Spark's string→double cast for
  * plain decimal literals), same unit factors, and the same rounding as
  * Spark's `round(_, 6)` — `BigDecimal.valueOf(d).setScale(6, HALF_UP)`.
  */
case class ParseBitrate(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"parse_bitrate_mbps requires string input, got ${other.catalogString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "parse_bitrate_mbps"

  override def nullSafeEval(input: Any): Any =
    ParseBitrate.parse(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val parsed = ctx.freshName("parsed")
    nullSafeCodeGen(ctx, ev, c => s"""
      |Object $parsed = graft.plans.ParseBitrate.parse($c);
      |if ($parsed == null) { ${ev.isNull} = true; } else { ${ev.value} = (Double) $parsed; }
      |""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): ParseBitrate =
    copy(child = newChild)
}

object ParseBitrate {
  // reference receiver.py:66 `_BITRATE_RE` — identical to NetFunctions.BitrateRegex
  private val Re = Pattern.compile("^(\\d+\\.?\\d*)\\s*(bps|Kbps|Mbps|Gbps|Tbps)$")

  private def factor(unit: String): Double = unit match {
    case "bps" => 1e-6
    case "Kbps" => 1e-3
    case "Mbps" => 1.0
    case "Gbps" => 1e3
    case "Tbps" => 1e6
  }

  /** Boxed Double so generated code can express the no-match → null path.
    * `UTF8String.trim()` (not Java String.trim): Spark's `trim` strips only
    * 0x20 spaces, Java's strips all chars ≤ 0x20 — a tab-prefixed input
    * must stay unparseable on both paths.
    */
  def parse(s: UTF8String): java.lang.Double = {
    val m = Re.matcher(s.trim.toString)
    // find(), not matches(): regexp_extract uses find(), where `$` forgives
    // ONE trailing line terminator ("48 Mbps\n" parses on the declarative
    // path) — matches() requires the full region and would diverge.
    if (!m.find()) return null
    val raw = java.lang.Double.parseDouble(m.group(1)) * factor(m.group(2))
    // Spark's Round(col, 6) passes NaN/Infinity through un-rounded (a 309+
    // digit numeric part parses to Infinity; BigDecimal.valueOf would throw)
    if (raw.isNaN || raw.isInfinite) return raw
    java.math.BigDecimal.valueOf(raw).setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
  }
}
