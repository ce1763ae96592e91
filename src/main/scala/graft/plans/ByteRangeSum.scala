package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Sum of unsigned byte values over a 1-based range of a binary column —
  * the tar-header checksum kernel (m15). Bit-identical to the declarative
  * form it replaces (`aggregate(sequence(0, n-1), 0L, (a, i) => a +
  * conv(hex(payload).substr(i*2+1, 2), 16, 10))` over a hex projection of
  * the range; equivalence asserted in AHashSpec): that fold is a
  * CodegenFallback higher-order function that re-walks its lambda tree —
  * including the embedded `hex(substr(payload, off, 512))` subtree — once
  * PER STEP, so a 512-byte checksum cost 512 hex projections of the same
  * header per entry (measured: m15_tar_walk at 50.8 s for a 5 000-row
  * map-only parse at sf0.1). This kernel is one tight loop over the raw
  * bytes, codegen'd, with an interpreted eval twin for the NO_CODEGEN
  * parity variant.
  *
  * Null semantics match the fold: NULL input → NULL; a range that is not
  * fully inside the payload → NULL (the fold's `conv('') → NULL` poisons
  * its running sum); len = 0 → 0 (the fold's seed).
  */
case class ByteRangeSum(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (first.dataType == BinaryType && second.dataType == LongType &&
        third.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"byte_range_sum requires (binary, bigint, bigint), got " +
        s"${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
        s"${third.dataType.catalogString}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "byte_range_sum"

  override def nullSafeEval(bin: Any, pos: Any, len: Any): Any =
    ByteRangeSum.sum(bin.asInstanceOf[Array[Byte]],
      pos.asInstanceOf[Long], len.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val s = ctx.freshName("brs")
    nullSafeCodeGen(ctx, ev, (bin, pos, len) => s"""
      |Object $s = graft.plans.ByteRangeSum.sum($bin, $pos, $len);
      |if ($s == null) { ${ev.isNull} = true; } else { ${ev.value} = (Long) $s; }
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ByteRangeSum =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object ByteRangeSum {
  /** Shared kernel; boxed Long so generated code can express the
    * out-of-range → null path.
    */
  def sum(bin: Array[Byte], pos: Long, len: Long): java.lang.Long = {
    if (len == 0L) return 0L
    if (len < 0L || pos < 1L || pos - 1L + len > bin.length) return null
    var s = 0L
    var i = (pos - 1L).toInt
    val end = i + len.toInt
    while (i < end) { s += (bin(i) & 0xff).toLong; i += 1 }
    s
  }
}
