package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Order-sensitive rolling polynomial fingerprint of a token array —
  * acc·1000003 + xxhash64(token) per element, wrapping 64-bit arithmetic —
  * fused into one codegen'd loop. Bit-identical to the declarative
  * `aggregate(toks, 0L, (acc, t) => acc * 1000003 + xxhash64(t))` in
  * [[graft.analytics.TextAnalysis.rollingHashFromTokens]] (equivalence
  * asserted in TextAnalysisSpec), including Spark's null-token hash
  * convention (xxhash64 of a null input leaves the seed, 42).
  */
case class RollingHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"rolling_hash64 requires array<string> input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override protected def nullSafeEval(input: Any): Any =
    RollingHash64.hash(input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RollingHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression): RollingHash64 =
    copy(child = newChild)
}

object RollingHash64 {
  def hash(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    var h = 0L
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val tok =
        if (arr.isNullAt(i)) 42L // xxhash64(null) = seed, matching the builtin
        else {
          val s: UTF8String = arr.getUTF8String(i)
          XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        }
      h = h * 1000003L + tok
      i += 1
    }
    h
  }
}
