package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash of a token array as a native Catalyst expression.
  *
  * Semantically identical to the declarative construction in
  * [[graft.analytics.Dedup.simhashed]] (per-token xxhash64 with Spark's
  * default seed 42, ±1 bit votes, positive-vote bits set — equivalence is
  * asserted in DedupSpec), but evaluated in ONE fused per-row loop with
  * full whole-stage-codegen support. The higher-order-function form
  * allocates a 64-element vote array per TOKEN and runs interpreted
  * (HOFs are CodegenFallback); this runs at memory bandwidth — the
  * round-3 measurement was 5.8 s → sub-second for d05 at sf0.1.
  *
  * This is the engine's one custom-Expression showcase: built-ins express
  * every reference semantic (SURVEY §2-I), so Catalyst extension is
  * reserved for exactly this case — a hot per-row kernel the built-in
  * vocabulary can only express interpretively.
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string> input, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64.hashTokens(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash64.hashTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** One-pass SimHash kernel, shared by interpreted eval and generated
    * code. Null tokens are skipped (the tokenizer emits none).
    */
  def hashTokens(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s: UTF8String = arr.getUTF8String(i)
        // exactly Spark's xxhash64(string) with its default seed 42
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes(), 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) != 0L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
