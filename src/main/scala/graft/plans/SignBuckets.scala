package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** All multi-table LSH sign-pattern bucket ids of an embedding vector in one
  * fused pass — `planes` is the flattened [table-major] hyperplane matrix,
  * `planesPerTable` bits per bucket.
  *
  * Bit-identical to the declarative form in [[graft.analytics.Similarity]]
  * (per-plane dot via `zip_with`+`aggregate`, strict left-to-right double
  * accumulation, `dot >= 0` sets bit `i` of table `t` — equivalence asserted
  * in SimilaritySpec): the declarative form evaluates
  * nTables × planesPerTable interpreted aggregates per row (HOFs are
  * CodegenFallback); this evaluates one kernel loop, codegen-friendly, with
  * the plane matrix attached as a referenced object.
  */
case class SignBuckets(child: Expression, planes: Array[Array[Double]],
    planesPerTable: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sign_buckets requires array<float|double> input, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_buckets"

  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(input: Any): Any =
    SignBuckets.buckets(input.asInstanceOf[ArrayData], planes, planesPerTable, isFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    defineCodeGen(ctx, ev, c =>
      s"graft.plans.SignBuckets.buckets($c, $planesRef, $planesPerTable, $isFloat)")
  }

  override protected def withNewChildInternal(newChild: Expression): SignBuckets =
    copy(child = newChild)
}

object SignBuckets {
  /** Shared kernel: one pass over the flattened plane matrix; per plane a
    * strict left-to-right dot (matching the declarative accumulation order
    * exactly — float → double per element), sign bit packed into the
    * plane's table slot.
    *
    * Declarative-parity null semantics: the zip_with/aggregate form
    * null-propagates the dot for a length-mismatched vector (zip_with pads
    * with null) or a null element, and `when(dot >= 0)` then leaves the
    * bit UNSET — so the kernel leaves bits unset in exactly those cases
    * instead of computing a partial dot.
    */
  def buckets(vec: ArrayData, planes: Array[Array[Double]],
      planesPerTable: Int, isFloat: Boolean): ArrayData = {
    val out = new Array[Long](planes.length / planesPerTable)
    val len = vec.numElements()
    var anyNull = false
    var j = 0
    while (j < len && !anyNull) { anyNull = vec.isNullAt(j); j += 1 }
    var pi = 0
    while (pi < planes.length) {
      val w = planes(pi)
      if (len == w.length && !anyNull) {
        var s = 0.0
        var i = 0
        while (i < len) {
          val x = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
          s += x * w(i)
          i += 1
        }
        if (s >= 0) out(pi / planesPerTable) |= (1L << (pi % planesPerTable))
      } // else: null dot → bit unset, matching when(null >= 0) = false
      pi += 1
    }
    new GenericArrayData(out)
  }
}
