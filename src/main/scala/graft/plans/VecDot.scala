package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Dot product of two float/double array columns as a native expression:
  * strict left-to-right double accumulation — bit-identical to the
  * declarative `aggregate(zip_with(a, b, _*_), 0.0, _+_)` form in
  * [[graft.analytics.Similarity.dot]] (equivalence asserted in
  * SimilaritySpec), which runs interpreted (HOFs are CodegenFallback) and
  * allocates a zipped array per pair. Null input arrays, mismatched
  * lengths, or null elements → null, matching zip_with + aggregate
  * null-propagation.
  */
case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def ok(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot requires array<float|double> inputs, got " +
        s"${left.dataType.catalogString}, ${right.dataType.catalogString}")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private lazy val leftFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val rightFloat =
    right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any =
    VecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dot = ctx.freshName("dot")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      |Object $dot = graft.plans.VecDot.dot($a, $b, $leftFloat, $rightFloat);
      |if ($dot == null) { ${ev.isNull} = true; } else { ${ev.value} = (Double) $dot; }
      |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDot {
  /** Shared kernel; boxed Double so generated code can express the
    * mismatched-length / null-element → null path.
    */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    // zip_with pads the shorter side with null → null product → null sum
    if (n != b.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      s += x * y
      i += 1
    }
    s
  }
}
