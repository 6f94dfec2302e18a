package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native dot product over two float/double array columns, accumulated
  * in double in index order — the same left-fold evaluation order as the
  * composed `aggregate(zip_with(a, b, (x, y) -> double(x) * double(y)),
  * 0.0, +)` and as the DuckDB-oracle `list_reduce`, so scores stay
  * bit-identical across engines. The composed form walks interpreted
  * Catalyst lambdas and allocates an intermediate array per row; this is
  * one JIT'd loop over the unsafe array data inside whole-stage codegen —
  * the difference between an ANN scan bound on lambda dispatch vs bound
  * on memory bandwidth, which at 100 TB is the entire game for the
  * brute-force scoring path.
  *
  * Vectors of unequal length dot over the common prefix (never occurs
  * for fixed-dim embeddings; documented for totality).
  */
case class FloatVecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType

  // pure function of the children: lets ConstantFolding collapse literals
  override def foldable: Boolean = left.foldable && right.foldable

  private def elemOk(t: DataType) = t match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
    case _ => false
  }

  private def isFloat(t: DataType) = t match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"FloatVecDot requires array<float|double> children, got ${left.dataType} / ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    FloatVecDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left.dataType), isFloat(right.dataType))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.FloatVecDot.dot($a, $b, ${isFloat(left.dataType)}, ${isFloat(right.dataType)})")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}
