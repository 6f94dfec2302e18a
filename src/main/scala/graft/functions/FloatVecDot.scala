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
  * Null semantics match the composed built-ins: a NULL element anywhere
  * in the common prefix makes the result NULL (zip_with produces a NULL
  * product, aggregate's `+` then poisons the fold). When both inputs are
  * `containsNull = false` the generated code skips the per-element null
  * checks entirely and stays a primitive loop.
  *
  * Vectors of unequal length dot over the common prefix (never occurs
  * for fixed-dim embeddings; the composed form instead null-pads to the
  * longer length and returns NULL — documented divergence).
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

  private def elemsNullable(t: DataType) = t match {
    case ArrayType(_, containsNull) => containsNull
    case _ => false
  }

  private def mayHaveNullElems: Boolean =
    elemsNullable(left.dataType) || elemsNullable(right.dataType)

  override def nullable: Boolean =
    left.nullable || right.nullable || mayHaveNullElems

  override def checkInputDataTypes(): TypeCheckResult =
    if (elemOk(left.dataType) && elemOk(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"FloatVecDot requires array<float|double> children, got ${left.dataType} / ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]
    val bd = b.asInstanceOf[ArrayData]
    if (mayHaveNullElems)
      FloatVecDot.dotOrNull(ad, bd, isFloat(left.dataType), isFloat(right.dataType))
    else
      FloatVecDot.dot(ad, bd, isFloat(left.dataType), isFloat(right.dataType))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (mayHaveNullElems) {
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val r = ctx.freshName("dotOrNull")
        s"""java.lang.Double $r = graft.functions.FloatVecDot.dotOrNull(
           |  $a, $b, ${isFloat(left.dataType)}, ${isFloat(right.dataType)});
           |if ($r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $r.doubleValue(); }""".stripMargin
      })
    } else {
      defineCodeGen(ctx, ev, (a, b) =>
        s"graft.functions.FloatVecDot.dot($a, $b, ${isFloat(left.dataType)}, ${isFloat(right.dataType)})")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FloatVecDot =
    copy(left = newLeft, right = newRight)
}

object FloatVecDot {
  /** Fast path: inputs proven element-non-null by the schema. */
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

  /** Null-propagating path: any NULL element in the common prefix →
    * NULL result (matches zip_with/aggregate composition). The boxed
    * return is immediately unboxed by the generated code; JIT escape
    * analysis removes the allocation on the non-null path.
    */
  def dotOrNull(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }
}
