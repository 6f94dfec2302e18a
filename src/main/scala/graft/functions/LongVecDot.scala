package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native dot product over two `array<long>` columns, accumulated in
  * long — the integer-scoring kernel of the scalar-quantized ANN path
  * (LlmSimilarity qs04). Integer math is associative and exact, so the
  * result is bit-identical to any oracle regardless of evaluation order;
  * the point of a native expression here is purely throughput: one JIT'd
  * primitive loop per row instead of interpreted zip_with/aggregate
  * lambdas, on the operator that touches EVERY corpus vector.
  *
  * With int8-ranged inputs (|x| <= 127) the per-element product is
  * <= 16129 and a 64-bit accumulator is overflow-safe up to ~5.7e14
  * dimensions — no saturation logic needed at any realistic dim.
  *
  * Null semantics match the composed built-ins (see [[FloatVecDot]]):
  * a NULL element anywhere in the common prefix makes the result NULL;
  * `containsNull = false` inputs skip the checks and stay primitive.
  */
case class LongVecDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  // pure function of the children: lets ConstantFolding collapse literals
  override def foldable: Boolean = left.foldable && right.foldable

  private def elemOk(t: DataType) = t match {
    case ArrayType(LongType, _) => true
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
      s"LongVecDot requires array<bigint> children, got ${left.dataType} / ${right.dataType}")

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val ad = a.asInstanceOf[ArrayData]
    val bd = b.asInstanceOf[ArrayData]
    if (mayHaveNullElems) LongVecDot.dotOrNull(ad, bd)
    else LongVecDot.dot(ad, bd)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    if (mayHaveNullElems) {
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val r = ctx.freshName("dotOrNull")
        s"""java.lang.Long $r = graft.functions.LongVecDot.dotOrNull($a, $b);
           |if ($r == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $r.longValue(); }""".stripMargin
      })
    } else {
      defineCodeGen(ctx, ev, (a, b) => s"graft.functions.LongVecDot.dot($a, $b)")
    }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongVecDot =
    copy(left = newLeft, right = newRight)
}

object LongVecDot {
  /** Fast path: inputs proven element-non-null by the schema. */
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    acc
  }

  /** Null-propagating path: any NULL element in the common prefix →
    * NULL result (matches zip_with/aggregate composition).
    */
  def dotOrNull(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
