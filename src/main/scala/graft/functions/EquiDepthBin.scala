package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType}

/** Native Catalyst expression for equi-depth binning: the rank bucket of
  * a value against a sorted, distinct boundary array — `#{b : v >= b}`,
  * found by binary search.
  *
  * Semantically identical (for non-NaN inputs) to the higher-order
  * formulation `aggregate(lit(bounds), 0, (acc, b) -> acc + when(v >= b,
  * 1).otherwise(0))`, but that fold runs as interpreted Catalyst lambdas
  * — measured ~12 s per pass over sf0.1 lineitem for 2 columns × 255
  * boundaries, and `repartitionByRange` evaluates its key expression
  * TWICE (sampling pass + shuffle), which made Z-order clustering
  * fold-bound instead of IO-bound. This is one JIT'd
  * `Arrays.binarySearch` (8 compares against 255 boundaries) inside
  * whole-stage codegen.
  *
  * NaN divergence from the fold, documented: `NaN >= b` is false in the
  * fold (bin 0) while binarySearch uses doubles' total order (top bin).
  * Layout-only consumers (ZOrder) don't care where NaNs cluster, only
  * that they cluster; nothing oracle-facing evaluates this expression.
  */
case class EquiDepthBin(child: Expression, boundaries: Array[Double])
    extends UnaryExpression {

  // the Array field defaults to REFERENCE equality, which would defeat
  // Catalyst canonicalization/semanticEquals for value-equal instances
  // (CSE and exchange reuse silently miss); compare contents
  override def equals(o: Any): Boolean = o match {
    case e: EquiDepthBin =>
      child == e.child && java.util.Arrays.equals(boundaries, e.boundaries)
    case _ => false
  }
  override def hashCode(): Int =
    31 * child.hashCode + java.util.Arrays.hashCode(boundaries)

  override def dataType: DataType = IntegerType
  // pure function of the child: lets ConstantFolding collapse literal inputs
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"EquiDepthBin requires a double child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    EquiDepthBin.bin(input.asInstanceOf[Double], boundaries)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val arr = ctx.addReferenceObj("equiDepthBounds", boundaries, "double[]")
    defineCodeGen(ctx, ev, c => s"graft.functions.EquiDepthBin.bin($c, $arr)")
  }

  override protected def withNewChildInternal(newChild: Expression): EquiDepthBin =
    copy(child = newChild)
}

object EquiDepthBin {
  /** `#{b in bounds : v >= b}` for sorted DISTINCT bounds: an exact hit
    * at index i means i+1 boundaries are <= v; a miss's insertion point
    * IS the count of boundaries < v (== <= v, since v matches none).
    */
  def bin(v: Double, bounds: Array[Double]): Int = {
    val idx = java.util.Arrays.binarySearch(bounds, v)
    if (idx >= 0) idx + 1 else -idx - 1
  }
}
