package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst SimHash over an array of token hashes: bit `b` of
  * the result is 1 iff the signed majority vote `Σ ((h >> b) % 2) * 2 - 1`
  * over the tokens is positive — for the non-negative hashes the
  * operators feed it, exactly "a strict majority of tokens have bit b
  * set".
  *
  * Exact semantic twin of the unrolled higher-order-function fold it
  * replaces (`(0 until bits).map(b => aggregate(hashes, 0L, (acc, h) =>
  * acc + (shiftright(h, b) % 2) * 2 - 1))...`), INCLUDING the edge
  * semantics oracle parity depends on: a NULL input array or any NULL
  * element yields 0L (the fold's null propagation collapsed every
  * per-bit term to its otherwise-0 branch), the empty array yields 0L,
  * and negative hashes vote with Java arithmetic-shift/remainder
  * semantics. The fold ran as `bits` separate interpreted
  * ArrayAggregate walks per row (CodegenFallback — the repo's
  * measured interpreted-HOF tax); this is ONE codegen'd pass over the
  * array.
  */
case class SimHash(child: Expression, bits: Int) extends UnaryExpression {
  require(bits >= 1 && bits <= 62, s"SimHash bits must be in [1, 62]: $bits")

  override def dataType: DataType = LongType
  // never null by construction: degenerate inputs collapse to 0L
  override def nullable: Boolean = false
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes() = child.dataType match {
    case ArrayType(LongType, _) =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case t =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"SimHash requires array<bigint>, got ${t.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L else SimHash.compute(v.asInstanceOf[ArrayData], bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(
      code = code"""
        ${c.code}
        long ${ev.value} = ${c.isNull} ? 0L :
          graft.functions.SimHash.compute(${c.value}, $bits);
      """,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

object SimHash {
  /** One pass over the array accumulating all `bits` signed votes. */
  def compute(arr: ArrayData, bits: Int): Long = {
    val n = arr.numElements()
    val votes = new Array[Long](bits)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return 0L // fold semantics: null poisons every bit
      val h = arr.getLong(i)
      var b = 0
      while (b < bits) {
        votes(b) += ((h >> b) % 2L) * 2L - 1L
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < bits) {
      if (votes(b) > 0L) out |= 1L << b
      b += 1
    }
    out
  }
}
