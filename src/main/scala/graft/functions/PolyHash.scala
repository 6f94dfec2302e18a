package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the polynomial rolling string hash
  * `fold acc -> (acc * mult + codepoint) % mod` used by the dedup /
  * fingerprinting operators (minhash shingle hash, simhash token hash,
  * document fingerprint).
  *
  * Semantically identical to the higher-order-function formulation
  * `aggregate(sequence(1, length(s)), 0L, (acc, i) -> (acc * mult +
  * ascii(substr(s, i, 1))) % mod)` — and to the DuckDB-oracle twin
  * `list_reduce(list_transform(range(1, len(s)+1), i ->
  * ascii(substr(s,i,1))), (a,b) -> (a * mult + b) % mod)` — but runs as
  * one JIT'd per-codepoint loop inside whole-stage codegen instead of
  * per-character interpreted Catalyst lambdas (which allocate a sequence
  * array plus a UTF8String per character; measured ~30x slower at sf0.1).
  */
case class PolyHash(child: Expression, mult: Long, mod: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  // pure function of the child: lets ConstantFolding collapse literal inputs
  override def foldable: Boolean = child.foldable
  override def checkInputDataTypes() =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"PolyHash requires a string child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String], mult, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.PolyHash.hash($c, ${mult}L, ${mod}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {
  /** Codepoint-wise hash loop (matches `ascii(substr(s, i, 1))`, which
    * yields the i-th character's code point — surrogate pairs advance by
    * two UTF-16 chars but hash as one codepoint).
    */
  def hash(s: UTF8String, mult: Long, mod: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * mult + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }
}
