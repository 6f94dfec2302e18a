package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression producing word n-gram shingles of the
  * lowercased text in one pass: "A b c d" with n=3 -> ["a b c","b c d"];
  * fewer than n tokens -> empty array.
  *
  * Semantically identical to the composed built-ins
  * `transform(sequence(1, size(t)-n+1), i -> concat_ws(" ", t[i..i+n-1]))`
  * with `t = split(lower(text), " ")` — and to the DuckDB twin
  * `list_transform(range(1, len(t)-n+2), i -> t[i] || ' ' || ...)` — but
  * the composed form re-evaluates the full split for every element_at in
  * the lambda (3 splits per shingle, interpreted), which measured ~3 ms
  * per 300-char doc at sf0.1. This runs one split + one slide per doc
  * inside whole-stage codegen.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // pure function of the child: lets ConstantFolding collapse literal inputs
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"WordShingles requires a string child, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.shingle(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.WordShingles.shingle($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object WordShingles {
  def shingle(s: UTF8String, n: Int): GenericArrayData = {
    // toLowerCase on UTF8String matches Spark's lower(); split with
    // limit -1 keeps trailing empty tokens exactly like split(c, " ").
    val toks = s.toLowerCase.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](toks.length - n + 1)
    var i = 0
    while (i < out.length) {
      val sb = new java.lang.StringBuilder(toks(i))
      var k = 1
      while (k < n) { sb.append(' ').append(toks(i + k)); k += 1 }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }
}
