package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{DoubleType, StringType}

/** Catalyst-level builders for the curation composites (quality score,
  * PII redaction, content hash). These are the SINGLE definitions behind
  * both surfaces: the Column API (TextFns wraps them through the shim)
  * and the SQL registry (GraftExtensions injects them directly — a
  * Column built from `functions._` can't cross the SQL analyzer, so the
  * shared definition has to live at the Expression level). Every node
  * here is a stock codegen'd Catalyst expression; no UDFs, no
  * interpreted fallbacks beyond what the Column form already used.
  */
object CurationExprs {

  /** PII patterns: character classes only ([.]/[+], no backslash
    * escapes) so the same literal parses identically in Java regex,
    * RE2 (DuckDB), and Scala string interpolation.
    */
  val EmailRe = "[a-z0-9]+@[a-z0-9]+[.][a-z]+"
  val PhoneRe = "[+]1-555-[0-9]{4}"
  val IpRe = "10[.][0-9]{1,3}[.][0-9]{1,3}[.][0-9]{1,3}"

  private def str(s: String): Expression = Literal(s)
  private def dbl(d: Double): Expression = Literal(d)

  /** Whitespace tokens of the lowercased text (TextFns.tokens' tree). */
  private def tokensOf(text: Expression): Expression =
    StringSplit(Lower(text), str(" "), Literal(-1))

  /** The weighted doc-quality score over a string expression. */
  def qualityScore(text: Expression): Expression = {
    val t = tokensOf(text)
    def sizeOf(e: Expression): Expression = Cast(Size(e), DoubleType)
    val nTok = sizeOf(t)
    // size(filter(t, x -> x IN stopQuality)) — the vocabHits tree, with
    // the lambda variable pre-bound (the SQL path never re-binds it)
    val x = NamedLambdaVariable("x", StringType, nullable = true)
    val hits = ArrayFilter(t, LambdaFunction(In(x, TextFns.stopQuality.map(str)), Seq(x)))
    Add(
      Add(
        Multiply(Divide(sizeOf(ArrayDistinct(t)), nTok), dbl(0.5)),
        Multiply(Divide(sizeOf(hits), nTok), dbl(0.3))),
      Multiply(Least(Seq(dbl(1.0), Divide(nTok, dbl(200.0)))), dbl(0.2)))
  }

  /** Global PII redaction over a string expression. */
  def redactPii(c: Expression): Expression =
    Seq(EmailRe -> "<EMAIL>", PhoneRe -> "<PHONE>", IpRe -> "<IP>")
      .foldLeft(c) { case (e, (re, token)) => RegExpReplace(e, str(re), str(token)) }

  /** Normalized content hash over a string expression. */
  def contentHash(c: Expression): Expression = Md5(Cast(Lower(c), org.apache.spark.sql.types.BinaryType))
}
