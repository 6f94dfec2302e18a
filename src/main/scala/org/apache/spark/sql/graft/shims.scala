package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression conversions so
  * graft's custom Catalyst expressions (e.g. the codegen'd PolyHash) can
  * be exposed as ordinary `Column`s. Lives under org.apache.spark.sql
  * solely for access; contains no Spark-internal logic of its own.
  */
object shims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
