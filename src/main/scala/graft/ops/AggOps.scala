package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Ratio / safe-math operators (reference: gold-layer semantics,
  * `/root/reference/03_gold/03_gold_aggregate.py:137-152,256-263`).
  */
object AggOps {

  /** NULL-when-zero-denominator division (reference AOV semantics:
    * `03_gold/03_gold_aggregate.py:259-262` — AOV is NULL, not 0, when a
    * customer has no orders).
    */
  def safeDiv(num: Column, den: Column): Column =
    when(den =!= 0, num / den).otherwise(lit(null).cast(DoubleType))

  /** Percentage capped at 100.0 and NULL on zero denominator (reference
    * funnel-conversion semantics: `03_gold/03_gold_aggregate.py:137-152`,
    * `README.md:50-55` — "quick add" carts can exceed views, so the pct is
    * capped with least()).
    */
  def cappedPct(num: Column, den: Column): Column =
    when(den > 0, least(lit(100.0), num * lit(100.0) / den))
      .otherwise(lit(null).cast(DoubleType))
}
