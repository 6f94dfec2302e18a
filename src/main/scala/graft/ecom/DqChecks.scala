package graft.ecom

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.DqOps.{DqCheck, DqResult, run}

/** The reference's four data-quality assertions (reference:
  * `/root/reference/04_data_quality/04_data_quality_checks.py:44-101`),
  * each a "find bad rows" DataFrame op.
  */
object DqChecks {

  // row-level predicates declared ONCE and shared between the query form
  // and the fused-aggregate form (DqOps.run fuses all predicate checks
  // over a table into one scan; the two forms must agree by construction)
  private val nullDimsPred = col("customer_id").isNull || col("email").isNull
  private val negRevenuePred = col("revenue") < 0
  private val pctPred =
    col("view_to_cart_pct") > 100.0 ||
      col("cart_to_purchase_pct") > 100.0 ||
      col("view_to_purchase_pct") > 100.0

  /** Check 1 (`:44-50`): no null dimension attributes in customer_360. */
  val nullCustomerDims: DqCheck = DqCheck("customer_360_null_dims",
    df => df.filter(nullDimsPred), Some(nullDimsPred))

  /** Check 2 (`:61-67`): customer_id unique in customer_360 — a grouped
    * check, not a row predicate: it keeps its own (shuffling) query.
    */
  val uniqueCustomerId: DqCheck = DqCheck("customer_360_pk_unique",
    df => df.groupBy(col("customer_id")).agg(count(lit(1)).as("c")).filter(col("c") > 1))

  /** Check 3 (`:78-84`): no negative revenue in product_metrics. */
  val nonNegativeRevenue: DqCheck = DqCheck("product_metrics_nonneg_revenue",
    df => df.filter(negRevenuePred), Some(negRevenuePred))

  /** Check 4 (`:95-101`): funnel percentages capped at 100. */
  val funnelPctCapped: DqCheck = DqCheck("product_funnel_pct_capped",
    df => df.filter(pctPred), Some(pctPred))

  /** Run the full reference gate over the gold tables; raise on failure
    * (`04_data_quality_checks.py:25-34`).
    */
  def runAll(gold: Map[String, DataFrame]): Seq[DqResult] =
    run(gold("customer_360"), Seq(nullCustomerDims, uniqueCustomerId)) ++
      run(gold("product_metrics"), Seq(nonNegativeRevenue)) ++
      run(gold("product_funnel"), Seq(funnelPctCapped))

  def enforceAll(gold: Map[String, DataFrame]): Unit = {
    val failed = runAll(gold).filter(!_.passed)
    if (failed.nonEmpty)
      throw new IllegalStateException(
        "DQ gate failed — " + failed.map(r => s"${r.name}: ${r.badCount}").mkString("; "))
  }
}
