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
  private val nullDimsPred = col("product_name").isNull || col("category").isNull
  private val negSessionPred =
    col("session_duration_sec") < 0 || col("session_revenue") < 0
  // exactly the reference's TEST 4 columns — it does NOT test the
  // overall conversion column (`04_data_quality_checks.py:95-101`)
  private val pctPred =
    col("view_to_cart_pct") > 100.0 ||
      col("cart_to_purchase_pct") > 100.0

  /** Check 1 (`:44-50`, "Gold Product Integrity"): no null
    * product_name/category in product_metrics — a silver clean/dim-join
    * failure surfaces here.
    */
  val nullProductDims: DqCheck = DqCheck("product_metrics_null_dims",
    df => df.filter(nullDimsPred), Some(nullDimsPred))

  /** Check 2 (`:61-67`): customer_id unique in customer_360 — a grouped
    * check, not a row predicate: it keeps its own (shuffling) query.
    */
  val uniqueCustomerId: DqCheck = DqCheck("customer_360_pk_unique",
    df => df.groupBy(col("customer_id")).agg(count(lit(1)).as("c")).filter(col("c") > 1))

  /** Check 3 (`:78-84`, "No Negative Business Metrics"): no negative
    * duration or revenue in session_metrics.
    */
  val nonNegativeSession: DqCheck = DqCheck("session_metrics_nonneg",
    df => df.filter(negSessionPred), Some(negSessionPred))

  /** Check 4 (`:95-101`): funnel percentages capped at 100. */
  val funnelPctCapped: DqCheck = DqCheck("product_funnel_pct_capped",
    df => df.filter(pctPred), Some(pctPred))

  /** Run the full reference gate over the gold tables; raise on failure
    * (`04_data_quality_checks.py:25-34`). The four checks are one
    * aggregate job each over four DISJOINT relations — they run
    * CONCURRENTLY (guide §2.6), so the gate costs the slowest check's
    * latency, not the sum of four sequential driver round-trips.
    */
  def runAll(gold: Map[String, DataFrame]): Seq[DqResult] = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    Await.result(Future.sequence(Seq(
      Future(run(gold("product_metrics"), Seq(nullProductDims))),
      Future(run(gold("customer_360"), Seq(uniqueCustomerId))),
      Future(run(gold("session_metrics"), Seq(nonNegativeSession))),
      Future(run(gold("product_funnel"), Seq(funnelPctCapped))))),
      Duration.Inf).flatten
  }

  def enforceAll(gold: Map[String, DataFrame]): Unit = {
    val failed = runAll(gold).filter(!_.passed)
    if (failed.nonEmpty)
      throw new IllegalStateException(
        "DQ gate failed — " + failed.map(r => s"${r.name}: ${r.badCount}").mkString("; "))
  }
}
