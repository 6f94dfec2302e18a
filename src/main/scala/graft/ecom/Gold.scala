package graft.ecom

import java.time.LocalDate

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.AggOps.{cappedPct, safeDiv}
import graft.util.Exact.{countIf, dsumIf}

/** Gold layer: the four aggregate models (reference:
  * `/root/reference/03_gold/03_gold_aggregate.py`). Semantics preserved:
  *  - event-type literals are exactly `page_view` / `add_to_cart` /
  *    `purchase` (`:52-53,173`; README's literal-mismatch regression);
  *  - product_metrics is a FULL OUTER USING-join of event metrics and
  *    order metrics with zero-fill coalesce (`:78-88`);
  *  - funnel percentages are capped at 100 and NULL on zero denominator
  *    (`:137-152`); AOV is NULL when no purchases (`:256-263`);
  *  - `first(event_date)` is replaced by `min` (deterministic — SURVEY
  *    §5) and `current_date` by the injectable `asOf` date.
  *
  * Scale notes: event/order aggregates shuffle once on their group keys;
  * catalog-bounded product/review dims are broadcast by hint, while
  * fact-sized sides (sessions, customers) are left to AQE's size-based
  * choice — never force-broadcast; session_metrics and customer_360
  * reuse the session_id / customer_id shuffle. All date-partitioned
  * writes (Lakehouse) keep dashboard date predicates partition-prunable.
  */
object Gold {

  /** product_metrics (`03_gold_aggregate.py:38-110`), partitioned by
    * event_date downstream.
    */
  def productMetrics(eventsClean: DataFrame, orderItemsClean: DataFrame,
      productsClean: DataFrame, reviewsClean: DataFrame): DataFrame = {
    val eventMetrics = eventsClean
      .groupBy(col("event_date"), col("product_id"))
      .agg(
        countIf(col("event_type") === "page_view").as("view_count"),
        countIf(col("event_type") === "add_to_cart").as("cart_count"))
    val orderMetrics = orderItemsClean
      .groupBy(col("order_date"), col("product_id"))
      .agg(
        // decimal partial sum: order-independent under any shuffle (plain
        // double sum drifts in the last bit with partition order)
        graft.util.Exact.dsum(col("line_total_usd")).as("revenue"),
        sum(col("quantity")).cast(LongType).as("units_sold"))
      .withColumnRenamed("order_date", "event_date")
    val productAttrs = productsClean.select("product_id", "category", "product_name", "price_usd")
    val reviewMetrics = reviewsClean
      .groupBy(col("product_id"))
      .agg(avg(col("rating")).as("avg_rating"), count(col("review_id")).as("review_count"))
    eventMetrics
      .join(orderMetrics, Seq("event_date", "product_id"), "full_outer")
      .select(
        col("event_date"), col("product_id"),
        coalesce(col("view_count"), lit(0L)).as("view_count"),
        coalesce(col("cart_count"), lit(0L)).as("cart_count"),
        coalesce(col("revenue"), lit(0.0)).as("revenue"),
        coalesce(col("units_sold"), lit(0L)).as("units_sold"))
      .join(broadcast(productAttrs), Seq("product_id"), "left")
      .join(broadcast(reviewMetrics), Seq("product_id"), "left")
      // reference `:102-103`: review metrics zero-fill for unreviewed
      // products and the average rounds to 2dp (both engines round
      // positive halves away from zero, so the oracle matches bit-exact)
      .withColumn("avg_rating", round(coalesce(col("avg_rating"), lit(0.0)), 2))
      .withColumn("review_count", coalesce(col("review_count"), lit(0L)))
      .filter(col("product_id").isNotNull)
  }

  /** product_funnel (`03_gold_aggregate.py:127-155`): per (event_date,
    * product_id) view→cart→purchase counts with capped percentages.
    */
  def productFunnel(eventsClean: DataFrame): DataFrame =
    eventsClean
      .groupBy(col("event_date"), col("product_id"))
      .agg(
        countIf(col("event_type") === "page_view").as("views"),
        countIf(col("event_type") === "add_to_cart").as("carts"),
        countIf(col("event_type") === "purchase").as("purchases"))
      .select(
        col("event_date"), col("product_id"), col("views"), col("carts"), col("purchases"),
        round(cappedPct(col("carts").cast(DoubleType), col("views")), 2).as("view_to_cart_pct"),
        round(cappedPct(col("purchases").cast(DoubleType), col("carts")), 2).as("cart_to_purchase_pct"),
        round(cappedPct(col("purchases").cast(DoubleType), col("views")), 2).as("view_to_purchase_pct"))
      .filter(col("product_id").isNotNull)

  /** session_metrics (`03_gold_aggregate.py:163-211`): batch min/max
    * sessionization of the event stream + session-attribute join with
    * coalesce fallbacks; duration from epoch-second subtraction.
    */
  def sessionMetrics(eventsClean: DataFrame, sessionsClean: DataFrame): DataFrame = {
    val agg = eventsClean
      .filter(col("session_id").isNotNull)
      .groupBy(col("session_id"))
      .agg(
        min(col("event_ts")).as("events_start_ts"),
        max(col("event_ts")).as("events_end_ts"),
        count(col("event_id")).as("events_count"),
        min(col("event_date")).as("events_date"), // deterministic `first`
        dsumIf(col("event_type") === "purchase", col("amount_usd")).as("session_revenue"),
        countIf(col("event_type") === "purchase").as("purchase_count"))
    val attrs = sessionsClean.select(
      col("session_id"), col("customer_id"), col("session_start_ts"),
      col("device"), col("source"), col("country"))
    // NO broadcast hint: sessions are fact-sized (one row per visit —
    // they grow with traffic, not with the catalog). Forcing a
    // broadcast here OOMs at scale; both sides already shuffle on
    // session_id, so the sort-merge/shuffled-hash join co-locates for
    // free, and AQE still auto-broadcasts when the table is small.
    agg
      .join(attrs, Seq("session_id"), "left")
      .select(
        col("session_id"),
        col("customer_id"),
        coalesce(col("session_start_ts"), col("events_start_ts")).as("session_start_ts"),
        col("events_end_ts").as("session_end_ts"),
        col("events_count"),
        col("session_revenue"),
        col("purchase_count"),
        when(col("purchase_count") > 0, lit(1)).otherwise(lit(0)).as("has_purchase"),
        col("device"), col("source"), col("country"),
        coalesce(col("events_date"), to_date(coalesce(col("session_start_ts"), col("events_start_ts"))))
          .as("session_date"))
      .withColumn("session_duration_sec",
        col("session_end_ts").cast(LongType) - col("session_start_ts").cast(LongType))
      .filter(col("session_duration_sec").isNotNull && col("session_duration_sec") >= 0)
  }

  /** customer_360 (`03_gold_aggregate.py:226-272`): demographics LEFT
    * JOIN session rollup, zero-fill, AOV NULL-safe, `asOf` replacing
    * current_date for determinism.
    */
  def customer360(customersClean: DataFrame, sessionMetrics: DataFrame,
      asOf: LocalDate): DataFrame = {
    val sessionAgg = sessionMetrics
      .filter(col("customer_id").isNotNull)
      .groupBy(col("customer_id"))
      .agg(
        // decimal partial sum: order-independent money aggregate (a plain
        // double sum depends on partition order under AQE/parallelism)
        graft.util.Exact.dsum(col("session_revenue")).as("lifetime_revenue"),
        sum(col("has_purchase")).cast(LongType).as("total_purchases"),
        countDistinct(col("session_id")).as("total_sessions"),
        max(col("session_end_ts")).as("last_active_ts"),
        min(col("session_start_ts")).as("first_active_ts"))
    val asOfCol = lit(asOf.toString).cast(DateType)
    customersClean
      .select("customer_id", "name", "email", "country", "age", "signup_date", "marketing_opt_in")
      .join(sessionAgg, Seq("customer_id"), "left")
      .select(
        col("customer_id"), col("name"), col("email"), col("country"), col("age"),
        col("signup_date"), col("marketing_opt_in"),
        coalesce(col("lifetime_revenue"), lit(0.0)).as("lifetime_revenue"),
        coalesce(col("total_purchases"), lit(0L)).as("total_purchases"),
        coalesce(col("total_sessions"), lit(0L)).as("total_sessions"),
        col("last_active_ts"), col("first_active_ts"),
        datediff(asOfCol, col("signup_date")).as("days_since_signup"),
        round(safeDiv(coalesce(col("lifetime_revenue"), lit(0.0)),
          coalesce(col("total_purchases"), lit(0L))), 2).as("avg_order_value"))
      .filter(col("customer_id").isNotNull)
  }

  /** All four gold models from the silver map. */
  def aggregateAll(silver: Map[String, DataFrame], asOf: LocalDate): Map[String, DataFrame] = {
    val sm = sessionMetrics(silver("events_clean"), silver("sessions_clean"))
    Map(
      "product_metrics" -> productMetrics(
        silver("events_clean"), silver("order_items_clean"),
        silver("products_clean"), silver("reviews_clean")),
      "product_funnel" -> productFunnel(silver("events_clean")),
      "session_metrics" -> sm,
      "customer_360" -> customer360(silver("customers_clean"), sm, asOf))
  }
}
