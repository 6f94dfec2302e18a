package graft.ecom

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.util.Exact.dsum

/** The four parameterized BI queries (reference:
  * `/root/reference/analysis/dashboard_queries/` SQL files). The Databricks
  * `:start_date` / `:end_date` named parameters become typed LocalDate
  * arguments (SURVEY §3 EP3). Each runs over a gold DataFrame; the date
  * BETWEEN predicate partition-prunes when the gold table is written
  * date-partitioned (Lakehouse does).
  */
object Dashboards {

  private def between(c: String, start: LocalDate, end: LocalDate) =
    col(c).between(lit(start.toString).cast(DateType), lit(end.toString).cast(DateType))

  /** 01_product_performance.sql: per-product revenue/views/conversion in
    * a date range, top 100 by revenue.
    */
  def productPerformance(productMetrics: DataFrame, start: LocalDate, end: LocalDate): DataFrame =
    productMetrics
      .filter(between("event_date", start, end))
      .groupBy(col("product_id"), col("product_name"), col("category"))
      .agg(
        // money re-aggregates stay exact-decimal (house rule, see Exact):
        // order-independent under any shuffle, bit-stable vs the oracle
        dsum(col("revenue")).as("total_revenue"),
        sum(col("units_sold")).as("total_units"),
        sum(col("view_count")).as("total_views"),
        sum(col("cart_count")).as("total_carts"))
      .select(
        col("product_id"), col("product_name"), col("category"),
        round(col("total_revenue"), 2).as("total_revenue"),
        col("total_units"), col("total_views"), col("total_carts"),
        round(when(col("total_views") > 0,
          least(lit(100.0), col("total_carts") * lit(100.0) / col("total_views")))
          .otherwise(lit(null).cast(DoubleType)), 2).as("view_to_cart_pct"))
      .orderBy(col("total_revenue").desc, col("product_id"))
      .limit(100)

  /** 02_Sales Overview.sql: daily revenue/sessions/AOV. */
  def salesOverview(sessionMetrics: DataFrame, start: LocalDate, end: LocalDate): DataFrame =
    sessionMetrics
      .filter(between("session_date", start, end))
      .groupBy(col("session_date"))
      .agg(
        countDistinct(col("session_id")).as("sessions"),
        dsum(col("session_revenue")).as("revenue"),
        sum(col("has_purchase")).cast(LongType).as("purchase_sessions"))
      .select(
        col("session_date"), col("sessions"),
        round(col("revenue"), 2).as("revenue"),
        col("purchase_sessions"),
        round(when(col("purchase_sessions") > 0, col("revenue") / col("purchase_sessions"))
          .otherwise(lit(null).cast(DoubleType)), 2).as("avg_order_value"))
      .orderBy(col("session_date").desc)

  /** 03_Site Wide Funnel.sql: three labeled grand totals, UNION ALL. */
  def siteWideFunnel(productMetrics: DataFrame, productFunnel: DataFrame,
      start: LocalDate, end: LocalDate): DataFrame = {
    def stage(label: String, df: DataFrame, measure: String, dateCol: String): DataFrame =
      df.filter(between(dateCol, start, end))
        .agg(coalesce(sum(col(measure)), lit(0L)).as("n"))
        .select(lit(label).as("funnel_stage"), col("n"))
    stage("1. Product Views", productMetrics, "view_count", "event_date")
      .unionByName(stage("2. Added to Cart", productMetrics, "cart_count", "event_date"))
      .unionByName(stage("3. Purchases", productFunnel, "purchases", "event_date"))
      .orderBy(col("n").desc, col("funnel_stage"))
  }

  /** 04_Customer 360.sql: top customers by lifetime revenue whose last
    * activity falls in the range.
    */
  def customer360Top(customer360: DataFrame, start: LocalDate, end: LocalDate): DataFrame =
    customer360
      .filter(between("last_active_date", start, end) ||
        col("last_active_ts").isNull && between("signup_date", start, end))
      .orderBy(col("lifetime_revenue").desc, col("customer_id"))
      .limit(1000)

  implicit private class DfOps(df: DataFrame) {
    def withLastActiveDate: DataFrame =
      df.withColumn("last_active_date", col("last_active_ts").cast(DateType))
  }

  /** Convenience: customer360 with the derived last_active_date. */
  def customer360WithDates(customer360: DataFrame): DataFrame =
    customer360.withLastActiveDate
}
