package graft.ecom

import java.time.LocalDate

import org.apache.spark.sql.DataFrame

import graft.SparkSuite

/** Schema tripwire against the reference select-lists: each gold
  * model's EXACT output schema (names, order, types) is pinned against
  * `03_gold_aggregate.py:93-272`, and each dashboard's column set
  * against its SQL file in `analysis/dashboard_queries/`. A refactor
  * that renames, reorders, retypes, or drops a reference column fails
  * here before it ever reaches the oracle gate (whose SQL twins mirror
  * this repo's code, not the reference's).
  */
class ReferenceParitySpec extends SparkSuite {

  private lazy val silver = Silver.transformAll(EcomFixtures.bronze(spark))
  private lazy val gold = Gold.aggregateAll(silver, EcomFixtures.asOf,
    java.sql.Timestamp.valueOf("2025-02-01 00:00:00"))

  private def sig(df: DataFrame): Seq[(String, String)] =
    df.schema.fields.toSeq.map(f => f.name -> f.dataType.catalogString)

  test("gold product_metrics matches 03_gold_aggregate.py:93-108 column-for-column") {
    assert(sig(gold("product_metrics")) == Seq(
      "event_date" -> "date", "product_id" -> "string",
      "product_name" -> "string", "category" -> "string",
      "view_count" -> "int", "cart_count" -> "int", "purchase_count" -> "int",
      "total_revenue" -> "double", "avg_rating" -> "double", "review_count" -> "int"))
  }

  test("gold product_funnel matches 03_gold_aggregate.py:127-152 column-for-column") {
    assert(sig(gold("product_funnel")) == Seq(
      "event_date" -> "date", "product_id" -> "string",
      "product_name" -> "string", "category" -> "string",
      "view_count" -> "int", "cart_count" -> "int", "purchase_count" -> "int",
      "view_to_cart_pct" -> "double", "cart_to_purchase_pct" -> "double",
      "overall_conversion_pct" -> "double"))
  }

  test("gold session_metrics matches 03_gold_aggregate.py:187-205 column-for-column") {
    assert(sig(gold("session_metrics")) == Seq(
      "session_id" -> "string", "customer_id" -> "string",
      "session_date" -> "date", "session_start_ts" -> "timestamp",
      "session_end_ts" -> "timestamp", "session_duration_sec" -> "bigint",
      "total_events" -> "bigint", "device" -> "string", "source" -> "string",
      "country" -> "string", "session_revenue" -> "double", "has_purchased" -> "int"))
  }

  test("gold customer_360 matches 03_gold_aggregate.py:245-268 column-for-column") {
    assert(sig(gold("customer_360")) == Seq(
      "customer_id" -> "string", "name" -> "string", "email" -> "string",
      "country" -> "string", "age" -> "int", "signup_date" -> "date",
      "marketing_opt_in" -> "boolean", "customer_total_revenue" -> "double",
      "total_orders" -> "int", "total_sessions" -> "int",
      "first_active_ts" -> "timestamp", "last_active_ts" -> "timestamp",
      "average_order_value" -> "double", "days_since_signup" -> "int",
      "scd_load_ts" -> "timestamp"))
  }

  private val start = LocalDate.parse("2025-01-01")
  private val end = LocalDate.parse("2025-01-31")

  test("dashboard 01_product_performance.sql column set") {
    assert(sig(Dashboards.productPerformance(gold("product_metrics"), start, end)) == Seq(
      "category" -> "string", "product_name" -> "string",
      "total_views" -> "bigint", "total_carts" -> "bigint",
      "total_purchases" -> "bigint", "total_revenue" -> "double",
      "view_to_cart_rate" -> "double", "cart_to_purchase_rate" -> "double",
      "overall_conversion_rate" -> "double"))
  }

  test("dashboard 02_Sales Overview.sql column set") {
    assert(sig(Dashboards.salesOverview(gold("session_metrics"), start, end)) == Seq(
      "session_date" -> "date", "total_sessions" -> "bigint",
      "total_orders" -> "bigint", "total_revenue" -> "double",
      "daily_aov" -> "double", "session_conversion_rate" -> "double"))
  }

  test("dashboard 03_Site Wide Funnel.sql column set") {
    assert(sig(Dashboards.siteWideFunnel(gold("product_metrics"), start, end)) == Seq(
      "funnel_stage" -> "string", "count" -> "bigint"))
  }

  test("dashboard 04_Customer 360.sql column set") {
    assert(sig(Dashboards.customer360Top(gold("customer_360"), start, end)) == Seq(
      "customer_id" -> "string", "name" -> "string", "country" -> "string",
      "total_orders" -> "int", "lifetime_revenue" -> "double",
      "average_order_value" -> "double", "days_since_signup" -> "int",
      "last_active_date" -> "date", "customer_tier" -> "string"))
  }

  test("silver sessions_clean carries no dedup and no PK filter (02_silver:241-253)") {
    // two rows with the same session_id and one with a null id must all
    // survive — the reference's one dedup-free silver table
    val raw = EcomFixtures.raw(spark, "sessions", Seq(
      Seq("7", "1", "2025-01-01 00:00:00", "web", "ads", "US"),
      Seq("7", "1", "2025-01-02 00:00:00", "web", "ads", "US"),
      Seq("junk", "1", "2025-01-03 00:00:00", "web", "ads", "US")
    ), EcomFixtures.t1)
    val out = Silver.sessions(raw)
    assert(out.count() == 3)
    assert(out.filter(out("session_id").isNull).count() == 1)
  }

  test("silver order_items_clean keeps null product_id rows (02_silver:157-158)") {
    val orders = Silver.orders(EcomFixtures.bronze(spark)("orders"))
    val raw = EcomFixtures.raw(spark, "order_items", Seq(
      Seq("500", "7", "10", "1", "10"),
      Seq("500", "junk", "10", "1", "10"), // product_id nulls under clean_id — KEPT
      Seq(null, "7", "10", "1", "10")      // order_id null — dropped
    ), EcomFixtures.t1)
    val out = Silver.orderItems(raw, orders)
    assert(out.count() == 2)
    assert(out.filter(out("product_id").isNull).count() == 1)
  }
}
