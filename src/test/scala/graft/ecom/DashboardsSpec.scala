package graft.ecom

import java.time.LocalDate

import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The four reference BI queries (analysis/dashboard_queries SQL) run
  * over the golden-pipeline gold tables: parameter windows, capping,
  * NULL-AOV, funnel ordering, and out-of-range emptiness.
  */
class DashboardsSpec extends SparkSuite {

  private lazy val gold = EcomFixtures.gold(spark)
  private val start = LocalDate.parse("2025-01-01")
  private val end = LocalDate.parse("2025-01-31")

  test("productPerformance: in-range rollup with capped view_to_cart_pct") {
    val out = Dashboards.productPerformance(gold("product_metrics"), start, end)
      .collect().map(r => r.getAs[String]("product_id") -> r).toMap
    val p7 = out("7")
    assert(p7.getAs[Double]("total_revenue") == 50.0)
    assert(p7.getAs[Long]("total_views") == 1 && p7.getAs[Long]("total_carts") == 1)
    assert(p7.getAs[Double]("view_to_cart_pct") == 100.0)
    // product 8: zero views -> NULL pct, not division error or >100
    assert(out("8").getAs[Any]("view_to_cart_pct") == null)
  }

  test("productPerformance: out-of-range window is empty (partition-prunable predicate)") {
    val out = Dashboards.productPerformance(gold("product_metrics"),
      LocalDate.parse("2030-01-01"), LocalDate.parse("2030-12-31"))
    assert(out.isEmpty)
  }

  test("salesOverview: daily sessions/revenue with NULL AOV when no purchase sessions") {
    val rows = Dashboards.salesOverview(gold("session_metrics"), start, end).collect()
    assert(rows.length == 1)
    val d = rows.head
    assert(d.getAs[Long]("sessions") == 2)
    assert(d.getAs[Double]("revenue") == 80.0)
    assert(d.getAs[Long]("purchase_sessions") == 2)
    assert(d.getAs[Double]("avg_order_value") == 40.0)
  }

  test("siteWideFunnel: three labeled stages ordered by count desc") {
    val rows = Dashboards.siteWideFunnel(gold("product_metrics"), gold("product_funnel"),
      start, end).collect()
    assert(rows.map(_.getAs[String]("funnel_stage")).toSeq ==
      Seq("2. Added to Cart", "3. Purchases", "1. Product Views"))
    assert(rows.map(_.getAs[Long]("n")).toSeq == Seq(2L, 2L, 1L))
  }

  test("customer360Top: last-activity window, revenue-desc order") {
    val c360 = Dashboards.customer360WithDates(gold("customer_360"))
    val rows = Dashboards.customer360Top(c360, start, end).collect()
    assert(rows.map(_.getAs[String]("customer_id")).toSeq == Seq("1"))
    assert(rows.head.getAs[Double]("lifetime_revenue") == 50.0)
    // Bob has no sessions (null last_active_ts) and signed up outside the
    // window -> excluded
  }
}
