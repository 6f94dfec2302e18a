package graft.ecom

import graft.SparkSuite

/** Reference entry point EP2 (SURVEY §3): SQL text over registered
  * tables — the DQ failure queries and a dashboard rollup expressed as
  * `spark.sql`, against the golden-pipeline gold tables.
  */
class SqlEntryPointSpec extends SparkSuite {

  private lazy val gold = EcomFixtures.gold(spark)

  test("DQ failure queries as SQL text return zero bad rows on clean gold") {
    Lakehouse(spark, "unused").registerViews(gold)
    val failureQueries = Seq(
      "SELECT * FROM customer_360 WHERE customer_id IS NULL OR email IS NULL",
      """SELECT customer_id, COUNT(*) AS c FROM customer_360
        |GROUP BY customer_id HAVING COUNT(*) > 1""".stripMargin,
      "SELECT * FROM product_metrics WHERE total_revenue < 0",
      """SELECT * FROM product_funnel
        |WHERE view_to_cart_pct > 100.0 OR cart_to_purchase_pct > 100.0""".stripMargin)
    failureQueries.foreach(q => assert(spark.sql(q).count() == 0, q))
  }

  test("dashboard rollup via spark.sql matches the DataFrame formulation") {
    Lakehouse(spark, "unused").registerViews(gold)
    val sql = spark.sql(
      """SELECT category, product_name, SUM(total_revenue) AS total_revenue,
        |  SUM(view_count) AS total_views
        |FROM product_metrics
        |WHERE event_date BETWEEN DATE '2025-01-01' AND DATE '2025-01-31'
        |GROUP BY 1, 2 ORDER BY total_revenue DESC, category, product_name""".stripMargin).collect()
    val df = Dashboards.productPerformance(gold("product_metrics"),
        java.time.LocalDate.parse("2025-01-01"), java.time.LocalDate.parse("2025-01-31"))
      .select("category", "product_name", "total_revenue", "total_views").collect()
    assert(sql.map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSeq ==
      df.map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getLong(3))).toSeq)
  }
}
