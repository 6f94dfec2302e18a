package graft.ecom

import java.nio.file.Files
import java.sql.Timestamp
import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** Golden-pipeline test: tiny reference-shaped fixtures exercising every
  * edge case pinned in SURVEY.md §5 — float-formatted IDs, non-numeric
  * IDs (dropped), duplicate PKs with differing _ingest_ts, zero-view
  * products, "quick add" carts exceeding views, AOV-null customers —
  * run bronze → silver → gold → DQ end-to-end.
  */
class EcomPipelineSpec extends SparkSuite {
  import spark.implicits._

  private val t1 = Timestamp.valueOf("2025-01-01 00:00:00")
  private val t2 = Timestamp.valueOf("2025-01-02 00:00:00")

  private def raw(table: String, rows: Seq[Seq[String]], ingestTs: Timestamp): DataFrame = {
    val schema = Schemas.all(table)
    val rdd = spark.sparkContext.parallelize(rows.map(Row.fromSeq(_)))
    Bronze.stampAt(spark.createDataFrame(rdd, schema), s"$table.csv", ingestTs)
  }

  private lazy val bronze: Map[String, DataFrame] = Map(
    "customers" -> raw("customers", Seq(
      Seq("1.0", " Ada ", " ADA@X.COM ", "JP", "30", "2024-01-01", "true"),
      Seq("1", "Ada Newer", "ada@x.com", "JP", "31", "2024-01-01", "true"), // dup PK after clean_id
      Seq("2", "Bob", "bob@x.com", "US", "40", "2024-02-01", "false"),     // no sessions -> AOV null
      Seq("junk", "Eve", "eve@x.com", "DE", "50", "2024-03-01", "true")    // non-numeric id -> dropped
    ), t1).unionByName(raw("customers", Seq(
      Seq("1", "Ada Latest", "ada@x.com", "JP", "31", "2024-01-01", "true") // latest ingest wins
    ), t2)),
    "events" -> raw("events", Seq(
      //        ev  sess ts                     type          prod  qty cart pay   disc amt
      Seq("10", "100", "2025-01-05 10:00:00", "page_view",   "7.0", "1", "0", "",     "0", "0"),
      Seq("11", "100", "2025-01-05 10:05:00", "add_to_cart", "7",   "1", "1", "",     "0", "0"),
      Seq("12", "100", "2025-01-05 10:10:00", "purchase",    "7",   "1", "1", "card", "0", "50.0"),
      Seq("13", "101", "2025-01-05 11:00:00", "add_to_cart", "8",   "2", "1", "",     "0", "0"), // cart w/o view ("quick add")
      Seq("14", "101", "2025-01-05 11:01:00", "purchase",    "8",   "1", "1", "card", "0", "30.0"),
      Seq("12", "100", "2025-01-05 10:10:00", "purchase",    "7",   "1", "1", "card", "0", "50.0") // dup event_id
    ), t1),
    "orders" -> raw("orders", Seq(
      Seq("500", "1", "2025-01-05 10:12:00", "card", "0", "50", "50", "JP", "desktop", "organic")
    ), t1),
    "order_items" -> raw("order_items", Seq(
      Seq("500", "7", "50", "1", "50"),
      Seq("500", "9", "10", "0", "0"),   // quantity<=0 -> dropped
      Seq("999", "8", "30", "1", "30")   // orphan order -> order_date falls back to ingest date
    ), t1),
    "products" -> raw("products", Seq(
      Seq("7", "Electronics", "Widget", "50", "30", "20"),
      Seq("8", "Toys", "Gadget", "30", "10", "20"),
      Seq("9", "Books", "NeverViewed", "10", "5", "5") // zero events, zero valid orders
    ), t1),
    "reviews" -> raw("reviews", Seq(
      Seq("r1", "500", "7", "4", "good", "2025-01-06 00:00:00"), // non-numeric review_id -> dropped
      Seq("300", "500", "7", "4", "good", "2025-01-06 00:00:00"),
      Seq("301", "500", "7", "2", "meh", "2025-01-06 00:00:00")
    ), t1),
    "sessions" -> raw("sessions", Seq(
      Seq("100", "1", "2025-01-05 09:59:00", "desktop", "organic", "JP")
      // session 101 missing -> session_metrics coalesce fallbacks
    ), t1))

  private lazy val gold: Map[String, DataFrame] = {
    val dir = Files.createTempDirectory("graft-lakehouse").toString
    Lakehouse(spark, dir).runAll(bronze, asOf = LocalDate.parse("2025-02-01"))
  }

  test("silver: clean_id + dedup-keep-latest semantics") {
    val silver = Silver.transformAll(bronze)
    val customers = silver("customers_clean").orderBy("customer_id")
      .select("customer_id", "name", "email").as[(String, String, String)].collect().toSeq
    // "1.0" and "1" collapse; latest _ingest_ts row wins; "junk" dropped; email lowercased+trimmed
    assert(customers == Seq(("1", "Ada Latest", "ada@x.com"), ("2", "Bob", "bob@x.com")))
    assert(silver("events_clean").count() == 5)       // dup event dropped
    assert(silver("order_items_clean").count() == 2)  // qty<=0 dropped
    val orphanDate = silver("order_items_clean").filter(col("order_id") === "999")
      .select("order_date").as[java.sql.Date].head()
    assert(orphanDate.toString == "2025-01-01")       // ingest-date fallback
  }

  test("gold product_metrics: full-outer zero-fill and dims") {
    val pm = gold("product_metrics").orderBy("product_id")
    val byId = pm.collect().map(r => r.getAs[String]("product_id") -> r).toMap
    // product 7: views=1 carts=1 revenue=50 units=1, avg_rating=3.0, reviews=2
    val p7 = byId("7")
    assert(p7.getAs[Long]("view_count") == 1 && p7.getAs[Long]("cart_count") == 1)
    assert(p7.getAs[Double]("revenue") == 50.0 && p7.getAs[Long]("units_sold") == 1)
    assert(p7.getAs[Double]("avg_rating") == 3.0 && p7.getAs[Long]("review_count") == 2)
    // product 8: cart+purchase events, order-side present via orphan item (ingest date)
    assert(byId.contains("8"))
    // product 9 appears on no side (qty<=0 dropped, no events) -> absent entirely
    assert(!byId.contains("9"))
  }

  test("gold product_funnel: quick-add cart exceeding views is capped at 100") {
    val pf = gold("product_funnel")
    val p8 = pf.filter(col("product_id") === "8").head()
    assert(p8.getAs[Long]("views") == 0 && p8.getAs[Long]("carts") == 1)
    assert(p8.getAs[Any]("view_to_cart_pct") == null)          // 0 views -> NULL, not div/0
    assert(p8.getAs[Double]("cart_to_purchase_pct") == 100.0)  // 1 purchase / 1 cart
    val p7 = pf.filter(col("product_id") === "7").head()
    assert(p7.getAs[Double]("view_to_cart_pct") == 100.0)
  }

  test("gold session_metrics: attribute fallbacks and duration") {
    val sm = gold("session_metrics")
    val s100 = sm.filter(col("session_id") === "100").head()
    assert(s100.getAs[String]("customer_id") == "1")
    // session table start (09:59) wins over first event (10:00)
    assert(s100.getAs[Timestamp]("session_start_ts").toString.contains("09:59"))
    assert(s100.getAs[Long]("session_duration_sec") == 11 * 60)
    assert(s100.getAs[Double]("session_revenue") == 50.0)
    val s101 = sm.filter(col("session_id") === "101").head()
    assert(s101.getAs[String]("customer_id") == null) // no sessions row
    assert(s101.getAs[Long]("session_duration_sec") == 60)
  }

  test("gold customer_360: zero-fill, AOV null when no purchases, days_since_signup") {
    val c360 = gold("customer_360")
    val ada = c360.filter(col("customer_id") === "1").head()
    assert(ada.getAs[Double]("lifetime_revenue") == 50.0)
    assert(ada.getAs[Long]("total_sessions") == 1)
    assert(ada.getAs[Double]("avg_order_value") == 50.0)
    assert(ada.getAs[Int]("days_since_signup") == 397) // 2024-01-01 -> 2025-02-01
    val bob = c360.filter(col("customer_id") === "2").head()
    assert(bob.getAs[Double]("lifetime_revenue") == 0.0)
    assert(bob.getAs[Long]("total_sessions") == 0)
    assert(bob.getAs[Any]("avg_order_value") == null)
  }

  test("DQ gate passes on the pipeline output and catches planted violations") {
    DqChecks.enforceAll(gold) // must not throw
    val bad = gold + ("product_metrics" ->
      gold("product_metrics").withColumn("revenue", lit(-1.0)))
    val e = intercept[IllegalStateException](DqChecks.enforceAll(bad))
    assert(e.getMessage.contains("product_metrics_nonneg_revenue"))
  }
}
