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

  private lazy val bronze: Map[String, DataFrame] = EcomFixtures.bronze(spark)
  private lazy val gold: Map[String, DataFrame] = EcomFixtures.gold(spark)

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
    // plant each reference violation shape: a null dim attribute and a
    // negative session revenue
    val badDim = gold + ("product_metrics" ->
      gold("product_metrics").withColumn("product_name", lit(null).cast("string")))
    val e1 = intercept[IllegalStateException](DqChecks.enforceAll(badDim))
    assert(e1.getMessage.contains("product_metrics_null_dims"))
    val badSess = gold + ("session_metrics" ->
      gold("session_metrics").withColumn("session_revenue", lit(-1.0)))
    val e2 = intercept[IllegalStateException](DqChecks.enforceAll(badSess))
    assert(e2.getMessage.contains("session_metrics_nonneg"))
  }

  test("incremental silver via upsert equals full recompute; gold agrees") {
    val t3 = java.sql.Timestamp.valueOf("2025-01-03 00:00:00")
    // day-2 delta: a corrected event (same pk, newer ingest), a new event
    // in an existing session/date, and a new event on a NEW date
    val deltaRaw = EcomFixtures.raw(spark, "events", Seq(
      Seq("12", "100", "2025-01-05 10:10:00", "purchase", "7", "1", "1", "card", "0", "60.0"),
      Seq("15", "101", "2025-01-05 11:30:00", "page_view", "8", "1", "0", "", "0", "0"),
      Seq("16", "102", "2025-01-06 09:00:00", "purchase", "7", "1", "1", "card", "0", "20.0")
    ), t3)
    val baseRaw = EcomFixtures.bronze(spark)("events")
    val dir = java.nio.file.Files.createTempDirectory("graft-incr").toString
    val lh = Lakehouse(spark, dir)
    // incremental: land day 1, then MERGE day 2's silver delta
    lh.write("events_clean", Silver.events(baseRaw))
    lh.upsert("events_clean", Silver.events(deltaRaw), Seq("event_id"), "_ingest_ts")
    val incremental = lh.read("events_clean")
    // full recompute over the union of all raw data
    val full = Silver.events(baseRaw.unionByName(deltaRaw))
    assert(incremental.exceptAll(full).isEmpty && full.exceptAll(incremental).isEmpty,
      "incremental silver must equal the full recompute")
    // and the gold model built on either silver agrees
    val sessions = Silver.sessions(EcomFixtures.bronze(spark)("sessions"))
    val gIncr = Gold.sessionMetrics(incremental, sessions)
    val gFull = Gold.sessionMetrics(full, sessions)
    assert(gIncr.exceptAll(gFull).isEmpty && gFull.exceptAll(gIncr).isEmpty)
    // the corrected amount actually took effect
    assert(gIncr.filter(col("session_id") === "100").collect()
      .head.getAs[Double]("session_revenue") == 60.0)
  }
}
