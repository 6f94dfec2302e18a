package graft.ecom

import org.apache.spark.sql.types._

/** Explicit schemas for the 7 raw e-commerce sources (reference infers
  * them from CSV — `01_bronze/01_bronze_ingest.py:26`; we default to
  * deterministic explicit StructTypes, FIXTURES.md §A).
  *
  * Raw IDs are strings: CSV inference may have rendered them as floats
  * ("1050.0"), which Silver's clean_id normalizes.
  */
object Schemas {

  val customers: StructType = StructType(Seq(
    StructField("customer_id", StringType),
    StructField("name", StringType),
    StructField("email", StringType),
    StructField("country", StringType),
    StructField("age", StringType),
    StructField("signup_date", StringType),
    StructField("marketing_opt_in", StringType)))

  val events: StructType = StructType(Seq(
    StructField("event_id", StringType),
    StructField("session_id", StringType),
    StructField("timestamp", StringType),
    StructField("event_type", StringType),
    StructField("product_id", StringType),
    StructField("qty", StringType),
    StructField("cart_size", StringType),
    StructField("payment", StringType),
    StructField("discount_pct", StringType),
    StructField("amount_usd", StringType)))

  val orders: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("customer_id", StringType),
    StructField("order_time", StringType),
    StructField("payment_method", StringType),
    StructField("discount_pct", StringType),
    StructField("subtotal_usd", StringType),
    StructField("total_usd", StringType),
    StructField("country", StringType),
    StructField("device", StringType),
    StructField("source", StringType)))

  val orderItems: StructType = StructType(Seq(
    StructField("order_id", StringType),
    StructField("product_id", StringType),
    StructField("unit_price_usd", StringType),
    StructField("quantity", StringType),
    StructField("line_total_usd", StringType)))

  val products: StructType = StructType(Seq(
    StructField("product_id", StringType),
    StructField("category", StringType),
    StructField("name", StringType),
    StructField("price_usd", StringType),
    StructField("cost_usd", StringType),
    StructField("margin_usd", StringType)))

  val reviews: StructType = StructType(Seq(
    StructField("review_id", StringType),
    StructField("order_id", StringType),
    StructField("product_id", StringType),
    StructField("rating", StringType),
    StructField("review_text", StringType),
    StructField("review_time", StringType)))

  val sessions: StructType = StructType(Seq(
    StructField("session_id", StringType),
    StructField("customer_id", StringType),
    StructField("start_time", StringType),
    StructField("device", StringType),
    StructField("source", StringType),
    StructField("country", StringType)))

  val all: Map[String, StructType] = Map(
    "customers" -> customers,
    "events" -> events,
    "orders" -> orders,
    "order_items" -> orderItems,
    "products" -> products,
    "reviews" -> reviews,
    "sessions" -> sessions)
}
