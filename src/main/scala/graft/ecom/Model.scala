package graft.ecom

import java.sql.{Date, Timestamp}

import org.apache.spark.sql.{DataFrame, Dataset}

/** Typed API boundary over the silver tables (SURVEY §1.4): case-class
  * `Encoder`s give callers compile-time field safety; the pipeline
  * itself stays `DataFrame`-based (schemas evolve table-by-table, and
  * the Column DSL keeps every transform codegen-able).
  *
  * Fields mirror the Silver select-lists (reference:
  * `02_silver/02_silver_transform.py:53-250`); audit columns are
  * dropped at this boundary.
  */
object Model {

  final case class Customer(
      customer_id: String, name: String, email: String, country: String,
      age: Option[Int], signup_date: Option[Date], marketing_opt_in: Option[Boolean])

  final case class Event(
      event_id: String, session_id: String, event_ts: Option[Timestamp],
      event_type: String, product_id: Option[String], qty: Option[Int],
      cart_size: Option[Int], payment: String, discount_pct: Option[Double],
      amount_usd: Option[Double], event_date: Option[Date])

  final case class Order(
      order_id: String, customer_id: Option[String], order_ts: Option[Timestamp],
      payment_method: String, discount_pct: Option[Double],
      subtotal_usd: Option[Double], total_usd: Option[Double],
      country: String, device: String, source: String, order_date: Option[Date])

  final case class OrderItem(
      order_id: String, product_id: Option[String], unit_price_usd: Option[Double],
      quantity: Option[Int], line_total_usd: Option[Double], order_date: Option[Date])

  final case class Product(
      product_id: String, category: String, product_name: String,
      price_usd: Option[Double], cost_usd: Option[Double], margin_usd: Option[Double])

  final case class Review(
      review_id: String, order_id: Option[String], product_id: Option[String],
      rating: Option[Int], review_text: String, review_ts: Option[Timestamp])

  final case class Session(
      session_id: String, customer_id: Option[String],
      session_start_ts: Option[Timestamp], device: String, source: String,
      country: String)

  private def typed[T: org.apache.spark.sql.Encoder](df: DataFrame, cols: Seq[String]): Dataset[T] =
    df.select(cols.head, cols.tail: _*).as[T]

  def customers(silver: DataFrame): Dataset[Customer] = {
    import silver.sparkSession.implicits._
    typed[Customer](silver, Seq("customer_id", "name", "email", "country", "age",
      "signup_date", "marketing_opt_in"))
  }

  def events(silver: DataFrame): Dataset[Event] = {
    import silver.sparkSession.implicits._
    typed[Event](silver, Seq("event_id", "session_id", "event_ts", "event_type",
      "product_id", "qty", "cart_size", "payment", "discount_pct", "amount_usd", "event_date"))
  }

  def orders(silver: DataFrame): Dataset[Order] = {
    import silver.sparkSession.implicits._
    typed[Order](silver, Seq("order_id", "customer_id", "order_ts", "payment_method",
      "discount_pct", "subtotal_usd", "total_usd", "country", "device", "source", "order_date"))
  }

  def orderItems(silver: DataFrame): Dataset[OrderItem] = {
    import silver.sparkSession.implicits._
    typed[OrderItem](silver, Seq("order_id", "product_id", "unit_price_usd",
      "quantity", "line_total_usd", "order_date"))
  }

  def products(silver: DataFrame): Dataset[Product] = {
    import silver.sparkSession.implicits._
    typed[Product](silver, Seq("product_id", "category", "product_name",
      "price_usd", "cost_usd", "margin_usd"))
  }

  def reviews(silver: DataFrame): Dataset[Review] = {
    import silver.sparkSession.implicits._
    typed[Review](silver, Seq("review_id", "order_id", "product_id", "rating",
      "review_text", "review_ts"))
  }

  def sessions(silver: DataFrame): Dataset[Session] = {
    import silver.sparkSession.implicits._
    typed[Session](silver, Seq("session_id", "customer_id", "session_start_ts",
      "device", "source", "country"))
  }
}
