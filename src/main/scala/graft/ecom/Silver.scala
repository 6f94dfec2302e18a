package graft.ecom

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops.CleanOps.{cleanId, dedupLatest}

/** Silver layer: clean / normalize / dedup the 7 sources (reference:
  * `/root/reference/02_silver/02_silver_transform.py`). Semantics
  * preserved exactly:
  *  - `clean_id` cast chain canonicalizes float-formatted IDs and nulls
  *    non-numeric ones (`:41-42`); rows with null PKs are dropped;
  *  - dedup keeps the LATEST `_ingest_ts` per PK (`:66-69` et seq.),
  *    with `_tie` on a unique column for determinism where the reference
  *    relies on arbitrary ordering;
  *  - order_items gains `order_date` from a LEFT join to orders with a
  *    `coalesce(order_date, to_date(_ingest_ts))` fallback (`:162-166`).
  *
  * Each transform is a pure `DataFrame => DataFrame` — unit-testable
  * without I/O; partitioned writes live in Lakehouse.
  */
object Silver {

  private val audit = Seq(col("_ingest_ts"), col("_source_file"))

  private def dedupByKey(df: DataFrame, keys: Seq[String], tie: String): DataFrame =
    dedupLatest(df, keys, Seq(col("_ingest_ts").desc, col(tie).desc_nulls_last))

  /** The curated projection PLUS feed-drift passthrough: raw columns
    * beyond the source's declared bronze schema (additive drift
    * [[IncrementalLakehouse.autoLand]] landed) ride through the
    * projection unchanged, so the silver table evolves additively with
    * the feed instead of silently shedding new columns — rescued-data
    * semantics. A drifted column whose name collides with a curated
    * output (or the corrupt-record marker) stays bronze-only: the
    * projection's meaning never silently changes under drift. On
    * un-drifted input the extra list is empty and this IS the plain
    * select. Row-local throughout (`.columns` is plan-side analysis,
    * no job).
    */
  private def projectRescued(raw: DataFrame,
      declared: org.apache.spark.sql.types.StructType,
      projection: Seq[Column]): DataFrame = {
    val out = raw.select(projection: _*).columns
    val extra = raw.columns.toSeq
      .filterNot(c => declared.fieldNames.exists(_.equalsIgnoreCase(c)))
      .filterNot(c => out.exists(_.equalsIgnoreCase(c)))
      .filterNot(_.equalsIgnoreCase(Bronze.CorruptCol))
      .map(col)
    raw.select(projection ++ extra: _*)
  }

  /** customers_clean (`02_silver_transform.py:53-69`). */
  def customers(raw: DataFrame): DataFrame = {
    val projected = projectRescued(raw, Schemas.customers,
      Seq(
        cleanId(col("customer_id")).as("customer_id"),
        trim(col("name")).as("name"),
        lower(trim(col("email"))).as("email"),
        trim(col("country")).as("country"),
        col("age").cast(IntegerType).as("age"),
        to_date(col("signup_date")).as("signup_date"),
        col("marketing_opt_in").cast(BooleanType).as("marketing_opt_in")) ++ audit)
      .filter(col("customer_id").isNotNull)
    dedupByKey(projected, Seq("customer_id"), "email")
  }

  /** The STATELESS half of events_clean (`02_silver_transform.py:82-99`):
    * projection, casts, clean_id, PK filter — distributive over batches
    * (f(a ∪ b) = f(a) ∪ f(b)), so it is legal as a [[VersionedPipe]]
    * transform; only the dedup below needs the full relation.
    */
  def eventsProjected(raw: DataFrame): DataFrame =
    projectRescued(raw, Schemas.events,
      Seq(
        cleanId(col("event_id")).as("event_id"),
        cleanId(col("session_id")).as("session_id"),
        to_timestamp(col("timestamp")).as("event_ts"),
        trim(col("event_type")).as("event_type"),
        cleanId(col("product_id")).as("product_id"),
        col("qty").cast(IntegerType).as("qty"),
        col("cart_size").cast(IntegerType).as("cart_size"),
        // untrimmed, as the reference takes it (`:90`)
        col("payment").as("payment"),
        col("discount_pct").cast(DoubleType).as("discount_pct"),
        col("amount_usd").cast(DoubleType).as("amount_usd")) ++ audit)
      .withColumn("event_date", to_date(col("event_ts")))
      .filter(col("event_id").isNotNull)

  /** Keep-latest dedup over the projected stream — idempotent, so
    * deduping the union of incrementally-landed batches equals a full
    * recompute (EcomPipelineSpec pins the equivalence).
    */
  def eventsDedup(projected: DataFrame): DataFrame =
    dedupByKey(projected, Seq("event_id"), "event_ts")

  /** events_clean (`02_silver_transform.py:82-104`), partitioned by
    * event_date downstream.
    */
  def events(raw: DataFrame): DataFrame = eventsDedup(eventsProjected(raw))

  /** orders_clean (`02_silver_transform.py:115-137`). */
  def orders(raw: DataFrame): DataFrame = {
    val projected = projectRescued(raw, Schemas.orders,
      Seq(
        cleanId(col("order_id")).as("order_id"),
        cleanId(col("customer_id")).as("customer_id"),
        to_timestamp(col("order_time")).as("order_ts"),
        trim(col("payment_method")).as("payment_method"),
        col("discount_pct").cast(DoubleType).as("discount_pct"),
        col("subtotal_usd").cast(DoubleType).as("subtotal_usd"),
        col("total_usd").cast(DoubleType).as("total_usd"),
        trim(col("country")).as("country"),
        trim(col("device")).as("device"),
        trim(col("source")).as("source")) ++ audit)
      .withColumn("order_date", to_date(col("order_ts")))
      .filter(col("order_id").isNotNull)
    dedupByKey(projected, Seq("order_id"), "order_ts")
  }

  /** order_items_clean (`02_silver_transform.py:148-174`): composite PK
    * (order_id, product_id), quantity > 0 gate, order_date attached from
    * orders with ingest-date fallback. Only order_id is PK-filtered —
    * the reference KEEPS rows whose product_id nulled under clean_id
    * (`:157-158`); they group as a null key downstream and gold's
    * product_id filter is what finally drops them.
    */
  def orderItems(raw: DataFrame, ordersClean: DataFrame): DataFrame =
    orderItemsDated(orderItemsProjected(raw), ordersClean)

  /** The clean/dedup half of [[orderItems]], exposed separately so an
    * incremental step can compute it CONCURRENTLY with the orders merge
    * the date-fallback join must wait for.
    */
  def orderItemsProjected(raw: DataFrame): DataFrame = {
    val projected = projectRescued(raw, Schemas.orderItems,
      Seq(
        cleanId(col("order_id")).as("order_id"),
        cleanId(col("product_id")).as("product_id"),
        col("unit_price_usd").cast(DoubleType).as("unit_price_usd"),
        col("quantity").cast(IntegerType).as("quantity"),
        col("line_total_usd").cast(DoubleType).as("line_total_usd")) ++ audit)
      .filter(col("order_id").isNotNull)
      .filter(col("quantity") > 0)
    dedupByKey(projected, Seq("order_id", "product_id"), "line_total_usd")
  }

  /** The order_date derivation half of [[orderItems]] (ingest-date
    * fallback for items whose order is absent,
    * `02_silver_transform.py:148-160`).
    */
  def orderItemsDated(items: DataFrame, ordersClean: DataFrame): DataFrame =
    items
      .join(ordersClean.select("order_id", "order_date"), Seq("order_id"), "left")
      .withColumn("order_date", coalesce(col("order_date"), to_date(col("_ingest_ts"))))

  /** products_clean (`02_silver_transform.py:185-200`). */
  def products(raw: DataFrame): DataFrame = {
    val projected = projectRescued(raw, Schemas.products,
      Seq(
        cleanId(col("product_id")).as("product_id"),
        trim(col("category")).as("category"),
        trim(col("name")).as("product_name"),
        col("price_usd").cast(DoubleType).as("price_usd"),
        col("cost_usd").cast(DoubleType).as("cost_usd"),
        col("margin_usd").cast(DoubleType).as("margin_usd")) ++ audit)
      .filter(col("product_id").isNotNull)
    dedupByKey(projected, Seq("product_id"), "product_name")
  }

  /** reviews_clean (`02_silver_transform.py:213-228`). */
  def reviews(raw: DataFrame): DataFrame = {
    val projected = projectRescued(raw, Schemas.reviews,
      Seq(
        cleanId(col("review_id")).as("review_id"),
        cleanId(col("order_id")).as("order_id"),
        cleanId(col("product_id")).as("product_id"),
        col("rating").cast(IntegerType).as("rating"),
        col("review_text").as("review_text"),
        to_timestamp(col("review_time")).as("review_ts")) ++ audit)
      .filter(col("review_id").isNotNull)
    dedupByKey(projected, Seq("review_id"), "review_ts")
  }

  /** sessions_clean (`02_silver_transform.py:241-253`): project/clean
    * ONLY — the reference neither PK-filters nor dedups sessions (it is
    * the one silver table without a row_number pass), so null session
    * ids and duplicate rows flow through exactly as they do there.
    */
  def sessions(raw: DataFrame): DataFrame =
    projectRescued(raw, Schemas.sessions,
      Seq(
        cleanId(col("session_id")).as("session_id"),
        cleanId(col("customer_id")).as("customer_id"),
        to_timestamp(col("start_time")).as("session_start_ts"),
        trim(col("device")).as("device"),
        trim(col("source")).as("source"),
        trim(col("country")).as("country")) ++ audit)

  /** All seven transforms, given the bronze tables by name. */
  def transformAll(bronze: Map[String, DataFrame]): Map[String, DataFrame] = {
    val ordersClean = orders(bronze("orders"))
    Map(
      "customers_clean" -> customers(bronze("customers")),
      "events_clean" -> events(bronze("events")),
      "orders_clean" -> ordersClean,
      "order_items_clean" -> orderItems(bronze("order_items"), ordersClean),
      "products_clean" -> products(bronze("products")),
      "reviews_clean" -> reviews(bronze("reviews")),
      "sessions_clean" -> sessions(bronze("sessions")))
  }
}
