package graft.ecom

import graft.SparkSuite

/** Typed Dataset boundary round-trips the golden-fixture silver tables. */
class ModelSpec extends SparkSuite {

  private lazy val silver = Silver.transformAll(EcomFixtures.bronze(spark))

  test("every silver table decodes into its case class") {
    val customers = Model.customers(silver("customers_clean")).collect()
    assert(customers.map(_.customer_id).sorted.toSeq == Seq("1", "2"))
    assert(customers.find(_.customer_id == "1").get.name == "Ada Latest")

    val events = Model.events(silver("events_clean")).collect()
    assert(events.length == 8)
    assert(events.forall(_.event_id.nonEmpty))

    assert(Model.orders(silver("orders_clean")).collect().head.total_usd.contains(50.0))
    val items = Model.orderItems(silver("order_items_clean")).collect()
    assert(items.forall(_.quantity.exists(_ > 0)))
    assert(Model.products(silver("products_clean")).collect().map(_.product_id).sorted.toSeq ==
      Seq("7", "8", "9"))
    assert(Model.reviews(silver("reviews_clean")).collect().length == 2)
    assert(Model.sessions(silver("sessions_clean")).collect().map(_.session_id).sorted.toSeq ==
      Seq("100", "102"))
  }

  test("typed filters compose with the untyped pipeline") {
    import spark.implicits._
    val bigOrders = Model.orders(silver("orders_clean"))
      .filter(o => o.total_usd.exists(_ >= 50.0))
      .map(_.order_id)
      .collect()
    assert(bigOrders.toSeq == Seq("500"))
  }
}
