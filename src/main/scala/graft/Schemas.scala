package graft

import java.sql.Timestamp

import graft.operators.Validation
import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.types.StructType

/** Typed entity model — the Scala mirror of the reference's Pydantic
  * schemas (`src/data_generator/schemas.py:12-111`): `Product`,
  * `Customer`, `OrderItem`, `Order` (with the nested `items` list the
  * Kafka payload carries, `schemas.py:69`), `Event`.
  *
  * Each case class yields both the `Encoder` for the typed
  * `Dataset[T]` API and the `StructType` the ingest plane's PERMISSIVE
  * `from_json` decode uses — one definition, both planes (SURVEY.md
  * §7.0). UUIDs are canonical 36-char strings (Spark has no UUID type);
  * money is `Double` in the ingest plane per the JSON payloads, cast to
  * decimal at rest by the normalization layer.
  */
final case class Product(product_id: String, name: String, category: String,
    price: Double, stock_quantity: Int, created_at: Timestamp)

final case class Customer(customer_id: String, name: String, email: String,
    created_at: Timestamp)

final case class OrderItem(product_id: String, quantity: Int, unit_price: Double)

final case class Order(order_id: String, customer_id: String, status: String,
    items: Seq[OrderItem], created_at: Timestamp, updated_at: Timestamp,
    total: Double)

final case class Event(event_id: String, customer_id: String,
    event_type: String, timestamp: Timestamp, props: String)

object Schemas {

  val productEncoder: Encoder[Product]   = Encoders.product[Product]
  val customerEncoder: Encoder[Customer] = Encoders.product[Customer]
  val orderEncoder: Encoder[Order]       = Encoders.product[Order]
  val eventEncoder: Encoder[Event]       = Encoders.product[Event]

  val product: StructType  = productEncoder.schema
  val customer: StructType = customerEncoder.schema
  val order: StructType    = orderEncoder.schema
  val event: StructType    = eventEncoder.schema

  /** Everything the ingest pipeline needs to land one entity topic:
    * decode schema, upsert key + version, validation rules — the
    * per-topic configuration the reference spreads across
    * `settings.py:27-30` and the consumer stubs.
    *
    * Version-tie semantics: products/customers carry only an immutable
    * `created_at`, so a re-published update ties on the version column;
    * the upsert breaks such ties by source offset (later per-partition
    * offset wins — the compacted-topic rule), so updates still land.
    * Orders/events version on their mutable timestamp directly.
    *
    * `moneyCols` are cast to `DECIMAL(10,2)` at the normalized-sink
    * boundary (`Normalize.atRest`) — the at-rest money type the
    * reference declares in DDL (`02_create_tables.sql:56,80,98-99`)
    * while the JSON wire format stays double. */
  final case class EntityDesc(
      topic: String, schema: StructType, pk: String, versionCol: String,
      rules: Seq[(String, Column)], moneyCols: Seq[String] = Nil)

  val productsDesc: EntityDesc = EntityDesc(
    "products", product, "product_id", "created_at", Validation.productRules,
    moneyCols = Seq("price"))
  val customersDesc: EntityDesc = EntityDesc(
    "customers", customer, "customer_id", "created_at", Validation.customerRules)
  val ordersDesc: EntityDesc = EntityDesc(
    "orders", order, "order_id", "updated_at", Validation.orderRules,
    moneyCols = Seq("total"))
  val eventsDesc: EntityDesc = EntityDesc(
    "events", event, "event_id", "timestamp", Validation.eventRules)

  val all: Seq[EntityDesc] = Seq(productsDesc, customersDesc, ordersDesc, eventsDesc)
}
