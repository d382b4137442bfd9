package graft

import java.nio.file.Files

import graft.sources.Generator
import graft.streaming.{IngestPipeline, KafkaShaped}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Typed `Dataset[T]` surface: the case-class model (`graft.Schemas`)
  * round-trips against the generator's frames and drives the ingest
  * pipeline through entity descriptors. */
class TypedApiSpec extends AnyFunSuite {

  private lazy val spark = Session.get()

  test("generated products decode into the typed Product dataset") {
    val ds = Generator.products(spark, 50, seed = 81).as(Schemas.productEncoder)
    val rows = ds.collect()
    assert(rows.length === 50)
    assert(rows.forall(p => p.price >= 5.0 && p.price < 500.0))
    // Typed transformations work (the Dataset API contract).
    val cheap = ds.filter((p: Product) => p.price < 100.0).map(
      (p: Product) => p.product_id)(org.apache.spark.sql.Encoders.STRING).count()
    assert(cheap === rows.count(_.price < 100.0))
  }

  test("generated orders decode into the typed Order dataset with nested items") {
    val ds = Generator.orders(spark, 50, 20, 20, seed = 82).as(Schemas.orderEncoder)
    val rows = ds.collect()
    assert(rows.length === 50)
    assert(rows.forall(o => o.items.nonEmpty && o.items.size <= 4))
    val recomputed = rows.map(o =>
      BigDecimal(o.items.map(i => i.quantity * i.unit_price).sum)
        .setScale(2, BigDecimal.RoundingMode.HALF_EVEN).toDouble)
    assert(rows.map(_.total).zip(recomputed).forall { case (a, b) => math.abs(a - b) < 0.011 })
  }

  test("entity descriptors carry consistent schema/key/rules") {
    for (d <- Schemas.all) {
      assert(d.schema.fieldNames.contains(d.pk), s"${d.topic} pk not in schema")
      assert(d.schema.fieldNames.contains(d.versionCol), s"${d.topic} version not in schema")
      assert(d.rules.nonEmpty)
    }
    assert(Schemas.all.map(_.topic) === Seq("products", "customers", "orders", "events"))
  }

  test("ingest pipeline runs from an entity descriptor (events topic)") {
    val in = Files.createTempDirectory("graft_typed_").toString
    val base = Files.createTempDirectory("graft_typed_sinks_").toString
    val sinks = IngestPipeline.Sinks(s"$base/raw", s"$base/norm", s"$base/rej",
      s"$base/stats", s"$base/ckpt")
    val events = Generator.events(spark, 30, nCustomers = 10, seed = 83)
    KafkaShaped.writeTopicFile(events, "event_id", "events", 2, 0, in)
    val q = IngestPipeline.start(spark, in, sinks, Schemas.eventsDesc)
    q.awaitTermination()
    assert(spark.read.parquet(sinks.normalized).count() === 30)
    // Typed read of the normalized output (extra audit column dropped).
    val typed = spark.read.parquet(sinks.normalized)
      .select("event_id", "customer_id", "event_type", "timestamp", "props")
      .as(Schemas.eventEncoder).collect()
    assert(typed.length === 30)
    assert(typed.forall(e => Generator.EventTypes.contains(e.event_type)))
  }
}
