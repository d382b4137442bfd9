package graft

import graft.sources.{Corruptions, Generator}
import graft.operators.Validation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** S1/S2 — generator and corruption semantics, mirroring the reference's
  * unit discipline (`tests/unit/test_corruptions.py:32-119`,
  * `test_producer.py:306-330` total-before-produce). */
class GeneratorSpec extends AnyFunSuite {

  private lazy val spark = Session.get()

  test("generation is deterministic per (seed, id) regardless of partitioning") {
    val a = Generator.products(spark, 200, seed = 42).orderBy("product_id").collect()
    val b = Generator.products(spark, 200, seed = 42).repartition(7)
      .orderBy("product_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("different seeds generate different data") {
    val a = Generator.products(spark, 100, seed = 1).agg(sum("price")).collect()(0).getDouble(0)
    val b = Generator.products(spark, 100, seed = 2).agg(sum("price")).collect()(0).getDouble(0)
    assert(a !== b)
  }

  test("product values respect the reference ranges (price [5,500), stock [0,1000))") {
    val bad = Generator.products(spark, 500, seed = 3)
      .filter(col("price") < 5 || col("price") >= 500 ||
        col("stock_quantity") < 0 || col("stock_quantity") >= 1000)
      .count()
    assert(bad === 0)
  }

  test("orders hold referential integrity against the customer id space (utils.py:326-327 analog)") {
    val customers = Generator.customers(spark, 50, seed = 5)
    val orders = Generator.orders(spark, 300, nCustomers = 50, nProducts = 30, seed = 5)
    val orphans = orders.join(customers, Seq("customer_id"), "left_anti").count()
    assert(orphans === 0)
  }

  test("order items reference the generated product id space") {
    val products = Generator.products(spark, 30, seed = 6)
    val itemProducts = Generator.orders(spark, 200, 50, 30, seed = 6)
      .select(explode(col("items")).as("it")).select(col("it.product_id"))
    val orphans = itemProducts.join(products, Seq("product_id"), "left_anti").count()
    assert(orphans === 0)
  }

  test("order total equals round(sum(qty*price), 2) per order (schemas.py:79-82)") {
    val bad = Generator.orders(spark, 300, 50, 30, seed = 7)
      .filter(!Validation.totalConsistent)
      .count()
    assert(bad === 0)
  }

  test("order item counts are within [1, 4] and quantities within [1, 5]") {
    val o = Generator.orders(spark, 300, 50, 30, seed = 8)
    assert(o.filter(size(col("items")) < 1 || size(col("items")) > 4).count() === 0)
    val badQty = o.select(explode(col("items")).as("it"))
      .filter(col("it.quantity") < 1 || col("it.quantity") > 5).count()
    assert(badQty === 0)
  }

  test("events reference customers and carry parseable props JSON") {
    val ev = Generator.events(spark, 300, nCustomers = 50, seed = 9)
    val badType = ev.filter(!col("event_type").isin(Generator.EventTypes: _*)).count()
    assert(badType === 0)
    val badProps = ev.filter(get_json_object(col("props"), "$.k").isNull).count()
    assert(badProps === 0)
  }

  test("generated emails pass the validity regex (utils.py:85-128 analog)") {
    val bad = Generator.customers(spark, 200, seed = 10)
      .filter(!col("email").rlike("^[^@]+@[^@]+\\.[^@]+$")).count()
    assert(bad === 0)
  }

  // --- corruption (test_corruptions.py:84-119 discipline) ---

  test("corrupt(p=0) is the identity on every entity") {
    val p = Generator.products(spark, 100, seed = 11)
    assert(Corruptions.products(p, 0.0, 99).orderBy("product_id").collect().toSeq ===
      p.orderBy("product_id").collect().toSeq)
    val o = Generator.orders(spark, 100, 20, 20, seed = 11)
    assert(Corruptions.orders(o, 0.0, 99).orderBy("order_id").collect().toSeq ===
      o.orderBy("order_id").collect().toSeq)
  }

  test("corrupt(p=1) makes every product invalid; validators reject all") {
    val corrupted = Corruptions.products(Generator.products(spark, 200, seed = 12), 1.0, 13)
    val split = Validation.validateProducts(corrupted)
    assert(split.valid.count() === 0)
    assert(split.rejects.count() === 200)
  }

  test("corrupt(p=1) makes every order invalid; validators reject all") {
    val corrupted = Corruptions.orders(Generator.orders(spark, 200, 50, 30, seed = 14), 1.0, 15)
    val split = Validation.validateOrders(corrupted)
    assert(split.valid.count() === 0)
    assert(split.rejects.count() === 200)
  }

  test("corrupt(p=1) makes every customer and event invalid; validators reject all") {
    val c = Corruptions.customers(Generator.customers(spark, 200, seed = 16), 1.0, 17)
    assert(Validation.validateCustomers(c).valid.count() === 0)
    val e = Corruptions.events(Generator.events(spark, 200, 50, seed = 18), 1.0, 19)
    assert(Validation.validateEvents(e).valid.count() === 0)
  }

  test("uncorrupted entities all validate clean (corrupt(p=0) → accept all)") {
    assert(Validation.validateProducts(Generator.products(spark, 200, 20)).rejects.count() === 0)
    assert(Validation.validateCustomers(Generator.customers(spark, 200, 21)).rejects.count() === 0)
    assert(Validation.validateOrders(Generator.orders(spark, 200, 50, 30, 22)).rejects.count() === 0)
    assert(Validation.validateEvents(Generator.events(spark, 200, 50, 23)).rejects.count() === 0)
  }

  test("corruption is deterministic for a fixed seed") {
    val base = Generator.products(spark, 200, seed = 24)
    val a = Corruptions.products(base, 0.5, 25).orderBy("product_id").collect()
    val b = Corruptions.products(base, 0.5, 25).orderBy("product_id").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("corruption rate approximates p on a large sample") {
    val n = 2000
    val split = Validation.validateProducts(
      Corruptions.products(Generator.products(spark, n, seed = 26), 0.3, 27))
    val rate = split.rejects.count().toDouble / n
    assert(rate > 0.2 && rate < 0.4, s"observed corruption rate $rate")
  }
}
