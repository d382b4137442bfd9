package graft

import graft.operators.Normalize
import graft.sources.Generator
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Nested items → order_items child-table explode with the generated
  * line_total column (`02_create_tables.sql:93-109` analog). */
class NormalizeSpec extends AnyFunSuite {

  private lazy val spark = Session.get()

  private lazy val orders = Generator.orders(spark, 300, 50, 30, seed = 71)

  test("one child row per nested item, line numbers 1..n per order") {
    val items = Normalize.orderItems(orders)
    val expected = orders.agg(sum(size(col("items")))).collect()(0).getLong(0)
    assert(items.count() === expected)
    val badLineNums = items.groupBy("order_id")
      .agg(min("line_number").as("lo"), max("line_number").as("hi"),
        count(lit(1)).as("n"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n")).count()
    assert(badLineNums === 0)
  }

  test("line_total is the generated quantity*unit_price rounded to cents") {
    val bad = Normalize.orderItems(orders)
      .filter(abs(col("line_total") -
        round(col("quantity") * col("unit_price"), 2)) > 1e-9).count()
    assert(bad === 0)
  }

  test("per-order sum of line_totals agrees with the payload total within line-rounding") {
    val items = Normalize.orderItems(orders)
      .groupBy("order_id").agg(sum("line_total").as("recomputed"),
        count(lit(1)).as("n_lines"))
    // total rounds once; line_total rounds per line → bounded drift.
    val bad = orders.join(items, "order_id")
      .filter(abs(col("total") - col("recomputed")) > col("n_lines") * 0.01)
      .count()
    assert(bad === 0)
  }

  test("child rows keep FK integrity to the generated product space") {
    val products = Generator.products(spark, 30, seed = 71)
    val orphans = Normalize.orderItems(orders)
      .join(products, Seq("product_id"), "left_anti").count()
    assert(orphans === 0)
  }

  test("money at rest is DECIMAL(10,2); decimal sums equal the cents-long path exactly") {
    import org.apache.spark.sql.types.DecimalType
    val items = Normalize.orderItems(orders)
    assert(items.schema("unit_price").dataType === DecimalType(10, 2))
    assert(items.schema("line_total").dataType === DecimalType(10, 2))
    // The exact-decimal total must agree to the cent with the integer-
    // cents path computed over the raw wire doubles — the two exact
    // representations of the same money must never diverge.
    val decCents = items.agg(sum(col("line_total"))).collect()(0)
      .getDecimal(0).movePointRight(2).longValueExact()
    val cents = orders.select(explode(col("items")).as("it"))
      .agg(sum(round(col("it.quantity") * col("it.unit_price") * 100).cast("long")))
      .collect()(0).getLong(0)
    assert(decCents === cents)
  }

  test("atRest casts only the declared money columns, losslessly") {
    import org.apache.spark.sql.types.DecimalType
    val products = Generator.products(spark, 40, seed = 71)
    val rest = Normalize.atRest(products, Seq("price"))
    assert(rest.schema("price").dataType === DecimalType(10, 2))
    assert(rest.schema("stock_quantity").dataType ===
      products.schema("stock_quantity").dataType)
    // wire double → DECIMAL(10,2) → double is identity for 2-decimal money.
    val bad = products.select(col("product_id"), col("price"))
      .join(rest.select(col("product_id"), col("price").cast("double").as("p")),
        "product_id")
      .filter(col("price") =!= col("p")).count()
    assert(bad === 0)
  }
}
