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
}
