package graft

import graft.operators.Validation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** V1–V5 rule-level semantics on hand-crafted rows (inverse of
  * `corruptions.py:49-101`; CHECK surface `02_create_tables.sql`). */
class ValidationSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  import spark.implicits._

  test("product split tags each violated rule by name") {
    val df = Seq(
      ("p1", "ok", "books", 10.0, 5),       // valid
      ("p2", null.asInstanceOf[String], "books", 10.0, 5), // name_missing
      ("p3", "x", "books", -1.0, 5),        // price_invalid
      ("p4", "x", "books", 10.0, -2))       // stock_negative
      .toDF("product_id", "name", "category", "price", "stock_quantity")
    val s = Validation.validateProducts(df)
    assert(s.valid.select("product_id").as[String].collect().toSet === Set("p1"))
    val v = s.rejects.select(col("product_id"), col("violations"))
      .as[(String, Seq[String])].collect().toMap
    assert(v("p2") === Seq("name_missing"))
    assert(v("p3") === Seq("price_invalid"))
    assert(v("p4") === Seq("stock_negative"))
  }

  test("a row violating several rules carries all of them") {
    val df = Seq(("p9", null.asInstanceOf[String], null.asInstanceOf[String], -3.0, -1))
      .toDF("product_id", "name", "category", "price", "stock_quantity")
    val v = Validation.validateProducts(df).rejects
      .select("violations").as[Seq[String]].collect().head
    assert(v.toSet === Set("name_missing", "category_missing", "price_invalid", "stock_negative"))
  }

  test("customer email rules distinguish missing from invalid") {
    val df = Seq(
      ("c1", "A", "a@b.com"),
      ("c2", "B", null.asInstanceOf[String]),
      ("c3", "C", "not-an-email"))
      .toDF("customer_id", "name", "email")
    val s = Validation.validateCustomers(df)
    val v = s.rejects.select(col("customer_id"), col("violations"))
      .as[(String, Seq[String])].collect().toMap
    assert(s.valid.count() === 1)
    assert(v("c2") === Seq("email_missing"))
    assert(v("c3") === Seq("email_invalid"))
  }

  test("dedupWithRejects keeps the first row per key and tags the rest") {
    val df = Seq(
      ("c1", "dup@x.com", 1L), ("c2", "dup@x.com", 2L), ("c3", "solo@x.com", 3L))
      .toDF("customer_id", "email", "arrival")
    val s = Validation.dedupWithRejects(df, "email", col("arrival"))
    assert(s.valid.select("customer_id").as[String].collect().toSet === Set("c1", "c3"))
    val rej = s.rejects.select("customer_id", "violations")
      .as[(String, Seq[String])].collect().toMap
    assert(rej("c2") === Seq("duplicate_email"))
  }

  test("fkSplit routes orphans to rejects (J5 semantics)") {
    val parent = Seq("c1", "c2").toDF("customer_id")
    val child = Seq(("o1", "c1"), ("o2", "cX")).toDF("order_id", "cust")
    val s = Validation.fkSplit(child, parent, "cust", "customer_id")
    assert(s.valid.select("order_id").as[String].collect().toSet === Set("o1"))
    assert(s.rejects.select("order_id").as[String].collect().toSet === Set("o2"))
  }

  test("totalConsistent flags totals that disagree with the items sum (schemas.py:79-82)") {
    val df = Seq(
      ("o1", Seq((2, 5.0), (1, 3.0)), 13.0),   // 2*5+3 = 13 ✓
      ("o2", Seq((2, 5.0)), 11.0))             // 10 ≠ 11
      .toDF("order_id", "raw_items", "total")
      .withColumn("items", expr(
        "transform(raw_items, x -> named_struct('quantity', x._1, 'unit_price', x._2))"))
    val ok = df.filter(Validation.totalConsistent)
      .select("order_id").as[String].collect().toSet
    assert(ok === Set("o1"))
  }
}
