package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every declared query in the catalog runs on sf0.001 and produces a
  * non-empty, well-formed result — the per-operator smoke layer under
  * the driver's DuckDB-oracle gate (which checks exact values at
  * sf0.01). */
class CatalogSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  test("catalog names are unique and every query has a distinct result contract") {
    val names = SparkEntry.catalog.map(_.name)
    assert(names.distinct.size === names.size)
    assert(names.nonEmpty)
  }

  test("every oracle entry corresponds to a catalog query") {
    val qnames = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qnames))
  }

  test("entry (flagship) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for (dq <- SparkEntry.catalog) {
    test(s"${dq.name} runs on sf0.001 with rows and named columns") {
      val df = dq.fn(spark, sf)
      val cols = df.columns
      assert(cols.nonEmpty && cols.forall(_.nonEmpty))
      assert(cols.distinct.length === cols.length, "duplicate column names")
      assert(df.count() > 0)
    }
  }

  test("a5 approx_count_distinct is within 5% of the exact distinct count") {
    val exact = operators.RelationalQueries.a5.fn(spark, sf)
      .collect()(0).getAs[Long]("n_cust")
    val approx = operators.RelationalQueries.a5approx.fn(spark, sf)
      .collect()(0).getAs[Long]("n_approx")
    val err = math.abs(approx - exact).toDouble / exact
    assert(err <= 0.05, s"approx=$approx exact=$exact err=$err")
  }
}
