package graft

import graft.functions.Salting
import graft.sources.Bucketing
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Plan-level proof of the 100 TB techniques: bucketed co-located joins
  * (no Exchange) and salted two-phase aggregation (exact results). */
class ScaleTechniquesSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  /** Drop any prior table AND its warehouse location — the in-memory
    * catalog forgets tables across JVMs but the managed location
    * persists, and saveAsTable refuses to reuse it. */
  private def resetTable(name: String): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $name")
    val wh = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir") + s"/$name")
    wh.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(wh, true)
  }

  test("bucketed fact-fact join plans with NO shuffle exchange") {
    resetTable("li_bucketed")
    resetTable("ord_bucketed")
    Bucketing.writeBucketed(
      Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice"),
      "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority"),
      "ord_bucketed", "o_orderkey", 8)
    val joined = Bucketing.bucketedJoin(spark, "li_bucketed", "ord_bucketed",
      "l_orderkey", "o_orderkey")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin") || plan.contains("BroadcastHashJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")
    // And it computes the same rows as the plain join.
    val direct = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .count()
    assert(joined.count() === direct)
  }

  test("the same join on plain parquet DOES shuffle (control for the test above)") {
    val plain = Tables.lineitem(spark, sf).select("l_orderkey", "l_extendedprice")
      .join(Tables.orders(spark, sf).select("o_orderkey", "o_orderpriority")
        .hint("merge"), col("l_orderkey") === col("o_orderkey"))
    val plan = plain.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning"))
  }

  test("salted two-phase aggregation is exact vs direct aggregation") {
    val df = Tables.lineitem(spark, sf)
      .select(col("l_returnflag").as("k"), Det.cents(col("l_quantity")).as("v"))
    val salted = Salting.saltedSumCount(df, "k", col("v"), nSalts = 16)
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val direct = df.groupBy("k").agg(sum("v").as("total"), count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(salted.toSeq === direct.toSeq)
  }

  test("salting fans a hot key out across sub-keys even with CONSTANT values") {
    import spark.implicits._
    // One key, 10k rows, all carrying the SAME value — the canonical
    // skew shape where any data-derived salt collapses to one subkey.
    val hot = (1 to 10000).map(_ => ("hot", 1L)).toDF("k", "v")
    val phase1Groups = hot
      .withColumn("_salt", pmod(monotonically_increasing_id(), lit(16L)))
      .groupBy("k", "_salt").count()
    assert(phase1Groups.count() > 1, "hot key not split across salts")
    val out = Salting.saltedSumCount(hot, "k", col("v"), 16).collect()(0)
    assert(out.getAs[Long]("total") === 10000L)
    assert(out.getAs[Long]("n") === 10000L)
  }
}
