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

  test("bucketed snapshot DIFF (l44's layout claim): the full-outer key " +
      "join over two identically-bucketed snapshots plans NO shuffle " +
      "exchange and classifies identically to the plain-parquet diff") {
    resetTable("snap_v1")
    resetTable("snap_v2")
    val cur = Tables.documents(spark, sf).filter(col("text").isNotNull)
      .select("doc_id", "source", "text")
    // a simple planted history: v1 misses every %7 doc, v2 is current
    val v1 = cur.filter(col("doc_id") % 7 =!= 0)
    Bucketing.writeBucketed(
      v1.select(col("doc_id"), col("text").as("t1")), "snap_v1", "doc_id", 8)
    Bucketing.writeBucketed(
      cur.select(col("doc_id"), col("text").as("t2")), "snap_v2", "doc_id", 8)
    val diff = Bucketing.bucketedJoin(spark, "snap_v1", "snap_v2",
        "doc_id", "doc_id", joinType = "full_outer")
      .withColumn("status",
        when(col("t1").isNull, "added")
          .when(col("t2").isNull, "removed")
          .when(col("t1") =!= col("t2"), "modified")
          .otherwise("unchanged"))
    val plan = diff.queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"full-outer diff expected:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed snapshot diff still shuffles:\n$plan")
    // identical classification to the plain-parquet form
    val counts = diff.groupBy("status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val added = cur.filter(col("doc_id") % 7 === 0).count()
    val total = cur.count()
    assert(counts.getOrElse("added", 0L) === added)
    assert(counts.getOrElse("unchanged", 0L) === total - added)
    assert(counts.getOrElse("removed", 0L) === 0L)
  }

  test("a PartitionedUpsert-produced table joins on its pk with NO shuffle exchange") {
    import graft.sources.Generator
    import graft.streaming.PartitionedUpsert
    val base = java.nio.file.Files.createTempDirectory("graft_coloc_").toString
    val B = 8
    val prods = Generator.products(spark, 60, seed = 31)
      .withColumn("_src_offset", col("stock_quantity").cast("long"))
    // Two sink tables in the same bucket layout: the entity table and a
    // per-key side table (price snapshot), both landed by the upsert.
    PartitionedUpsert.upsert(spark, s"$base/products", prods, "product_id",
      Seq("created_at", "_src_offset"), B)
    PartitionedUpsert.upsert(spark, s"$base/prices",
      prods.select(col("product_id"), col("created_at").as("snap_at"),
        col("_src_offset").as("snap_off"), (col("price") * 2).as("price2")),
      "product_id", Seq("snap_at", "snap_off"), B)
    val joined = PartitionedUpsert.colocatedJoin(
      spark, s"$base/products", s"$base/prices", "product_id", B).get
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"))
    assert(!plan.contains("Exchange hashpartitioning"),
      s"upserted-table join still shuffles:\n$plan")
    // Same rows as the plain (shuffling) join, with every key matched.
    assert(joined.count() === 60)
    assert(joined.select("product_id").distinct().count() === 60)
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

  test("AQE splits a skewed sort-merge join partition at runtime") {
    import spark.implicits._
    // One hot key carrying ~90% of the fact rows. Thresholds are lowered
    // so the skew machinery engages at test scale; on a real cluster the
    // defaults (256 MB) do the same for genuinely large partitions.
    val olds = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "32KB")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      val fact = spark.range(100000)
        .select(when(col("id") % 10 =!= 0, lit(0L)).otherwise(col("id")).as("k"),
          concat(lit("payload-padding-padding-"), col("id")).as("payload"))
      val dim = (0L until 1000L).map(i => (i, s"dim$i")).toDF("k", "name")
      // A bare join: an aggregation on the join key above it would
      // REQUIRE the join's hash partitioning and legally suppress the
      // skew split (splitting breaks the partitioning guarantee).
      val joined = fact.join(dim, "k")
      joined.collect() // finalize THIS plan adaptively (a sink write would plan anew)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew="), s"AQE did not mark a skewed join:\n$plan")
    } finally olds.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _))
    }
  }

  test("AQE coalesces undersized shuffle partitions at runtime") {
    // 32 configured shuffle partitions over a few KB of data: the final
    // adaptive plan must read a coalesced shuffle, not 32 slivers.
    val tiny = Tables.nation(spark, sf).groupBy("n_regionkey").count()
    tiny.collect()
    val plan = tiny.queryExecution.executedPlan.toString
    assert(plan.contains("AQEShuffleRead") && plan.contains("coalesced"),
      s"no runtime coalescing in:\n$plan")
  }
}
