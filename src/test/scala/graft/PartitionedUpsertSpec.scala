package graft

import java.nio.file.Files

import graft.sources.Generator
import graft.streaming.PartitionedUpsert
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Hash-partitioned upsert: bucket pruning (the O(touched) claim),
  * latest-wins parity with the whole-table sink, point lookups, and
  * per-bucket crash recovery. */
class PartitionedUpsertSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val B = 16

  private def tmp(): String =
    Files.createTempDirectory("graft_pupsert_").toString

  private def products(n: Long, seed: Long) =
    Generator.products(spark, n, seed)
      .withColumn("_src_offset", col("stock_quantity").cast("long"))

  test("first batch lands; readAll returns exactly the incoming keys") {
    val path = tmp()
    val v1 = products(50, seed = 21)
    val touched = PartitionedUpsert.upsert(spark, path, v1, "product_id",
      Seq("created_at", "_src_offset"), B)
    assert(touched.nonEmpty && touched.forall(b => b >= 0 && b < B))
    val all = PartitionedUpsert.readAll(spark, path, B).get
    assert(all.count() === 50)
    assert(all.select("product_id").distinct().count() === 50)
  }

  test("a small batch touches only its keys' buckets; others are not rewritten") {
    val path = tmp()
    val v1 = products(60, seed = 22)
    PartitionedUpsert.upsert(spark, path, v1, "product_id",
      Seq("created_at", "_src_offset"), B)
    // Snapshot per-bucket modification times.
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def mtimes: Map[String, Long] =
      fs.listStatus(new org.apache.hadoop.fs.Path(path))
        .map(s => s.getPath.getName -> s.getModificationTime).toMap
    val before = mtimes
    Thread.sleep(1100)

    // One updated key → exactly one bucket rewritten.
    val one = products(60, seed = 22).filter(col("stock_quantity") >= 0).limit(1)
      .withColumn("created_at", col("created_at") + expr("INTERVAL 3 DAYS"))
    val touched = PartitionedUpsert.upsert(spark, path, one, "product_id",
      Seq("created_at", "_src_offset"), B)
    assert(touched.size === 1, s"one key must touch one bucket, got $touched")
    val after = mtimes
    val changed = after.filter { case (k, t) => before.get(k).exists(_ != t) }.keySet
    assert(changed === Set(s"bucket=${touched.head}"),
      s"only the touched bucket may change; changed = $changed")
    // Untouched keys' rows are intact.
    assert(PartitionedUpsert.readAll(spark, path, B).get.count() === 60)
  }

  test("latest-wins semantics match the whole-table sink's tie-break rules") {
    val path = tmp()
    val v1 = products(30, seed = 23)
    PartitionedUpsert.upsert(spark, path, v1, "product_id",
      Seq("created_at", "_src_offset"), B)
    // Newer version for every key → all rows replaced.
    val v2 = v1.withColumn("created_at", col("created_at") + expr("INTERVAL 10 DAYS"))
      .withColumn("price", col("price") + 1.0)
    PartitionedUpsert.upsert(spark, path, v2, "product_id",
      Seq("created_at", "_src_offset"), B)
    val all = PartitionedUpsert.readAll(spark, path, B).get
    assert(all.count() === 30)
    val minCreated = v2.agg(min("created_at")).collect()(0).getTimestamp(0)
    assert(all.filter(col("created_at") < minCreated).count() === 0)
    // Replay of v1 (older) must change nothing.
    PartitionedUpsert.upsert(spark, path, v1, "product_id",
      Seq("created_at", "_src_offset"), B)
    val replayed = PartitionedUpsert.readAll(spark, path, B).get
    assert(replayed.filter(col("created_at") < minCreated).count() === 0,
      "an older replayed batch must not regress any key")
  }

  test("point lookup opens exactly the key's bucket and finds it") {
    val path = tmp()
    val v1 = products(40, seed = 24)
    PartitionedUpsert.upsert(spark, path, v1, "product_id",
      Seq("created_at", "_src_offset"), B)
    val key = v1.select("product_id").collect()(7).getString(0)
    val hit = PartitionedUpsert.readBucketOf(spark, path, key, B).get
    assert(hit.filter(col("product_id") === key).count() === 1)
    // The driver-side hash agrees with the SQL-side bucket assignment.
    val sqlBucket = v1.filter(col("product_id") === key)
      .select(PartitionedUpsert.bucketOf(col("product_id"), B)).collect()(0).getInt(0)
    assert(PartitionedUpsert.bucketOfKey(key, B) === sqlBucket)
  }

  test("bucketOf agrees with bucketOfKey for non-string pks (cast-to-string hash)") {
    // bucketOfKey hashes the key's string form; bucketOf must match for
    // an int pk, or point lookups silently open the wrong bucket.
    val rows = spark.range(200)
      .select(col("id").cast("int").as("k"),
        PartitionedUpsert.bucketOf(col("id").cast("int"), B).as("b"))
      .collect()
    rows.foreach { r =>
      assert(PartitionedUpsert.bucketOfKey(r.getInt(0).toString, B) === r.getInt(1),
        s"bucket mismatch for int key ${r.getInt(0)}")
    }
  }

  test("a bucket mid-rotation (only .bak present) is recovered, others unaffected") {
    val path = tmp()
    val v1 = products(40, seed = 25)
    val touched = PartitionedUpsert.upsert(spark, path, v1, "product_id",
      Seq("created_at", "_src_offset"), B)
    // Simulate the crash window on one bucket: live dir rotated to .bak.
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val victim = touched.head
    fs.rename(new org.apache.hadoop.fs.Path(s"$path/bucket=$victim"),
      new org.apache.hadoop.fs.Path(s"$path/bucket=$victim.bak"))
    val all = PartitionedUpsert.readAll(spark, path, B).get
    assert(all.count() === 40, "the crashed bucket must be served from its backup")
    // The next upsert through the bucket heals it.
    val more = products(40, seed = 25).limit(3)
    PartitionedUpsert.upsert(spark, path, more, "product_id",
      Seq("created_at", "_src_offset"), B)
    assert(PartitionedUpsert.readAll(spark, path, B).get.count() === 40)
  }
}
