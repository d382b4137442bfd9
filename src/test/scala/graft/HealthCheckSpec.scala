package graft

import java.nio.file.{Files, Paths}

import graft.streaming.{HealthCheck, IngestPipeline}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Health probes over an ingest deployment's paths: each predicate goes
  * green on a healthy layout and red on its specific failure mode. */
class HealthCheckSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private def tmp(): String = Files.createTempDirectory("graft_health_").toString

  /** Lay down a healthy deployment: a readable raw sink, a checkpoint
    * with one committed batch, a processing-stats table whose last row
    * is `ageMs` old, and a progress table (ProgressSink shape) whose
    * watermark advances. */
  private def healthyLayout(base: String, ageMs: Long = 0L,
      wms: Seq[String] = Seq("2026-01-01T10:00:00.000Z", "2026-01-01T11:00:00.000Z"))
      : IngestPipeline.Sinks = {
    import spark.implicits._
    val sinks = IngestPipeline.Sinks(
      raw = s"$base/raw", normalized = s"$base/normalized",
      rejects = s"$base/rejects", stats = s"$base/stats",
      checkpoint = s"$base/_checkpoint")
    spark.range(10).toDF("id").write.parquet(sinks.raw)
    for (sub <- Seq("offsets", "commits")) {
      Files.createDirectories(Paths.get(sinks.checkpoint, sub))
      Files.write(Paths.get(sinks.checkpoint, sub, "0"), "v1".getBytes)
    }
    // Processing-stats shape (processBatch): counts + recorded_at.
    Seq((0L, 10L)).toDF("batch_id", "n_in")
      .withColumn("recorded_at",
        timestamp_millis(lit(System.currentTimeMillis() - ageMs)))
      .write.mode("overwrite").parquet(sinks.stats)
    // ProgressSink shape: per-trigger watermark.
    wms.zipWithIndex.map { case (wm, i) => (s"q", i.toLong, wm) }
      .toDF("query_id", "batch_id", "watermark")
      .withColumn("recorded_at",
        timestamp_millis(lit(System.currentTimeMillis() - ageMs)))
      .write.mode("overwrite").parquet(progressOf(sinks))
    sinks
  }

  private def progressOf(sinks: IngestPipeline.Sinks): String =
    sinks.stats.stripSuffix("/stats") + "/progress"

  test("a healthy deployment goes green on all four probes") {
    val sinks = healthyLayout(tmp())
    val checks = HealthCheck.forTopic(spark, "orders", sinks,
      maxAgeMs = 3600000L, nowMs = System.currentTimeMillis(),
      progressPath = Some(progressOf(sinks)))
    assert(checks.map(_.name) === Seq("sink_readable", "checkpoint_present",
      "stats_fresh", "watermark_advancing"))
    assert(checks.forall(_.ok), checks.filterNot(_.ok).mkString("; "))
    assert(HealthCheck.healthy(checks))
  }

  test("a missing or corrupt sink turns sink_readable red") {
    val sinks = healthyLayout(tmp())
    val missing = HealthCheck.sinkReadable(spark, "orders", sinks.raw + "_nope")
    assert(!missing.ok && missing.detail.contains("no sink"))
    // Corrupt the sink: replace its files with a junk .parquet.
    val fs = new org.apache.hadoop.fs.Path(sinks.raw)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(sinks.raw), true)
    Files.createDirectories(Paths.get(sinks.raw))
    Files.write(Paths.get(sinks.raw, "part-00000.parquet"), "not parquet".getBytes)
    val corrupt = HealthCheck.sinkReadable(spark, "orders", sinks.raw)
    assert(!corrupt.ok && corrupt.detail.startsWith("unreadable"))
    assert(!HealthCheck.healthy(HealthCheck.forTopic(spark, "orders", sinks,
      3600000L, System.currentTimeMillis())))
  }

  test("sink_readable is a bounded existence probe, not a table scan") {
    val sinks = healthyLayout(tmp())
    val green = HealthCheck.sinkReadable(spark, "orders", sinks.raw)
    // The liveness probe must stay O(1) at any sink size: no row count in
    // the detail (computing one costs a full scan per health poll).
    assert(green.ok && !green.detail.matches(".*rows=\\d+.*"), green.detail)
    // An existing-but-empty sink means nothing landed — red, same as an
    // absent sink.
    val fs = new org.apache.hadoop.fs.Path(sinks.raw)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(sinks.raw), true)
    spark.range(10).toDF("id").filter("id < 0").write.parquet(sinks.raw)
    val empty = HealthCheck.sinkReadable(spark, "orders", sinks.raw)
    assert(!empty.ok && empty.detail.contains("empty"), empty.detail)
  }

  test("a mid-rotation sink (only .bak present) is still healthy") {
    val sinks = healthyLayout(tmp())
    val fs = new org.apache.hadoop.fs.Path(sinks.raw)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.rename(new org.apache.hadoop.fs.Path(sinks.raw),
      new org.apache.hadoop.fs.Path(sinks.raw + ".bak"))
    val c = HealthCheck.sinkReadable(spark, "orders", sinks.raw)
    assert(c.ok, c.detail)
  }

  test("an uncommitted checkpoint (offsets but no commits) is a crash loop, not health") {
    val sinks = healthyLayout(tmp())
    Files.delete(Paths.get(sinks.checkpoint, "commits", "0"))
    val c = HealthCheck.checkpointPresent(spark, "orders", sinks.checkpoint)
    assert(!c.ok && c.detail === "offsets=1 commits=0")
    val absent = HealthCheck.checkpointPresent(spark, "orders", sinks.checkpoint + "_nope")
    assert(!absent.ok)
  }

  test("a regressing or empty watermark turns watermark_advancing red") {
    val regress = healthyLayout(tmp(),
      wms = Seq("2026-01-01T11:00:00.000Z", "2026-01-01T10:00:00.000Z"))
    val c1 = HealthCheck.watermarkAdvancing(spark, "orders", progressOf(regress))
    assert(!c1.ok, c1.detail)
    val empty = healthyLayout(tmp(), wms = Seq("2026-01-01T10:00:00.000Z", ""))
    val c2 = HealthCheck.watermarkAdvancing(spark, "orders", progressOf(empty))
    assert(!c2.ok, c2.detail)
    // A held (equal) watermark is monotone — no data is not unhealthy.
    val held = healthyLayout(tmp(),
      wms = Seq("2026-01-01T10:00:00.000Z", "2026-01-01T10:00:00.000Z"))
    assert(HealthCheck.watermarkAdvancing(spark, "orders", progressOf(held)).ok)
  }

  test("stale stats turn stats_fresh red; fresh stats stay green") {
    val stale = healthyLayout(tmp(), ageMs = 7200000L)
    val now = System.currentTimeMillis()
    assert(!HealthCheck.statsFresh(spark, "orders", stale.stats, 3600000L, now).ok)
    val fresh = healthyLayout(tmp(), ageMs = 0L)
    assert(HealthCheck.statsFresh(spark, "orders", fresh.stats, 3600000L, now).ok)
    assert(!HealthCheck.statsFresh(spark, "orders", fresh.stats + "_nope",
      3600000L, now).ok)
  }

  test("a REAL ingest deployment (produce -> IngestPipeline) probes green end-to-end") {
    val base = Files.createTempDirectory("graft_health_e2e_").toString
    val settings = Settings.Defaults.copy(
      corruptionEnabled = false, topicPartitions = 2, sinkBase = base)
    Produce.run(spark, settings,
      Produce.Args(products = 5, customers = 1, orders = 1, events = 1,
        seed = Some(17L)), s"$base/topics")
    streaming.IngestPipeline.start(spark, settings, Schemas.productsDesc)
      .awaitTermination()
    val checks = HealthCheck.forTopic(spark, settings.productTopic,
      settings.sinksFor(settings.productTopic),
      maxAgeMs = 3600000L, nowMs = System.currentTimeMillis())
    assert(checks.map(_.name) ===
      Seq("sink_readable", "checkpoint_present", "stats_fresh"))
    assert(HealthCheck.healthy(checks), checks.filterNot(_.ok).mkString("; "))
    // The never-ingested events topic probes red on the same deployment.
    val red = HealthCheck.forTopic(spark, settings.eventTopic,
      settings.sinksFor(settings.eventTopic),
      maxAgeMs = 3600000L, nowMs = System.currentTimeMillis())
    assert(!HealthCheck.healthy(red))
  }

  test("watermark probe goes green on a REAL watermarked stream's progress table") {
    import org.apache.spark.sql.types._
    val in = tmp()
    val progress = s"${tmp()}/progress"
    val listener = streaming.Monitoring.attach(spark, progress)
    try {
      def write(name: String, lines: Seq[String]): Unit = {
        Files.write(Paths.get(in, name), String.join("\n", lines: _*).getBytes)
        Thread.sleep(1200)
      }
      write("f1.json", Seq("""{"user_id":"a","ts":"2026-01-01T10:00:00Z"}"""))
      write("f2.json", Seq("""{"user_id":"a","ts":"2026-01-01T12:00:00Z"}"""))
      val schema = StructType(Seq(StructField("user_id", StringType),
        StructField("ts", TimestampType)))
      val q = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).json(in)
        .withWatermark("ts", "10 minutes")
        .groupBy(org.apache.spark.sql.functions.window(
          org.apache.spark.sql.functions.col("ts"), "1 hour"))
        .count()
        .writeStream.format("memory").queryName("health_wm")
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination()
      // Listener delivery is async; wait for >= 2 progress rows of THIS
      // query, then probe a frame isolated to it (the session listener
      // also records any concurrently-running suite's queries).
      val mine = s"${tmp()}/progress_mine"
      var n = 0L
      val deadline = System.nanoTime() + 30L * 1000000000L
      while (n < 2 && System.nanoTime() < deadline) {
        Thread.sleep(500)
        n = try spark.read.parquet(progress)
          .filter(col("query_id") === q.id.toString).count()
        catch { case _: Throwable => 0L }
      }
      assert(n >= 2, s"expected >= 2 progress rows for the query, got $n")
      spark.read.parquet(progress).filter(col("query_id") === q.id.toString)
        .write.parquet(mine)
      val c = HealthCheck.watermarkAdvancing(spark, "events", mine)
      assert(c.ok, c.detail)
      assert(c.detail.contains("latest=2026-01-01"), // watermark really advanced
        s"watermark never advanced past epoch: ${c.detail}")
    } finally spark.streams.removeListener(listener)
  }

  test("healthy() requires every probe green and at least one probe") {
    assert(!HealthCheck.healthy(Seq.empty))
    val sinks = healthyLayout(tmp())
    val checks = HealthCheck.forTopic(spark, "orders", sinks,
      3600000L, System.currentTimeMillis())
    assert(HealthCheck.healthy(checks))
    assert(!HealthCheck.healthy(checks :+
      HealthCheck.Check("orders", "sink_readable", ok = false, "x")))
  }
}
