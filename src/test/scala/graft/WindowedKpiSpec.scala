package graft

import java.nio.file.{Files, Paths}

import graft.streaming.WindowedKpis
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** T1/T2/T3/T6 — event-time windows, watermark late-data policy, and
  * running counters over the Kafka-shaped file stream. */
class WindowedKpiSpec extends AnyFunSuite {

  private lazy val spark = Session.get()

  private val schema = StructType(Seq(
    StructField("ts", TimestampType), StructField("v", IntegerType),
    StructField("k", StringType)))

  private def writeLines(dir: String, name: String, lines: Seq[String]): Unit = {
    Files.createDirectories(Paths.get(dir))
    Files.write(Paths.get(dir, name), String.join("\n", lines: _*).getBytes)
  }

  test("batch tumbling KPI equals a plain group-by on the same frame (T2)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val kpi = WindowedKpis.tumblingKpi(ev, "ts", "1 hour", "10 minutes", col("value"))
    val direct = ev.groupBy(window(col("ts"), "1 hour")).count()
    assert(kpi.agg(sum("n")).collect()(0).getLong(0) === ev.count())
    assert(kpi.count() === direct.count())
  }

  test("streaming append mode seals windows at the watermark and drops late rows (T3)") {
    val in = Files.createTempDirectory("graft_kpi_").toString
    // Spark tracks two watermark values per batch: late-event filtering
    // uses the PREVIOUS trigger's watermark, eviction the current one —
    // so the late row must arrive two batches after the data that
    // advanced the watermark past it.
    // Batch 0: two rows in the 10:00 window, one at 10:30 → eviction
    // watermark for batch 1 becomes 10:20 (seals 10:00).
    writeLines(in, "f1.json", Seq(
      """{"ts":"2026-01-01T10:00:10Z","v":1,"k":"a"}""",
      """{"ts":"2026-01-01T10:00:20Z","v":2,"k":"a"}""",
      """{"ts":"2026-01-01T10:30:00Z","v":3,"k":"b"}"""))
    Thread.sleep(1200) // distinct mod-times keep file ordering deterministic
    // Batch 1: on-time row; commits 10:20 as the late-event bar for batch 2.
    writeLines(in, "f2.json", Seq("""{"ts":"2026-01-01T10:31:00Z","v":7,"k":"d"}"""))
    Thread.sleep(1200)
    // Batch 2: one LATE row for 10:00 (< 10:20 bar → dropped) and one at
    // 11:00 advancing the watermark past the 10:30/10:31 windows.
    writeLines(in, "f3.json", Seq(
      """{"ts":"2026-01-01T10:00:30Z","v":100,"k":"late"}""",
      """{"ts":"2026-01-01T11:00:00Z","v":4,"k":"c"}"""))

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
    val kpi = WindowedKpis.tumblingKpi(stream, "ts", "1 minute", "10 minutes", col("v"))
    val q = kpi.writeStream.format("memory").queryName("kpi_t3")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val rows = spark.table("kpi_t3")
      .select(date_format(col("window_start"), "HH:mm").as("w"), col("n"), col("total"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
    // Each sealed window emits exactly once (a non-dropped late row would
    // re-open 10:00 and emit a duplicate).
    assert(rows.map(_._1).distinct.length === rows.length, s"duplicate windows: ${rows.toSeq}")
    val sealedWins = rows.toMap
    // 10:00 sealed with ONLY the two on-time rows (late v=100 dropped).
    assert(sealedWins.get("10:00").contains((2L, 3L)), s"got $sealedWins")
    // 10:30/10:31 sealed once the watermark passed them.
    assert(sealedWins.get("10:30").contains((1L, 3L)), s"got $sealedWins")
    assert(sealedWins.get("10:31").contains((1L, 7L)), s"got $sealedWins")
    // 11:00 never sealed (watermark never passed it) → absent in append mode.
    assert(!sealedWins.contains("11:00"), s"got $sealedWins")
  }

  test("running counters in update mode track per-key counts (T6)") {
    val in = Files.createTempDirectory("graft_t6_").toString
    writeLines(in, "f1.json", Seq(
      """{"ts":"2026-01-01T10:00:10Z","v":1,"k":"x"}""",
      """{"ts":"2026-01-01T10:00:20Z","v":2,"k":"x"}""",
      """{"ts":"2026-01-01T10:00:30Z","v":3,"k":"y"}"""))
    val stream = spark.readStream.schema(schema).json(in)
    val q = WindowedKpis.runningCounters(stream, "k")
      .writeStream.format("memory").queryName("t6_counters")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val counts = spark.table("t6_counters").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts === Map("x" -> 2L, "y" -> 1L))
  }

  test("event-time vs processing-time columns coexist (T1)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001").limit(5)
    val stamped = WindowedKpis.withProcessingTime(ev)
    assert(stamped.columns.contains("consumed_at"))
    assert(stamped.filter(col("consumed_at").isNull).count() === 0)
    // Event time stays untouched.
    assert(stamped.select("ts").collect().toSeq ===
      ev.select("ts").collect().toSeq)
  }

  test("session_window groups events by inactivity gap (streaming form of W5)") {
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val sess = WindowedKpis.sessions(ev, "ts", "user_id", "30 minutes", "1 hour")
    assert(sess.agg(sum("n_events")).collect()(0).getLong(0) === ev.count())
    // Batch-mode W5 and session_window count the same sessions.
    val w5Sessions = operators.WindowQueries.w5.fn(spark, "/root/testdata/sf0.001")
      .collect()(0).getAs[Long]("n_sessions")
    assert(sess.count() === w5Sessions)
  }
}
