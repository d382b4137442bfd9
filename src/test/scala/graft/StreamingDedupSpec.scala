package graft

import java.nio.file.{Files, Paths}

import graft.streaming.StreamingDedup
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Ingest-time content dedup: the streaming form of L1. Pins BOTH sides
  * of the bounded-state contract — duplicates inside the watermark
  * horizon are dropped, and a copy arriving after state eviction lands
  * again (the documented trade; the batch L1 pass is the historical
  * backstop). */
class StreamingDedupSpec extends AnyFunSuite {

  private lazy val spark = Session.get()

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  /** Write one microbatch file; sleep keeps file order = batch order. */
  private def write(dir: String, name: String, lines: Seq[String]): Unit = {
    Files.write(Paths.get(dir, name), String.join("\n", lines: _*).getBytes)
    Thread.sleep(1200)
  }

  private def run(dir: String, queryName: String,
      dedup: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Unit = {
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(dir)
    val q = dedup(stream)
      .writeStream.format("memory").queryName(queryName)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("duplicates within the watermark horizon land exactly once, " +
      "whitespace/case variants count as the same document") {
    val in = Files.createTempDirectory("graft_sdedup_").toString
    // Batch 0: two distinct docs. Batch 1: doc A again under a new id
    // with case/padding noise (normHash normalizes), plus a new doc.
    write(in, "f1.json", Seq(
      """{"doc_id":1,"text":"alpha beta gamma","ts":"2026-01-01T10:00:00Z"}""",
      """{"doc_id":2,"text":"delta epsilon","ts":"2026-01-01T10:00:10Z"}"""))
    write(in, "f2.json", Seq(
      """{"doc_id":3,"text":"  ALPHA beta GAMMA  ","ts":"2026-01-01T10:01:00Z"}""",
      """{"doc_id":4,"text":"zeta eta","ts":"2026-01-01T10:01:10Z"}"""))
    run(in, "sdedup_within", StreamingDedup.withinWatermark(_, "ts", "10 minutes"))
    val landed = spark.table("sdedup_within").collect()
      .map(r => r.getAs[Long]("doc_id")).sorted.toSeq
    assert(landed === Seq(1L, 2L, 4L),
      s"expected first arrivals only, got $landed")
  }

  test("a copy arriving after watermark eviction lands again (bounded state, " +
      "batch L1 is the historical backstop)") {
    val in = Files.createTempDirectory("graft_sdedup_evict_").toString
    // Batch 0: doc A at 10:00 (delay 10 min → A's state evictable once
    // the watermark passes 10:10). Batch 1: traffic at 11:00 advances
    // the watermark to 10:50 AFTER the batch. Batch 2 runs WITH
    // watermark 10:50 and expires A's state at its end (expired keys
    // are removed after the batch's own rows were dedup-checked — one
    // batch of lag, same dual-watermark shape as late-event filtering).
    // Batch 3: A's copy at 11:05 — state is gone, so it lands again.
    write(in, "f1.json", Seq(
      """{"doc_id":1,"text":"alpha beta gamma","ts":"2026-01-01T10:00:00Z"}"""))
    write(in, "f2.json", Seq(
      """{"doc_id":2,"text":"unrelated traffic","ts":"2026-01-01T11:00:00Z"}"""))
    write(in, "f3.json", Seq(
      """{"doc_id":3,"text":"more traffic","ts":"2026-01-01T11:01:00Z"}"""))
    write(in, "f4.json", Seq(
      """{"doc_id":4,"text":"alpha beta gamma","ts":"2026-01-01T11:05:00Z"}"""))
    run(in, "sdedup_evict", StreamingDedup.withinWatermark(_, "ts", "10 minutes"))
    val landed = spark.table("sdedup_evict").collect()
      .map(r => r.getAs[Long]("doc_id")).sorted.toSeq
    assert(landed === Seq(1L, 2L, 3L, 4L),
      s"post-eviction copy must land again, got $landed")
  }

  test("unbounded variant dedups across any horizon") {
    val in = Files.createTempDirectory("graft_sdedup_unb_").toString
    write(in, "f1.json", Seq(
      """{"doc_id":1,"text":"alpha beta gamma","ts":"2026-01-01T10:00:00Z"}"""))
    write(in, "f2.json", Seq(
      """{"doc_id":2,"text":"unrelated traffic","ts":"2026-01-02T11:00:00Z"}"""))
    write(in, "f3.json", Seq(
      """{"doc_id":3,"text":"alpha beta gamma","ts":"2026-01-03T11:05:00Z"}"""))
    run(in, "sdedup_unb", StreamingDedup.unbounded)
    val landed = spark.table("sdedup_unb").collect()
      .map(r => r.getAs[Long]("doc_id")).sorted.toSeq
    assert(landed === Seq(1L, 2L), s"got $landed")
  }

  test("streaming dedup agrees with batch L1 on the landed corpus") {
    // The shared normHash means: landing a stream through withinWatermark
    // (all inside one horizon) then running L1 over the landed rows must
    // report zero duplicates.
    val in = Files.createTempDirectory("graft_sdedup_l1_").toString
    write(in, "f1.json", Seq(
      """{"doc_id":1,"text":"alpha beta gamma","ts":"2026-01-01T10:00:00Z"}""",
      """{"doc_id":2,"text":"alpha beta gamma","ts":"2026-01-01T10:00:05Z"}""",
      """{"doc_id":3,"text":"delta epsilon","ts":"2026-01-01T10:00:10Z"}"""))
    run(in, "sdedup_l1", StreamingDedup.withinWatermark(_, "ts", "10 minutes"))
    val landed = spark.table("sdedup_l1")
    val nDupes = landed
      .select(graft.operators.LlmQueries.normHash.as("h"))
      .groupBy("h").count().filter(col("count") > 1).count()
    assert(nDupes === 0L)
    assert(landed.count() === 2L)
  }
}
