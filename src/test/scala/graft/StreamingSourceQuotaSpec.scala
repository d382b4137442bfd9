package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.streaming.StreamingSourceQuota
import graft.streaming.StreamingSourceQuota.{QuotaDecision, QuotaDoc}
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Per-source streaming quotas: the admitted count survives across
  * microbatches, rows past the cap are labeled (never dropped), and the
  * within-batch fold is (ts, doc_id)-ordered so replays admit the same
  * prefix. */
class StreamingSourceQuotaSpec extends AnyFunSuite {

  private lazy val spark = Session.get()

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType),
    StructField("ts", TimestampType)))

  private def write(dir: String, name: String, lines: Seq[String]): Unit = {
    Files.write(Paths.get(dir, name), String.join("\n", lines: _*).getBytes)
    Thread.sleep(1200)
  }

  test("fold admits the (ts, doc_id)-ordered prefix up to the cap, " +
      "regardless of arrival order") {
    def d(id: Long, t: Long) = QuotaDoc(id, "s", new Timestamp(t))
    // arrival order scrambled; event order is 1,2,3,4
    val rows = Seq(d(3, 3000), d(1, 1000), d(4, 4000), d(2, 2000))
    val (n, out) = StreamingSourceQuota.fold(cap = 2, prior = 0, rows)
    assert(n === 2)
    assert(out.filter(_.admitted).map(_.doc_id) === Seq(1L, 2L))
    assert(out.filterNot(_.admitted).map(_.doc_id) === Seq(3L, 4L))
    // a prior count consumes quota first
    val (n2, out2) = StreamingSourceQuota.fold(cap = 2, prior = 1, rows)
    assert(n2 === 2 && out2.count(_.admitted) === 1)
    assert(out2.find(_.admitted).get.doc_id === 1L)
  }

  test("quota state survives microbatches: a source exhausted in batch 0 " +
      "admits nothing in batch 1, an under-quota source keeps admitting") {
    val in = Files.createTempDirectory("graft_quota_").toString
    // batch 0: srcA sends 3 (cap 2 → first two admitted), srcB sends 1
    write(in, "f1.json", Seq(
      """{"doc_id":1,"source":"srcA","ts":"2026-01-01T10:00:00Z"}""",
      """{"doc_id":2,"source":"srcA","ts":"2026-01-01T10:00:01Z"}""",
      """{"doc_id":3,"source":"srcA","ts":"2026-01-01T10:00:02Z"}""",
      """{"doc_id":4,"source":"srcB","ts":"2026-01-01T10:00:03Z"}"""))
    // batch 1: srcA sends 1 more (over), srcB sends 2 (one admitted)
    write(in, "f2.json", Seq(
      """{"doc_id":5,"source":"srcA","ts":"2026-01-01T10:01:00Z"}""",
      """{"doc_id":6,"source":"srcB","ts":"2026-01-01T10:01:01Z"}""",
      """{"doc_id":7,"source":"srcB","ts":"2026-01-01T10:01:02Z"}"""))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
    val q = StreamingSourceQuota.label(stream, cap = 2)
      .writeStream.format("memory").queryName("quota_gate")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val rows = spark.table("quota_gate").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("admitted")).toMap
    assert(rows.size === 7, "label must emit EVERY row, over-quota included")
    assert(rows(1L) && rows(2L) && !rows(3L), "srcA batch-0 prefix of 2")
    assert(!rows(5L), "srcA stayed exhausted across the batch boundary")
    assert(rows(4L), "srcB batch 0")
    assert(rows(6L) && !rows(7L), "srcB's second admit lands in batch 1, " +
      "its third hits the cap")
  }
}
