package graft

import java.nio.file.{Files, Paths}

import graft.streaming.StreamingDecontam
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming decontamination screen: incoming docs exploded to hashed
  * 5-grams map-side and semi-joined against the batch-built holdout
  * gram index — the ingest-side gate of batch L25. */
class StreamingDecontamSpec extends AnyFunSuite {

  private lazy val spark = Session.get()

  private val schema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  private val holdoutText = "the benchmark answer to question seven is " +
    "forty two according to the official eval rubric"

  private def holdout = {
    import spark.implicits._
    Seq((900L, holdoutText),
        (901L, "unrelated holdout prose about marble statues and tide tables"))
      .toDF("doc_id", "text")
  }

  test("a doc quoting a holdout 5-gram is flagged exactly once; clean and " +
      "sub-5-token docs are admissible") {
    val in = Files.createTempDirectory("graft_sdecontam_").toString
    // Doc 1 quotes 6+ consecutive holdout tokens (several overlapping
    // 5-grams — the within-watermark dedup must collapse them to one
    // row); doc 2 shares words but never 5 consecutive; doc 3 is below
    // the gram width.
    Files.write(Paths.get(in, "f1.json"), String.join("\n",
      """{"doc_id":1,"text":"leaked: the benchmark answer to question seven is forty two","ts":"2026-01-01T10:00:00Z"}""",
      """{"doc_id":2,"text":"the answer to everything is complicated says the rubric","ts":"2026-01-01T10:00:01Z"}""",
      """{"doc_id":3,"text":"four short tokens here","ts":"2026-01-01T10:00:02Z"}""").getBytes)

    val idx = StreamingDecontam.buildIndex(holdout)
    val q = StreamingDecontam.screen(
      spark.readStream.schema(schema).json(in), idx, "ts", "10 minutes")
      .writeStream.format("memory").queryName("sdecontam")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val rows = spark.table("sdecontam").collect()
    assert(rows.length === 1, s"got ${rows.mkString("; ")}")
    assert(rows(0).getAs[Long]("doc_id") === 1L)
  }

  test("a persisted index screens identically to the in-memory one") {
    val base = Files.createTempDirectory("graft_sdecontam_idx_").toString
    StreamingDecontam.writeIndex(StreamingDecontam.buildIndex(holdout), base)
    val idx = StreamingDecontam.readIndex(spark, base)

    val in = Files.createTempDirectory("graft_sdecontam_pidx_").toString
    Files.write(Paths.get(in, "f1.json"),
      """{"doc_id":7,"text":"quoting the benchmark answer to question seven is forty","ts":"2026-01-01T10:00:00Z"}""".getBytes)
    val q = StreamingDecontam.screen(
      spark.readStream.schema(schema).json(in), idx, "ts", "10 minutes")
      .writeStream.format("memory").queryName("sdecontam_pidx")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val rows = spark.table("sdecontam_pidx").collect()
    assert(rows.length === 1 && rows(0).getAs[Long]("doc_id") === 7L,
      s"got ${rows.mkString("; ")}")
  }

  test("sf0.001: the streamed screen flags EXACTLY batch l25's contaminated " +
      "doc set when fed the same train/test split") {
    // The batch gate and the streaming gate share docGrams, so on
    // identical inputs the flagged WHICH-docs sets must be equal — not
    // merely the same size.
    val sf = "/root/testdata/sf0.001"
    val labeled = graft.operators.SamplingQueries.splitLabeled(spark, sf)
    val idx = StreamingDecontam.buildIndex(
      labeled.filter(col("split") === "test").select("doc_id", "text"))

    // batch truth: distinct contaminated train doc ids (the WHICH set
    // behind l25's per-lang doc_id_sum checksum)
    val batchFlagged = graft.operators.SamplingQueries
      .docGrams(labeled.filter(col("split") === "train"),
        Seq("doc_id"), hashed = true)
      .join(graft.operators.SamplingQueries
        .docGrams(labeled.filter(col("split") === "test"), Nil, hashed = true)
        .select("gram").distinct(), Seq("gram"), "left_semi")
      .select("doc_id").distinct()
      .collect().map(_.getLong(0)).toSet

    val train = labeled.filter(col("split") === "train")
      .select("doc_id", "text").collect()
    // precondition, not a silent escape: the synthetic corpus is
    // JSON-safe, so the JSONL round-trip feeds the stream the EXACT
    // batch text (an escaped text would diverge the two gram sets)
    assert(train.forall(r =>
      !r.getString(1).exists(c => c == '"' || c == '\\' || c == '\n')))
    val lines = train.map { r =>
      s"""{"doc_id":${r.getLong(0)},"text":"${r.getString(1)}","ts":"2026-01-01T10:00:00Z"}"""
    }
    val in = Files.createTempDirectory("graft_sdecontam_sf_").toString
    Files.write(Paths.get(in, "f1.json"), String.join("\n", lines: _*).getBytes)

    val q = StreamingDecontam.screen(
      spark.readStream.schema(schema).json(in), idx, "ts", "10 minutes")
      .writeStream.format("memory").queryName("sdecontam_sf")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val streamFlagged = spark.table("sdecontam_sf").collect()
      .map(_.getAs[Long]("doc_id")).toSet
    assert(streamFlagged === batchFlagged,
      s"stream-only: ${streamFlagged -- batchFlagged}; " +
        s"batch-only: ${batchFlagged -- streamFlagged}")
    assert(batchFlagged.nonEmpty, "vacuous corpus: no contamination planted")
  }
}
