package graft

import java.nio.file.{Files, Paths}

import graft.streaming.StreamingRange
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream range join (Spark's built-in time-interval join) —
  * pinned against the batch bucketed range join on the same events. */
class StreamingRangeSpec extends AnyFunSuite {

  private lazy val spark = Session.get()

  private val schema = StructType(Seq(
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("event_id", LongType), StructField("ts_us", LongType),
    StructField("ts", TimestampType)))

  /** sf0.001 view/purchase events as time-ordered JSON batch files. */
  private def dumpEvents(nSplits: Int): String = {
    val rows = Tables.events(spark, "/root/testdata/sf0.001")
      .filter(col("event_type").isin("view", "purchase"))
      .select("user_id", "event_type", "event_id", "ts_us")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._4)
    val in = Files.createTempDirectory("graft_srange_").toString
    val per = math.ceil(rows.length.toDouble / nSplits).toInt
    for ((chunk, i) <- rows.grouped(per).zipWithIndex) {
      val lines = chunk.map { case (u, tpe, id, us) =>
        val iso = java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)
        s"""{"user_id":$u,"event_type":"$tpe","event_id":$id,"ts_us":$us,"ts":"$iso"}"""
      }
      Files.write(Paths.get(in, f"f$i%03d.json"), String.join("\n", lines: _*).getBytes)
      Thread.sleep(1200)
    }
    in
  }

  test("a fractional-second window keeps its sub-second pairs (the coarse " +
      "state bound rounds UP; truncation would drop lag in [1.0s, 1.5s))") {
    val winUs = 1500000L // 1.5 s
    val base = 1700000000000000L // epoch µs
    val rows = Seq(
      (1L, "view", 1L, base),
      (1L, "purchase", 2L, base + 300000L),  // 0.3 s  — in window
      (1L, "purchase", 3L, base + 1200000L), // 1.2 s  — in window, above 1 s
      (1L, "purchase", 4L, base + 1400000L), // 1.4 s  — in window, above 1 s
      (1L, "purchase", 5L, base + 1800000L)) // 1.8 s  — outside
    val in = Files.createTempDirectory("graft_srange_frac_").toString
    val lines = rows.map { case (u, tpe, id, us) =>
      val iso = java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)
      s"""{"user_id":$u,"event_type":"$tpe","event_id":$id,"ts_us":$us,"ts":"$iso"}"""
    }
    Files.write(Paths.get(in, "f0.json"), String.join("\n", lines: _*).getBytes)
    def side(tpe: String) = spark.readStream.schema(schema).json(in)
      .filter(col("event_type") === tpe)
    val q = StreamingRange.pairs(side("view"), side("purchase"),
        delay = "1 minute", windowUs = winUs)
      .writeStream.format("memory").queryName("srange_frac")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("srange_frac").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L), (1L, 3L), (1L, 4L)))
    intercept[IllegalArgumentException](
      StreamingRange.pairs(side("view"), side("purchase"), "1 minute", 0L))
  }

  test("stream-stream interval join emits exactly the batch j10 pair set") {
    val winUs = 4L * 3600 * 1000000
    val in = dumpEvents(nSplits = 3)
    def side(tpe: String) = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
      .filter(col("event_type") === tpe)
    val q = StreamingRange.pairs(side("view"), side("purchase"),
        delay = "10 minutes", windowUs = winUs)
      .writeStream.format("memory").queryName("srange")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val streamed = spark.table("srange").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted

    // batch reference: the naive pair set under the same window
    val e = Tables.events(spark, "/root/testdata/sf0.001")
    val v = e.filter(col("event_type") === "view")
      .select(col("user_id").as("vk"), col("ts_us").as("vt"), col("event_id").as("vid"))
    val p = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("pk"), col("ts_us").as("pt"), col("event_id").as("pid"))
    val batch = v.join(p,
        col("vk") === col("pk") &&
          col("pt") >= col("vt") && col("pt") < col("vt") + lit(winUs))
      .select(col("vid"), col("pid"), expr("(pt - vt) div 1000000").as("lag_sec"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sorted

    assert(streamed.nonEmpty)
    assert(streamed === batch)
    // and the batch j10 aggregate agrees with this pair set
    val j10 = operators.TemporalJoinQueries.j10.fn(spark, "/root/testdata/sf0.001")
      .collect()(0)
    assert(j10.getAs[Long]("n_pairs") === streamed.length.toLong)
    assert(j10.getAs[Long]("sum_lag_sec") === streamed.map(_._3).sum)
  }
}
