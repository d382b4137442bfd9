package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.streaming.StreamingAsOf
import graft.streaming.StreamingAsOf.{Attribution, FunnelEvent, ViewState}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming as-of enrichment: the stream analog of batch j9. Pins the
  * agreement contract (streamed attributions == the batch as-of join on
  * the same events, including across a batch split) and the bounded-state
  * trade (TTL eviction makes a later purchase unattributed). */
class StreamingAsOfSpec extends AnyFunSuite {

  private lazy val spark = Session.get()

  private def tsOf(us: Long): Timestamp =
    Timestamp.from(java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L))

  private def ev(tpe: String, id: Long, us: Long, user: Long = 1L): FunnelEvent =
    FunnelEvent(user, tpe, id, us, tsOf(us))

  // ------------------------------------------------------- foldEmit unit

  test("foldEmit: purchase before any view is unattributed; view at the same " +
      "timestamp attributes (at-or-before inclusive)") {
    val (out1, _) = StreamingAsOf.foldEmit(Seq(ev("purchase", 5, 100)), None)
    assert(out1 === Seq(Attribution(5, -1, -1)))
    // same ts_us: the view sorts first and attributes the purchase
    val (out2, st2) = StreamingAsOf.foldEmit(
      Seq(ev("purchase", 5, 100), ev("view", 4, 100)), None)
    assert(out2 === Seq(Attribution(5, 4, 0)))
    assert(st2 === Some(ViewState(4, 100)))
  }

  test("foldEmit: arrival order inside a batch is irrelevant — event time decides") {
    val events = Seq(
      ev("view", 1, 1000000), ev("purchase", 2, 2000000),
      ev("view", 3, 3000000), ev("purchase", 4, 9000000))
    val expected = Seq(Attribution(2, 1, 1), Attribution(4, 3, 6))
    for (perm <- events.permutations.take(24)) {
      val (out, st) = StreamingAsOf.foldEmit(perm, None)
      assert(out === expected, s"order-dependent fold for $perm")
      assert(st === Some(ViewState(3, 3000000)))
    }
  }

  test("foldEmit: a stale view never regresses the as-of pointer") {
    val prior = Some(ViewState(10, 5000000))
    val (out, st) = StreamingAsOf.foldEmit(
      Seq(ev("view", 1, 1000000), ev("purchase", 7, 6000000)), prior)
    assert(st === prior) // older view ignored
    assert(out === Seq(Attribution(7, 10, 1)))
  }

  test("property: folding time-split batches with carried state equals one fold, " +
      "and attributions equal the brute-force argmax") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val eventGen: Gen[(String, Long)] = for {
      tpe <- Gen.oneOf("view", "purchase", "view", "purchase", "click")
      us <- Gen.choose(0L, 50L) // tight range → frequent timestamp ties
    } yield (tpe, us * 1000000)
    val p = Prop.forAll(Gen.listOfN(14, eventGen), Gen.choose(0, 14)) { (raw, cut) =>
      // distinct event ids; ties in ts remain (the interesting case)
      val events = raw.zipWithIndex.map { case ((tpe, us), i) =>
        ev(tpe, 100 + i, us)
      }
      val (outOne, stOne) = StreamingAsOf.foldEmit(events, None)
      // batches split by EVENT TIME (in-order arrival across batches,
      // the contract's premise), folded with carried state
      val ordered = events.sortBy(e => (e.ts_us, e.event_type == "purchase", e.event_id))
      val (b1, b2) = ordered.splitAt(math.min(cut, ordered.length))
      val (o1, s1) = StreamingAsOf.foldEmit(b1, None)
      val (o2, s2) = StreamingAsOf.foldEmit(b2, s1)
      val splitEqualsOne = (o1 ++ o2).sortBy(_.purchase_id) ==
        outOne.sortBy(_.purchase_id) && s2 == stOne
      // brute-force reference: argmax (vt, vid) among views at-or-before
      val views = events.filter(_.event_type == "view")
      val brute = events.filter(_.event_type == "purchase").map { pe =>
        val cands = views.filter(v => v.ts_us < pe.ts_us ||
          (v.ts_us == pe.ts_us)) // views sort before purchases at equal ts
        if (cands.isEmpty) Attribution(pe.event_id, -1, -1)
        else {
          val best = cands.maxBy(v => (v.ts_us, v.event_id))
          Attribution(pe.event_id, best.event_id,
            (pe.ts_us - best.ts_us) / 1000000L)
        }
      }
      splitEqualsOne &&
        outOne.sortBy(_.purchase_id) == brute.sortBy(_.purchase_id)
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(300).withWorkers(1), p)
    assert(res.passed, res.toString)
  }

  // ------------------------------------------------------------- e2e

  /** Dump the sf0.001 view/purchase events as time-split JSON batch
    * files and stream them through `attributions`. */
  private def streamTable(queryName: String, nSplits: Int): Unit = {
    val sf = "/root/testdata/sf0.001"
    val rows = Tables.events(spark, sf)
      .filter(col("event_type").isin("view", "purchase"))
      .select("user_id", "event_type", "event_id", "ts_us")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._4)
    val in = Files.createTempDirectory(s"graft_sasof_$queryName").toString
    val per = math.ceil(rows.length.toDouble / nSplits).toInt
    for ((chunk, i) <- rows.grouped(per).zipWithIndex) {
      val lines = chunk.map { case (u, tpe, id, us) =>
        val iso = java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)
        s"""{"user_id":$u,"event_type":"$tpe","event_id":$id,"ts_us":$us,"ts":"$iso"}"""
      }
      Files.write(Paths.get(in, f"f$i%03d.json"), String.join("\n", lines: _*).getBytes)
      Thread.sleep(1200) // distinct mod-times keep file order = time order
    }
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("ts", TimestampType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
      .withWatermark("ts", "5 minutes")
    import spark.implicits._
    val q = StreamingAsOf.attributions(stream.as[FunnelEvent], ttlMs = Long.MaxValue / 4)
      .writeStream.format("memory").queryName(queryName)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  private def batchJ9(): Seq[(Long, Long, Long)] =
    operators.TemporalJoinQueries.j9.fn(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

  test("streamed attributions equal batch j9 on the same events (single batch)") {
    streamTable("sasof_one", nSplits = 1)
    val got = spark.table("sasof_one").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(got === batchJ9())
  }

  test("streamed attributions equal batch j9 across a time-split batch " +
      "boundary (state carries the as-of pointer)") {
    streamTable("sasof_split", nSplits = 3)
    val got = spark.table("sasof_split").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._1)
    assert(got === batchJ9())
  }

  test("TTL eviction: a purchase after the user's state expired is unattributed") {
    val in = Files.createTempDirectory("graft_sasof_ttl").toString
    def write(name: String, lines: Seq[String]): Unit = {
      Files.write(Paths.get(in, name), String.join("\n", lines: _*).getBytes)
      Thread.sleep(1200)
    }
    def line(u: Long, tpe: String, id: Long, iso: String): String = {
      val us = java.time.Instant.parse(iso).toEpochMilli * 1000L
      s"""{"user_id":$u,"event_type":"$tpe","event_id":$id,"ts_us":$us,"ts":"$iso"}"""
    }
    // Batch 0: user 1 views at 10:00 (TTL 10 min → evictable once the
    // watermark passes 10:10). Batches 1-2: unrelated traffic advances
    // the watermark past the deadline (one batch of lag, as in
    // StreamingDedupSpec). Batch 3: user 1 purchases at 11:05 — state
    // is gone, so the purchase is unattributed; user 2's fresh
    // view→purchase in the same batch still attributes.
    write("f1.json", Seq(line(1, "view", 10, "2026-01-01T10:00:00Z")))
    write("f2.json", Seq(line(2, "view", 20, "2026-01-01T11:00:00Z")))
    write("f3.json", Seq(line(2, "view", 21, "2026-01-01T11:01:00Z")))
    write("f4.json", Seq(
      line(1, "purchase", 11, "2026-01-01T11:05:00Z"),
      line(2, "purchase", 22, "2026-01-01T11:05:00Z")))
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("event_id", LongType), StructField("ts_us", LongType),
      StructField("ts", TimestampType)))
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
      .withWatermark("ts", "5 minutes")
    import spark.implicits._
    val q = StreamingAsOf.attributions(stream.as[FunnelEvent], ttlMs = 10 * 60 * 1000L)
      .writeStream.format("memory").queryName("sasof_ttl")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val got = spark.table("sasof_ttl").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(11L) === -1L, s"expected evicted state → -1, got $got")
    assert(got(22L) === 21L, s"fresh state must still attribute, got $got")
  }
}
