package graft

import java.nio.file.{Files, Paths}
import java.sql.Timestamp

import graft.streaming.Stateful
import graft.streaming.Stateful.{CartEvent, CartState}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Custom keyed state (`flatMapGroupsWithState`) — cart-abandonment
  * detection driven by event-time timeouts. */
class StatefulSpec extends AnyFunSuite {

  private lazy val spark = Session.get()

  private def ts(s: String) = Timestamp.from(java.time.Instant.parse(s))

  test("fold: purchase clears only the adds that precede it (event-time order)") {
    val add1 = CartEvent("a", "add_to_cart", ts("2026-01-01T10:00:00Z"))
    val buy  = CartEvent("a", "purchase", ts("2026-01-01T10:05:00Z"))
    val add2 = CartEvent("a", "add_to_cart", ts("2026-01-01T10:10:00Z"))
    // Arrival order scrambled; event-time order is add1, buy, add2.
    assert(Stateful.fold(Seq(add2, buy, add1), None) ===
      Some(CartState(1, ts("2026-01-01T10:10:00Z").getTime)))
    assert(Stateful.fold(Seq(buy, add1), None) === None)
    assert(Stateful.fold(Seq(buy), Some(CartState(3, 0L))) === None)
    // Non-cart events leave state untouched.
    assert(Stateful.fold(Seq(CartEvent("a", "page_view", ts("2026-01-01T11:00:00Z"))),
      Some(CartState(2, 5L))) === Some(CartState(2, 5L)))
  }

  test("property: fold is insensitive to arrival order (event time decides)") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val eventGen: Gen[CartEvent] = for {
      tpe <- Gen.oneOf("add_to_cart", "purchase", "page_view")
      sec <- Gen.choose(0L, 100000L)
    } yield CartEvent("u", tpe, new Timestamp(1767225600000L + sec * 1000))
    val p = Prop.forAll(Gen.listOfN(12, eventGen)) { events =>
      // Distinct timestamps make event-time order total, so any arrival
      // permutation must fold to the same state.
      val distinct = events.zipWithIndex
        .map { case (e, i) => e.copy(ts = new Timestamp(e.ts.getTime + i)) }
      val shuffled = scala.util.Random.javaRandomToRandom(
        new java.util.Random(distinct.hashCode.toLong)).shuffle(distinct)
      Stateful.fold(shuffled, None) == Stateful.fold(distinct, None)
    }
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(200).withWorkers(1), p)
    assert(res.passed, res.toString)
  }

  test("abandonment fires on watermark timeout; purchasers never fire") {
    val in = Files.createTempDirectory("graft_cart_").toString
    def write(name: String, lines: Seq[String]): Unit = {
      Files.write(Paths.get(in, name), String.join("\n", lines: _*).getBytes)
      Thread.sleep(1200) // distinct mod-times keep file order deterministic
    }
    // Batch 0: A adds (10:00). B adds (10:01) then purchases (10:05).
    write("f1.json", Seq(
      """{"customer_id":"A","event_type":"add_to_cart","ts":"2026-01-01T10:00:00Z"}""",
      """{"customer_id":"B","event_type":"add_to_cart","ts":"2026-01-01T10:01:00Z"}""",
      """{"customer_id":"B","event_type":"purchase","ts":"2026-01-01T10:05:00Z"}"""))
    // Batch 1: unrelated traffic at 11:00 — its event time (minus the
    // 10-minute delay) becomes the watermark for batch 2.
    write("f2.json", Seq(
      """{"customer_id":"D","event_type":"page_view","ts":"2026-01-01T11:00:00Z"}"""))
    // Batch 2: traffic at 12:00; processed with watermark 10:50, which is
    // past A's 10:30 deadline (10:00 add + 30 min gap) → A's timeout fires.
    write("f3.json", Seq(
      """{"customer_id":"D","event_type":"page_view","ts":"2026-01-01T12:00:00Z"}"""))

    val schema = StructType(Seq(
      StructField("customer_id", StringType), StructField("event_type", StringType),
      StructField("ts", TimestampType)))
    import spark.implicits._
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
      .withWatermark("ts", "10 minutes")
      .as[CartEvent]
    val out = Stateful.abandonedCarts(stream, gapMs = 30L * 60 * 1000)
    val q = out.writeStream.format("memory").queryName("cart_abandon")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val rows = spark.table("cart_abandon").collect()
    assert(rows.map(_.getAs[String]("customer_id")).toSeq === Seq("A"),
      s"expected exactly A abandoned, got ${rows.mkString(", ")}")
    assert(rows(0).getAs[Int]("n_adds") === 1)
    assert(rows(0).getAs[Timestamp]("last_add") === ts("2026-01-01T10:00:00Z"))
  }

  test("an open-cart event arriving after the watermark crossed its deadline " +
      "does not crash the query (timeout clamped to watermark)") {
    val in = Files.createTempDirectory("graft_cart_clamp_").toString
    def write(name: String, lines: Seq[String]): Unit = {
      Files.write(Paths.get(in, name), String.join("\n", lines: _*).getBytes)
      Thread.sleep(1200)
    }
    // Batch 0: A adds at 10:00 (deadline 10:30), plus traffic at 11:00 so
    // the NEXT batch's watermark (10:50) is already past A's deadline.
    write("f1.json", Seq(
      """{"customer_id":"A","event_type":"add_to_cart","ts":"2026-01-01T10:00:00Z"}""",
      """{"customer_id":"D","event_type":"page_view","ts":"2026-01-01T11:00:00Z"}"""))
    // Batch 1: a page_view for A at 10:55 — fold keeps the open-cart
    // state, and the re-armed timeout (10:30) would be BEHIND the 10:50
    // watermark: unclamped, setTimeoutTimestamp throws and the query
    // dies; clamped, it arms at watermark+1.
    write("f2.json", Seq(
      """{"customer_id":"A","event_type":"page_view","ts":"2026-01-01T10:55:00Z"}"""))
    // Batch 2: traffic at 13:00 advances the watermark past the clamped
    // timeout → A's abandonment fires.
    write("f3.json", Seq(
      """{"customer_id":"D","event_type":"page_view","ts":"2026-01-01T13:00:00Z"}"""))

    val schema = StructType(Seq(
      StructField("customer_id", StringType), StructField("event_type", StringType),
      StructField("ts", TimestampType)))
    import spark.implicits._
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).json(in)
      .withWatermark("ts", "10 minutes")
      .as[CartEvent]
    val out = Stateful.abandonedCarts(stream, gapMs = 30L * 60 * 1000)
    val q = out.writeStream.format("memory").queryName("cart_abandon_clamp")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination() // throws StreamingQueryException on the unclamped path

    val rows = spark.table("cart_abandon_clamp").collect()
    assert(rows.map(_.getAs[String]("customer_id")).toSeq === Seq("A"),
      s"expected exactly A abandoned, got ${rows.mkString(", ")}")
    assert(rows(0).getAs[Int]("n_adds") === 1)
  }
}
