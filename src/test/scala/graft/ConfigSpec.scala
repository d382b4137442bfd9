package graft

import java.nio.file.Files

import graft.streaming.KafkaShaped
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Settings resolution (env-override matrix, the reference's
  * `test_config.py:10-173` contract) and the producer CLI batch shape
  * (`test_producer_integration.py:133-240`: exact per-entity counts,
  * JSON-parseable payloads, monotone offsets). */
class ConfigSpec extends AnyFunSuite {

  private lazy val spark = Session.get()

  test("settings defaults match the reference's declared values") {
    val s = Settings.fromEnv(Map.empty)
    assert(s === Settings.Defaults)
    assert(s.appEnv === "local")
    assert(s.batchSize === 50)
    assert(s.productTopic === "products")
    assert(s.customerTopic === "customers")
    assert(s.orderTopic === "orders")
    assert(s.eventTopic === "events")
    assert(s.corruptionEnabled)
    assert(s.corruptionPProduct === 0.01)
    assert(s.corruptionPCustomer === 0.02)
    assert(s.corruptionPOrder === 0.03)
    assert(s.corruptionPEvent === 0.04)
  }

  test("every settings field is overridable from the environment") {
    val s = Settings.fromEnv(Map(
      "GRAFT_APP_ENV" -> "prod",
      "GRAFT_SERVICE_NAME" -> "svc",
      "GRAFT_LOG_LEVEL" -> "ERROR",
      "GRAFT_LOG_FORMAT" -> "json",
      "GRAFT_LOG_TO_FILE" -> "true",
      "GRAFT_LOG_FILE" -> "/var/log/graft.log",
      "GRAFT_LOG_FILE_MAX_BYTES" -> "1024",
      "GRAFT_LOG_FILE_BACKUP_COUNT" -> "2",
      "GRAFT_BATCH_SIZE" -> "7",
      "GRAFT_SEED" -> "99",
      "SPARK_GRAFT_SF_DIR" -> "/data/sf1",
      "GRAFT_SINK_BASE" -> "/data/sinks",
      "GRAFT_PRODUCT_TOPIC" -> "p2",
      "GRAFT_CUSTOMER_TOPIC" -> "c2",
      "GRAFT_ORDER_TOPIC" -> "o2",
      "GRAFT_EVENT_TOPIC" -> "e2",
      "GRAFT_TOPIC_PARTITIONS" -> "6",
      "GRAFT_CORRUPTION_ENABLED" -> "false",
      "GRAFT_CORRUPTION_P_PRODUCT" -> "0.5",
      "GRAFT_CORRUPTION_P_CUSTOMER" -> "0.6",
      "GRAFT_CORRUPTION_P_ORDER" -> "0.7",
      "GRAFT_CORRUPTION_P_EVENT" -> "0.8",
      "GRAFT_PRODUCER_MAX_RETRIES" -> "9",
      "GRAFT_PRODUCER_RETRY_BACKOFF_MS" -> "5"))
    assert(s === Settings(
      appEnv = "prod", serviceName = "svc",
      logLevel = "ERROR", logFormat = "json", logToFile = true,
      logFile = "/var/log/graft.log", logFileMaxBytes = 1024L,
      logFileBackups = 2,
      batchSize = 7, seed = 99L, sfDir = "/data/sf1",
      sinkBase = "/data/sinks",
      productTopic = "p2", customerTopic = "c2", orderTopic = "o2",
      eventTopic = "e2", topicPartitions = 6, corruptionEnabled = false,
      corruptionPProduct = 0.5, corruptionPCustomer = 0.6,
      corruptionPOrder = 0.7, corruptionPEvent = 0.8,
      producerMaxRetries = 9, producerRetryBackoffMs = 5L))
  }

  test("malformed numeric/boolean env values fail fast naming the variable") {
    val badInt = intercept[IllegalArgumentException](
      Settings.fromEnv(Map("GRAFT_BATCH_SIZE" -> "lots")))
    assert(badInt.getMessage.contains("GRAFT_BATCH_SIZE"))
    val badBool = intercept[IllegalArgumentException](
      Settings.fromEnv(Map("GRAFT_CORRUPTION_ENABLED" -> "maybe")))
    assert(badBool.getMessage.contains("GRAFT_CORRUPTION_ENABLED"))
  }

  test("corruptionP maps topics to their probabilities and honors the kill switch") {
    val s = Settings.Defaults
    assert(s.corruptionP("products") === 0.01)
    assert(s.corruptionP("events") === 0.04)
    assert(s.corruptionP("unknown-topic") === 0.0)
    val off = s.copy(corruptionEnabled = false)
    assert(off.corruptionP("products") === 0.0)
  }

  test("sinksFor lays out the per-topic sink directories under the base") {
    val sinks = Settings.Defaults.copy(sinkBase = "/x").sinksFor("orders")
    assert(sinks.raw === "/x/orders/raw")
    assert(sinks.normalized === "/x/orders/normalized")
    assert(sinks.rejects === "/x/orders/rejects")
    assert(sinks.checkpoint === "/x/orders/_checkpoint")
  }

  test("producer CLI arg parsing mirrors the reference's argparse surface") {
    assert(Produce.parse(Nil) === Produce.Args())
    val a = Produce.parse(List("--products", "2", "--customers", "1",
      "--orders", "2", "--events", "3", "--seed", "42", "--repeat", "2",
      "--out", "/tmp/x"))
    assert(a === Produce.Args(2, 1, 2, 3, Some(42L), 2, Some("/tmp/x")))
    intercept[IllegalArgumentException](Produce.parse(List("--bogus", "1")))
  }

  test("produce lands the exact 8-message batch with parseable payloads and monotone offsets") {
    // The reference's integration contract: 2 products + 1 customer +
    // 2 orders + 3 events, delivered exactly and JSON-parseable
    // (`test_producer_integration.py:143-147,176-187`).
    val out = Files.createTempDirectory("graft_produce_").toString
    val settings = Settings.Defaults.copy(
      corruptionEnabled = false, topicPartitions = 2, sinkBase = out)
    val a = Produce.Args(products = 2, customers = 1, orders = 2, events = 3,
      seed = Some(42L))
    val m = Produce.run(spark, settings, a, out)
    assert(m.errors === 0)
    assert(m.producedMessages === 8)
    assert(m.producedBytes > 0)
    assert(m.rejects === 0, "uncorrupted batch must validate clean")
    // Per-topic delivery report (reference producer.py:87-103 analog):
    // each entity topic reports its own counters, and they fold to the
    // totals.
    assert(m.byTopic.view.mapValues(_.producedMessages).toMap ===
      Map("products" -> 2L, "customers" -> 1L, "orders" -> 2L, "events" -> 3L))
    assert(m.byTopic.values.map(_.producedBytes).sum === m.producedBytes)
    assert(m.byTopic.values.forall(t => t.errors === 0 && t.retries === 0))

    val counts = Map("products" -> 2L, "customers" -> 1L, "orders" -> 2L,
      "events" -> 3L)
    for ((topic, n) <- counts) {
      val rows = spark.read.schema(KafkaShaped.schema).json(s"$out/$topic")
      assert(rows.count() === n, s"topic $topic")
      assert(rows.filter(col("value").isNull).count() === 0)
      // Offsets are unique per (partition) — the broker-monotone rule.
      assert(rows.select("partition", "offset").distinct().count() === n)
    }
  }

  test("repeat re-produces the batch with offsets that never collide") {
    val out = Files.createTempDirectory("graft_produce_rep_").toString
    val settings = Settings.Defaults.copy(
      corruptionEnabled = false, topicPartitions = 2, sinkBase = out)
    val m = Produce.run(spark, settings,
      Produce.Args(products = 4, customers = 2, orders = 3, events = 5,
        seed = Some(7L), repeat = 2), out)
    assert(m.errors === 0)
    assert(m.producedMessages === 2 * (4 + 2 + 3 + 5))
    val ev = spark.read.schema(KafkaShaped.schema).json(s"$out/events")
    assert(ev.count() === 10)
    assert(ev.select("partition", "offset").distinct().count() === 10,
      "repeated batches must advance the offset base, not reuse it")
  }

  test("settings alone wire the full produce-to-ingest path end-to-end") {
    val base = Files.createTempDirectory("graft_e2e_cfg_").toString
    val settings = Settings.Defaults.copy(
      corruptionEnabled = false, topicPartitions = 2, sinkBase = base)
    val m = Produce.run(spark, settings,
      Produce.Args(products = 6, customers = 2, orders = 2, events = 2,
        seed = Some(5L)), s"$base/topics")
    assert(m.errors === 0)
    streaming.IngestPipeline.start(spark, settings, Schemas.productsDesc)
      .awaitTermination()
    val norm = spark.read.parquet(settings.sinksFor("products").normalized)
    assert(norm.count() === 6,
      "env-derived settings must locate the produced topic and land it")
  }

  test("the ingest CLI drains all produced topics and skips absent ones") {
    val base = Files.createTempDirectory("graft_ingest_cli_").toString
    val settings = Settings.Defaults.copy(
      corruptionEnabled = false, topicPartitions = 2, sinkBase = base)
    val log = Log.build(settings, Seq(_ => ()), () => java.time.Instant.now())
    // Produce only three of the four topics: events stays absent.
    Produce.run(spark, settings.copy(eventTopic = "events_elsewhere"),
      Produce.Args(products = 3, customers = 2, orders = 4, events = 1,
        seed = Some(9L)), s"$base/topics")
    val r = Ingest.run(spark, settings, log)
    assert(r.errors.isEmpty)
    assert(r.skipped === Seq("events"))
    assert(r.landed === Map("products" -> 3L, "customers" -> 2L, "orders" -> 4L))
    // And the landed tables honor the at-rest decimal contract.
    import org.apache.spark.sql.types.DecimalType
    val norm = spark.read.parquet(settings.sinksFor("orders").normalized)
    assert(norm.schema("total").dataType === DecimalType(10, 2))
  }

  test("transient topic-write failures retry with exponential backoff and succeed") {
    val out = Files.createTempDirectory("graft_produce_retry_").toString
    val settings = Settings.Defaults.copy(
      corruptionEnabled = false, topicPartitions = 2, sinkBase = out,
      producerMaxRetries = 3, producerRetryBackoffMs = 50L)
    var ordersFailures = 2 // first two attempts on the orders topic fail
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val flaky: Produce.TopicWriter = (df, key, topic, parts, off, dir) => {
      if (topic == "orders" && ordersFailures > 0) {
        ordersFailures -= 1
        throw new RuntimeException("BufferError: local queue full")
      }
      KafkaShaped.writeTopicFile(df, key, topic, parts, off, dir)
    }
    val m = Produce.run(spark, settings,
      Produce.Args(products = 1, customers = 1, orders = 2, events = 1,
        seed = Some(3L)), out, flaky, sleeps.append(_))
    assert(m.errors === 0, "a transiently failing write must not count as an error")
    assert(m.retries === 2)
    assert(m.byTopic("orders").retries === 2,
      "retries must be attributed to the flaky topic")
    assert(m.byTopic.removed("orders").values.forall(_.retries === 0))
    assert(sleeps.toSeq === Seq(50L, 100L), "backoff must double per attempt")
    assert(m.producedMessages === 5)
    assert(spark.read.schema(KafkaShaped.schema).json(s"$out/orders").count() === 2,
      "the retried topic must land its full batch")
  }

  test("exhausted retries count one error, stop at the bound, and spare other topics") {
    val out = Files.createTempDirectory("graft_produce_exh_").toString
    val settings = Settings.Defaults.copy(
      corruptionEnabled = false, topicPartitions = 2, sinkBase = out,
      producerMaxRetries = 2, producerRetryBackoffMs = 10L)
    val sleeps = scala.collection.mutable.ArrayBuffer.empty[Long]
    val broken: Produce.TopicWriter = (df, key, topic, parts, off, dir) => {
      if (topic == "orders") throw new RuntimeException("broker gone")
      KafkaShaped.writeTopicFile(df, key, topic, parts, off, dir)
    }
    val m = Produce.run(spark, settings,
      Produce.Args(products = 1, customers = 1, orders = 2, events = 1,
        seed = Some(4L)), out, broken, sleeps.append(_))
    assert(m.errors === 1)
    assert(sleeps.toSeq === Seq(10L, 20L), "exactly maxRetries sleeps, then give up")
    assert(m.producedMessages === 3, "the other topics must still land")
    assert(m.byTopic("orders").errors === 1 &&
      m.byTopic("orders").producedMessages === 0,
      "the exhausted error must be attributed to its topic")
    assert(m.byTopic.removed("orders").values.forall(_.errors === 0))
  }

  test("corruption probability flows from settings into the produced batch") {
    val out = Files.createTempDirectory("graft_produce_cor_").toString
    val settings = Settings.Defaults.copy(
      corruptionEnabled = true, corruptionPProduct = 1.0, topicPartitions = 2,
      sinkBase = out)
    val m = Produce.run(spark, settings,
      Produce.Args(products = 20, customers = 1, orders = 1, events = 1,
        seed = Some(11L)), out)
    assert(m.errors === 0)
    // p=1.0 corrupts every product; each corruption type violates a
    // validation rule, so all 20 products must count as rejects.
    assert(m.rejects >= 20)
  }
}
