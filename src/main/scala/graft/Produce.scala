package graft

import graft.sources.{Corruptions, Generator}
import graft.streaming.KafkaShaped
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Producer CLI — the engine's analog of the reference's
  * `run_cli` (`src/data_generator/producer.py:266-316`): generate one
  * synthetic batch per entity (with the configured corruption
  * probabilities), land it as Kafka-shaped topic files, and print a
  * one-line JSON metrics summary. Exit code 0 iff no produce errors —
  * the reference's `0 if metrics.errors == 0 else 1` contract.
  *
  * Usage (defaults mirror the reference's argparse defaults):
  *   runMain graft.Produce [--products 5] [--customers 5] [--orders 10]
  *     [--events 25] [--seed N] [--repeat 1] [--out DIR]
  * Topics/partitions/corruption come from [[Settings.fromEnv]].
  */
object Produce {

  final case class Args(products: Long = 5, customers: Long = 5,
      orders: Long = 10, events: Long = 25, seed: Option[Long] = None,
      repeat: Int = 1, out: Option[String] = None)

  /** Delivery-report metrics. Totals drive the exit-code contract; the
    * per-topic breakdown mirrors the reference producer's per-callback
    * delivery report (`producer.py:87-103` counts messages/bytes/errors
    * per produce call, which is per entity topic). `byTopic` entries
    * carry scalar counters only (their own `byTopic` stays empty). */
  final case class Metrics(producedMessages: Long = 0, producedBytes: Long = 0,
      rejects: Long = 0, errors: Long = 0, retries: Long = 0,
      byTopic: Map[String, Metrics] = Map.empty) {
    private[graft] def +(o: Metrics): Metrics =
      Metrics(producedMessages + o.producedMessages,
        producedBytes + o.producedBytes, rejects + o.rejects,
        errors + o.errors, retries + o.retries)
  }

  /** A topic-file write, injectable so specs can interpose transient
    * failures (the reference tests the same seam with a mock producer). */
  type TopicWriter = (DataFrame, String, String, Int, Long, String) => Unit

  /** Run `f` with bounded retries and exponential backoff — the analog
    * of the reference producer's queue-full poll/sleep retry
    * (`producer.py:105-148`): attempt, on failure sleep
    * `backoffMs * 2^attempt` and try again, up to `maxRetries` retries.
    * Returns the result with the number of retries used, or the LAST
    * error once the bound is exhausted. `sleep` is injectable so specs
    * assert the backoff schedule instead of waiting it out. */
  private[graft] def withRetries[A](maxRetries: Int, backoffMs: Long,
      sleep: Long => Unit = Thread.sleep)(f: => A): Either[Throwable, (A, Int)] = {
    @annotation.tailrec
    def go(attempt: Int): Either[Throwable, (A, Int)] =
      (try Right((f, attempt)) catch { case e: Throwable => Left(e) }) match {
        case r @ Right(_) => r
        case l @ Left(_) if attempt >= maxRetries => l
        case Left(_) =>
          sleep(backoffMs << attempt)
          go(attempt + 1)
      }
    go(0)
  }

  @annotation.tailrec
  def parse(argv: List[String], acc: Args = Args()): Args = argv match {
    case Nil                         => acc
    case "--products" :: v :: rest   => parse(rest, acc.copy(products = v.toLong))
    case "--customers" :: v :: rest  => parse(rest, acc.copy(customers = v.toLong))
    case "--orders" :: v :: rest     => parse(rest, acc.copy(orders = v.toLong))
    case "--events" :: v :: rest     => parse(rest, acc.copy(events = v.toLong))
    case "--seed" :: v :: rest       => parse(rest, acc.copy(seed = Some(v.toLong)))
    case "--repeat" :: v :: rest     => parse(rest, acc.copy(repeat = v.toInt))
    case "--out" :: v :: rest        => parse(rest, acc.copy(out = Some(v)))
    case other :: _ =>
      throw new IllegalArgumentException(s"unknown argument: $other")
  }

  /** One produced batch per entity, repeated `repeat` times with
    * broker-monotone offsets (each repetition advances the offset base,
    * like `--repeat` re-producing to the same topics). Returns metrics
    * accumulated across repetitions. */
  def run(spark: SparkSession, settings: Settings, a: Args, outDir: String,
      writer: TopicWriter = KafkaShaped.writeTopicFile,
      sleep: Long => Unit = Thread.sleep): Metrics = {
    val seed = a.seed.getOrElse(settings.seed)
    def corrupt(topic: String, df: DataFrame,
        f: (DataFrame, Double, Long) => DataFrame): DataFrame = {
      val p = settings.corruptionP(topic)
      if (p <= 0.0) df else f(df, p, seed + 1)
    }
    val batches: Seq[(String, String, DataFrame)] = Seq(
      (settings.productTopic, "product_id",
        corrupt(settings.productTopic,
          Generator.products(spark, a.products, seed), Corruptions.products)),
      (settings.customerTopic, "customer_id",
        corrupt(settings.customerTopic,
          Generator.customers(spark, a.customers, seed), Corruptions.customers)),
      (settings.orderTopic, "order_id",
        corrupt(settings.orderTopic,
          Generator.orders(spark, a.orders, a.customers, a.products, seed),
          Corruptions.orders)),
      (settings.eventTopic, "event_id",
        corrupt(settings.eventTopic,
          Generator.events(spark, a.events, a.customers, seed), Corruptions.events)))

    // Per-topic accumulation in batch order; totals are folded at the end
    // so the exit-code contract (errors == 0) is unchanged.
    var by = scala.collection.immutable.ListMap.empty[String, Metrics]
    def add(topic: String, d: Metrics): Unit =
      by = by.updated(topic, by.getOrElse(topic, Metrics()) + d)
    // Offset stride per repetition: past the largest per-partition batch
    // so offsets stay monotone per (topic, partition) across repeats.
    val stride = Seq(a.products, a.customers, a.orders, a.events).max + 1
    for (r <- 0 until a.repeat; (topic, key, df) <- batches) {
      // Transient write failures retry with backoff before counting as
      // an error (reference `producer.py:105-148`); retries used are
      // delivery-report metrics, not failures.
      withRetries(settings.producerMaxRetries, settings.producerRetryBackoffMs,
        sleep)(writer(df, key, topic, settings.topicPartitions,
          r * stride, s"$outDir/$topic")) match {
        case Right((_, n)) =>
          add(topic, Metrics(retries = n))
          // Metric jobs can fail independently of the landed write;
          // count that as an error (pre-retry semantics), don't crash.
          try {
            val messages = df.count()
            // Same serialization as writeTopicFile — the counted bytes
            // are the payload bytes actually written, not an
            // approximation (octet_length: UTF-8 bytes, not
            // characters — generated names can be non-ASCII).
            val bytes = df
              .select(octet_length(KafkaShaped.valueJson(df)).as("n"))
              .agg(coalesce(sum(col("n")), lit(0L))).collect()(0).getLong(0)
            add(topic, Metrics(producedMessages = messages, producedBytes = bytes))
          } catch { case _: Throwable => add(topic, Metrics(errors = 1)) }
        case Left(_) => add(topic, Metrics(errors = 1))
      }
    }
    // Produce-side quality signal: how many of the batch rows would the
    // validators reject (the corruption injector's visible effect). Not
    // part of the exit code — rejects are data, errors are failures.
    for (desc <- Schemas.all) {
      batches.find(_._1 == desc.topic).foreach { case (_, _, df) =>
        val split = operators.Validation.split(df, desc.rules)
        add(desc.topic, Metrics(rejects = split.rejects.count() * a.repeat))
      }
    }
    by.values.foldLeft(Metrics())(_ + _).copy(byTopic = by)
  }

  def main(args: Array[String]): Unit = {
    val a = parse(args.toList)
    val settings = Settings.fromEnv()
    val log = Log(settings)
    log.info("produce.start", "products" -> a.products,
      "customers" -> a.customers, "orders" -> a.orders, "events" -> a.events,
      "repeat" -> a.repeat, "seed" -> a.seed.getOrElse(settings.seed))
    val spark = Session.get()
    val outDir = a.out.getOrElse(s"${settings.sinkBase}/topics")
    val m =
      try run(spark, settings, a, outDir)
      finally spark.stop()
    log.info("produce.done", "messages" -> m.producedMessages,
      "bytes" -> m.producedBytes, "rejects" -> m.rejects,
      "errors" -> m.errors, "retries" -> m.retries)
    // Per-topic delivery report alongside the totals, like the
    // reference's per-callback report; totals keep the exit contract.
    val perTopic = m.byTopic.map { case (t, tm) =>
      s""""$t":{"messages":${tm.producedMessages},"bytes":${tm.producedBytes},"rejects":${tm.rejects},"errors":${tm.errors},"retries":${tm.retries}}"""
    }.mkString("{", ",", "}")
    println(
      s"""{"produced_messages":${m.producedMessages},"produced_bytes":${m.producedBytes},"rejects":${m.rejects},"errors":${m.errors},"retries":${m.retries},"by_topic":$perTopic,"out":"$outDir"}""")
    if (m.errors != 0) sys.exit(1)
  }
}
