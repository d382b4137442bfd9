package graft

/** Env-var-driven runtime configuration — the Spark-native analog of the
  * reference's `Settings` (`src/config/settings.py:7-77`) and its
  * env-override contract (`tests/unit/test_config.py:10-173`): every
  * tunable has a default and an environment override, resolved ONCE into
  * an immutable value that is passed down explicitly (no hidden globals,
  * so two configurations can coexist in one JVM — something the
  * reference's process-wide `BaseSettings` cannot do).
  *
  * Only knobs with a counterpart in this engine are mirrored: topics
  * (`settings.py:27-30`), batch size, generator seed, per-entity
  * corruption probabilities (`settings.py:62-67`), and sink/test-data
  * paths. Broker DSNs, Postgres credentials and dashboard ports have no
  * analog — the "broker" is the Kafka-shaped file layer and every sink
  * is a parquet path.
  */
final case class Settings(
    appEnv: String,
    serviceName: String,
    logLevel: String,
    logFormat: String,
    logToFile: Boolean,
    logFile: String,
    logFileMaxBytes: Long,
    logFileBackups: Int,
    batchSize: Int,
    seed: Long,
    sfDir: String,
    sinkBase: String,
    productTopic: String,
    customerTopic: String,
    orderTopic: String,
    eventTopic: String,
    topicPartitions: Int,
    corruptionEnabled: Boolean,
    corruptionPProduct: Double,
    corruptionPCustomer: Double,
    corruptionPOrder: Double,
    corruptionPEvent: Double,
    producerMaxRetries: Int,
    producerRetryBackoffMs: Long) {

  /** Effective corruption probability for one topic — 0 everywhere when
    * the injector is disabled (`CORRUPTION_ENABLED` analog). */
  def corruptionP(topic: String): Double =
    if (!corruptionEnabled) 0.0
    else topic match {
      case `productTopic`  => corruptionPProduct
      case `customerTopic` => corruptionPCustomer
      case `orderTopic`    => corruptionPOrder
      case `eventTopic`    => corruptionPEvent
      case _               => 0.0
    }

  /** Standard per-topic sink layout under the configured base path. */
  def sinksFor(topic: String): streaming.IngestPipeline.Sinks =
    streaming.IngestPipeline.Sinks(
      raw = s"$sinkBase/$topic/raw",
      normalized = s"$sinkBase/$topic/normalized",
      rejects = s"$sinkBase/$topic/rejects",
      stats = s"$sinkBase/$topic/stats",
      checkpoint = s"$sinkBase/$topic/_checkpoint")
}

object Settings {

  /** The defaults the reference's field declarations pin
    * (`settings.py:11-67`; corruption probabilities verbatim). */
  val Defaults: Settings = Settings(
    appEnv = "local",
    serviceName = "graft-pipeline",
    logLevel = "INFO",
    logFormat = "console",
    logToFile = false,
    logFile = "logs/app.log",
    logFileMaxBytes = 10485760L,
    logFileBackups = 5,
    batchSize = 50,
    seed = 42L,
    sfDir = "/root/testdata/sf0.1",
    sinkBase = "/tmp/graft_sinks",
    productTopic = "products",
    customerTopic = "customers",
    orderTopic = "orders",
    eventTopic = "events",
    topicPartitions = 3,
    corruptionEnabled = true,
    corruptionPProduct = 0.01,
    corruptionPCustomer = 0.02,
    corruptionPOrder = 0.03,
    corruptionPEvent = 0.04,
    // Producer delivery retries — the analog of the reference
    // producer's bounded queue-full poll/sleep loop
    // (`producer.py:105-148`).
    producerMaxRetries = 3,
    producerRetryBackoffMs = 100L)

  /** Resolve settings from an environment map (defaults ← overrides).
    * Malformed numerics/booleans fail fast naming the variable — the
    * analog of pydantic's ValidationError, instead of a silent default. */
  def fromEnv(env: Map[String, String] = sys.env): Settings = {
    val d = Defaults
    def str(k: String, dv: String): String = env.getOrElse(k, dv)
    def num[A](k: String, dv: A)(parse: String => A): A =
      env.get(k).map { v =>
        try parse(v.trim)
        catch {
          case _: NumberFormatException =>
            throw new IllegalArgumentException(s"$k: not a number: '$v'")
        }
      }.getOrElse(dv)
    def bool(k: String, dv: Boolean): Boolean =
      env.get(k).map(_.trim.toLowerCase match {
        case "true" | "1" | "yes"  => true
        case "false" | "0" | "no"  => false
        case v => throw new IllegalArgumentException(s"$k: not a boolean: '$v'")
      }).getOrElse(dv)
    Settings(
      appEnv = str("GRAFT_APP_ENV", d.appEnv),
      serviceName = str("GRAFT_SERVICE_NAME", d.serviceName),
      logLevel = str("GRAFT_LOG_LEVEL", d.logLevel),
      logFormat = str("GRAFT_LOG_FORMAT", d.logFormat),
      logToFile = bool("GRAFT_LOG_TO_FILE", d.logToFile),
      logFile = str("GRAFT_LOG_FILE", d.logFile),
      logFileMaxBytes = num("GRAFT_LOG_FILE_MAX_BYTES", d.logFileMaxBytes)(_.toLong),
      logFileBackups = num("GRAFT_LOG_FILE_BACKUP_COUNT", d.logFileBackups)(_.toInt),
      batchSize = num("GRAFT_BATCH_SIZE", d.batchSize)(_.toInt),
      seed = num("GRAFT_SEED", d.seed)(_.toLong),
      sfDir = str("SPARK_GRAFT_SF_DIR", d.sfDir),
      sinkBase = str("GRAFT_SINK_BASE", d.sinkBase),
      productTopic = str("GRAFT_PRODUCT_TOPIC", d.productTopic),
      customerTopic = str("GRAFT_CUSTOMER_TOPIC", d.customerTopic),
      orderTopic = str("GRAFT_ORDER_TOPIC", d.orderTopic),
      eventTopic = str("GRAFT_EVENT_TOPIC", d.eventTopic),
      topicPartitions = num("GRAFT_TOPIC_PARTITIONS", d.topicPartitions)(_.toInt),
      corruptionEnabled = bool("GRAFT_CORRUPTION_ENABLED", d.corruptionEnabled),
      corruptionPProduct = num("GRAFT_CORRUPTION_P_PRODUCT", d.corruptionPProduct)(_.toDouble),
      corruptionPCustomer = num("GRAFT_CORRUPTION_P_CUSTOMER", d.corruptionPCustomer)(_.toDouble),
      corruptionPOrder = num("GRAFT_CORRUPTION_P_ORDER", d.corruptionPOrder)(_.toDouble),
      corruptionPEvent = num("GRAFT_CORRUPTION_P_EVENT", d.corruptionPEvent)(_.toDouble),
      producerMaxRetries = num("GRAFT_PRODUCER_MAX_RETRIES", d.producerMaxRetries)(_.toInt),
      producerRetryBackoffMs =
        num("GRAFT_PRODUCER_RETRY_BACKOFF_MS", d.producerRetryBackoffMs)(_.toLong))
  }
}
