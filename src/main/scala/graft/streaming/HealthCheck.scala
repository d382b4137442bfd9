package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pipeline health probes — the engine's analog of the reference's
  * declared-but-stubbed `src/monitoring/health_checks.py` (0-byte; its
  * CI gates deployments on container health,
  * `.github/workflows/ci-cd.yaml:88-105`). The stats/progress sinks
  * (S9) record what the pipeline DID; these predicates answer whether
  * an ingest deployment IS healthy right now:
  *
  *  - sink readable — the sink parses through the crash-window-aware
  *    reader (a mid-rotation bucket is healthy, a corrupt file is not);
  *  - checkpoint present — the streaming checkpoint has committed at
  *    least one batch (offsets + commits both non-empty);
  *  - watermark advancing — the two most recent progress rows show a
  *    non-regressing, non-empty event-time watermark;
  *  - stats fresh — the most recent progress row is younger than the
  *    freshness budget.
  *
  * Every probe is a pure predicate over the deployment's paths with an
  * explicit `nowMs` (injectable for tests; wall clock only in `main`),
  * and each failure carries a human-readable detail. The CLI exits 0
  * iff every probe on every requested topic is green — the same
  * contract as the reference CI's health gate.
  *
  * Usage: runMain graft.streaming.HealthCheck [--topic T]...
  *          [--max-age-sec N]
  * Topics default to all configured topics; paths come from
  * [[graft.Settings.sinksFor]].
  */
object HealthCheck {

  final case class Check(topic: String, name: String, ok: Boolean, detail: String)

  private def fs(spark: SparkSession, p: String) =
    new Path(p).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The sink (raw or normalized) reads end-to-end through the
    * crash-aware reader. An absent sink is unhealthy (nothing landed);
    * an unreadable one reports the reader's failure. The probe reads at
    * most ONE row (`take(1)`) — a liveness check must stay O(1) however
    * large the sink grows; a full `count()` here would make every health
    * poll pay a complete table scan at production scale. */
  def sinkReadable(spark: SparkSession, topic: String, path: String): Check =
    try IngestPipeline.existing(spark, path) match {
      case Some(df) =>
        val nonEmpty = df.take(1).nonEmpty
        Check(topic, "sink_readable", ok = nonEmpty,
          if (nonEmpty) "readable, non-empty" else "readable but empty")
      case None     => Check(topic, "sink_readable", ok = false, s"no sink at $path")
    } catch {
      case e: Throwable =>
        Check(topic, "sink_readable", ok = false,
          s"unreadable: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
    }

  /** The streaming checkpoint exists and has committed >= 1 batch:
    * `offsets/` proves a batch was planned, `commits/` that it
    * finished — offsets without commits is a crash loop, not health. */
  def checkpointPresent(spark: SparkSession, topic: String, ckpt: String): Check =
    try {
      val f = fs(spark, ckpt)
      def nFiles(sub: String): Int = {
        val p = new Path(ckpt, sub)
        if (f.exists(p)) f.listStatus(p).count(s => !s.getPath.getName.startsWith(".")) else 0
      }
      val (off, com) = (nFiles("offsets"), nFiles("commits"))
      Check(topic, "checkpoint_present", ok = off > 0 && com > 0,
        s"offsets=$off commits=$com")
    } catch {
      case e: Throwable =>
        Check(topic, "checkpoint_present", ok = false,
          s"unreadable: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
    }

  /** The event-time watermark in the two most recent progress rows is
    * non-empty and non-regressing. (With no new data the watermark
    * legitimately holds — "advancing" means monotone, not strictly
    * increasing per trigger.) */
  def watermarkAdvancing(spark: SparkSession, topic: String, statsPath: String): Check =
    try {
      val last2 = spark.read.parquet(statsPath)
        .select(col("batch_id"), col("watermark"))
        .orderBy(col("batch_id").desc).limit(2).collect()
      if (last2.isEmpty)
        Check(topic, "watermark_advancing", ok = false, "no progress rows")
      else {
        val latest = last2(0).getAs[String]("watermark")
        val prev = if (last2.length > 1) last2(1).getAs[String]("watermark") else ""
        def t(s: String): Long =
          if (s == null || s.isEmpty) Long.MinValue
          else java.time.Instant.parse(s).toEpochMilli
        Check(topic, "watermark_advancing",
          ok = latest != null && latest.nonEmpty && t(latest) >= t(prev),
          s"latest=$latest prev=$prev")
      }
    } catch {
      case e: Throwable =>
        Check(topic, "watermark_advancing", ok = false,
          s"unreadable: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
    }

  /** The most recent progress row is younger than `maxAgeMs`. */
  def statsFresh(spark: SparkSession, topic: String, statsPath: String,
      maxAgeMs: Long, nowMs: Long): Check =
    try {
      val last = spark.read.parquet(statsPath)
        .agg(max(unix_millis(col("recorded_at"))).as("t")).collect()(0)
      if (last.isNullAt(0))
        Check(topic, "stats_fresh", ok = false, "no progress rows")
      else {
        val age = nowMs - last.getLong(0)
        Check(topic, "stats_fresh", ok = age <= maxAgeMs, s"age_ms=$age max=$maxAgeMs")
      }
    } catch {
      case e: Throwable =>
        Check(topic, "stats_fresh", ok = false,
          s"unreadable: ${Option(e.getMessage).getOrElse(e.getClass.getName).take(120)}")
    }

  /** All probes for one topic's deployment paths. The watermark probe
    * reads the [[Monitoring.ProgressSink]] table (which carries the
    * per-trigger watermark) and is included only when the deployment
    * runs one (`progressPath`); the processing-stats table written by
    * [[IngestPipeline.processBatch]] carries no watermark column and
    * feeds the freshness probe instead. */
  def forTopic(spark: SparkSession, topic: String, sinks: IngestPipeline.Sinks,
      maxAgeMs: Long, nowMs: Long,
      progressPath: Option[String] = None): Seq[Check] = Seq(
    sinkReadable(spark, topic, sinks.raw),
    checkpointPresent(spark, topic, sinks.checkpoint),
    statsFresh(spark, topic, sinks.stats, maxAgeMs, nowMs)) ++
    progressPath.map(p => watermarkAdvancing(spark, topic, p))

  def healthy(checks: Seq[Check]): Boolean = checks.nonEmpty && checks.forall(_.ok)

  def main(args: Array[String]): Unit = {
    val settings = graft.Settings.fromEnv()
    var topics = List.empty[String]
    var maxAgeSec = 3600L
    @annotation.tailrec
    def parse(argv: List[String]): Unit = argv match {
      case Nil                            => ()
      case "--topic" :: v :: rest         => topics ::= v; parse(rest)
      case "--max-age-sec" :: v :: rest   => maxAgeSec = v.toLong; parse(rest)
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown argument: $other")
    }
    parse(args.toList)
    val ts = if (topics.nonEmpty) topics.reverse
      else List(settings.productTopic, settings.customerTopic,
        settings.orderTopic, settings.eventTopic)
    val spark = graft.Session.get()
    val checks =
      try ts.flatMap { t =>
        // Watermark probe only when this deployment writes a progress
        // table (convention: <sinkBase>/<topic>/progress).
        val progress = s"${settings.sinkBase}/$t/progress"
        val hasProgress = fs(spark, progress).exists(new Path(progress))
        forTopic(spark, t, settings.sinksFor(t), maxAgeSec * 1000,
          System.currentTimeMillis(),
          if (hasProgress) Some(progress) else None)
      } finally spark.stop()
    val body = checks.map(c =>
      s"""{"topic":"${c.topic}","check":"${c.name}","ok":${c.ok},"detail":"${
        c.detail.replace("\\", "\\\\").replace("\"", "\\\"")}"}""")
      .mkString("[", ",", "]")
    println(s"""{"healthy":${healthy(checks)},"checks":$body}""")
    if (!healthy(checks)) sys.exit(1)
  }
}
