package graft

import org.apache.spark.sql.SparkSession

/** Consumer CLI — drains every entity topic through the full ingest
  * (decode → validate → idempotent dual-sink) from settings alone: the
  * entry point the reference implies but stubs (`kafka_consumer.py` is
  * 0 bytes; its contract lives in the integration tests). Pairs with
  * [[Produce]]: `Produce` writes `<sinkBase>/topics/<topic>`, this
  * drains them with `Trigger.AvailableNow` and prints one JSON line of
  * per-topic landed counts. Topics with no produced data are skipped
  * with a warning, not failed — a consumer starting before its producer
  * is a normal state. Exit 1 iff any stream errored.
  */
object Ingest {

  final case class Result(landed: Map[String, Long], skipped: Seq[String],
      errors: Seq[String])

  def run(spark: SparkSession, settings: Settings, log: Log): Result = {
    val fs = new org.apache.hadoop.fs.Path(settings.sinkBase)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var landed  = Map.empty[String, Long]
    var skipped = Vector.empty[String]
    var errors  = Vector.empty[String]
    def fail(topic: String, e: Throwable): Unit = {
      errors :+= topic
      log.error("ingest.fail", "topic" -> topic,
        "msg" -> Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
    }
    // The four topic streams share nothing (own input dir, sinks,
    // checkpoint), so they START together and drain concurrently — the
    // CLI's wall-clock is the slowest topic, not the sum.
    val started = Schemas.all.flatMap { desc =>
      val topicDir = s"${settings.sinkBase}/topics/${desc.topic}"
      if (!fs.exists(new org.apache.hadoop.fs.Path(topicDir))) {
        log.warning("ingest.skip", "topic" -> desc.topic, "reason" -> "no topic data")
        skipped :+= desc.topic
        None
      } else
        try {
          log.info("ingest.start", "topic" -> desc.topic)
          Some(desc -> streaming.IngestPipeline.start(spark, settings, desc))
        } catch { case e: Throwable => fail(desc.topic, e); None }
    }
    for ((desc, q) <- started)
      try {
        q.awaitTermination()
        val n = spark.read.parquet(settings.sinksFor(desc.topic).normalized).count()
        landed += desc.topic -> n
        log.info("ingest.done", "topic" -> desc.topic, "normalized_rows" -> n)
      } catch { case e: Throwable => fail(desc.topic, e) }
    Result(landed, skipped, errors)
  }

  def main(args: Array[String]): Unit = {
    val settings = Settings.fromEnv()
    val log = Log(settings)
    val spark = Session.get()
    val r =
      try run(spark, settings, log)
      finally spark.stop()
    val counts = r.landed.toSeq.sortBy(_._1)
      .map { case (t, n) => s"${Log.jstr(t)}:$n" }.mkString("{", ",", "}")
    println(s"""{"normalized":$counts,"skipped":${r.skipped.size},"errors":${r.errors.size}}""")
    if (r.errors.nonEmpty) sys.exit(1)
  }
}
