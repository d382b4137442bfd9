package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

/** Structured logging — the engine's analog of the reference's structlog
  * setup (`src/config/logging_config.py:1-62`): leveled events with
  * bound key-value fields, rendered as console lines or JSON lines,
  * optionally teed to a size-rotated file (`LOG_FILE_MAX_BYTES` /
  * `LOG_FILE_BACKUP_COUNT` semantics).
  *
  * Scope: the engine's own driver-side lifecycle events (produce
  * batches, CLI runs) — Spark's executor/driver internals already log
  * through log4j and are not re-routed. Instances are explicit (built
  * from a [[Settings]]), so two configurations can coexist in one JVM;
  * there is no process-global logger to mutate.
  */
final class Log private (
    service: String,
    minLevel: Int,
    json: Boolean,
    sinks: Seq[String => Unit],
    clock: () => java.time.Instant) {

  def debug(event: String, fields: (String, Any)*): Unit    = emit(0, event, fields)
  def info(event: String, fields: (String, Any)*): Unit     = emit(1, event, fields)
  def warning(event: String, fields: (String, Any)*): Unit  = emit(2, event, fields)
  def error(event: String, fields: (String, Any)*): Unit    = emit(3, event, fields)
  def critical(event: String, fields: (String, Any)*): Unit = emit(4, event, fields)

  private def emit(level: Int, event: String, fields: Seq[(String, Any)]): Unit =
    if (level >= minLevel) {
      val ts = clock().toString
      val name = Log.Levels(level)
      val line =
        if (json)
          (Seq("ts" -> ts, "level" -> name, "service" -> service, "event" -> event)
            ++ fields.map { case (k, v) => k -> String.valueOf(v) })
            .map { case (k, v) => s"${Log.jstr(k)}:${Log.jstr(v)}" }
            .mkString("{", ",", "}")
        else
          s"$ts [$name] $service $event" +
            fields.map { case (k, v) => s" $k=$v" }.mkString
      sinks.foreach(_(line))
    }
}

object Log {
  val Levels: IndexedSeq[String] =
    IndexedSeq("DEBUG", "INFO", "WARNING", "ERROR", "CRITICAL")

  private[graft] def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  private def levelIndex(name: String): Int = {
    val i = Levels.indexOf(name.toUpperCase)
    require(i >= 0, s"unknown log level '$name' (expected one of ${Levels.mkString("/")})")
    i
  }

  /** Size-rotated file sink: when the live file would exceed `maxBytes`,
    * shift `f.(n)` → `f.(n+1)` up to `backups` and restart the live file
    * — the stdlib RotatingFileHandler contract the reference configures. */
  private[graft] final class RotatingFile(path: String, maxBytes: Long, backups: Int)
      extends (String => Unit) {
    private val p = Paths.get(path)
    override def apply(line: String): Unit = synchronized {
      Option(p.getParent).foreach(Files.createDirectories(_))
      val bytes = (line + "\n").getBytes(StandardCharsets.UTF_8)
      if (Files.exists(p) && Files.size(p) + bytes.length > maxBytes && backups > 0) {
        def bak(n: Int): Path = Paths.get(s"$path.$n")
        if (Files.exists(bak(backups))) Files.delete(bak(backups))
        for (n <- backups - 1 to 1 by -1 if Files.exists(bak(n)))
          Files.move(bak(n), bak(n + 1))
        Files.move(p, bak(1))
      }
      Files.write(p, bytes, StandardOpenOption.CREATE, StandardOpenOption.APPEND)
    }
  }

  /** Build a logger from settings: console sink always (stderr, like the
    * reference's console renderer), file sink when `logToFile`. */
  def apply(settings: Settings): Log =
    build(settings,
      Seq[String => Unit](line => Console.err.println(line)) ++
        (if (settings.logToFile)
          Seq(new RotatingFile(settings.logFile, settings.logFileMaxBytes,
            settings.logFileBackups))
         else Nil),
      () => java.time.Instant.now())

  /** Test/embedding constructor: explicit sinks and clock. */
  def build(settings: Settings, sinks: Seq[String => Unit],
      clock: () => java.time.Instant): Log =
    new Log(settings.serviceName, levelIndex(settings.logLevel),
      settings.logFormat.equalsIgnoreCase("json"), sinks, clock)
}
