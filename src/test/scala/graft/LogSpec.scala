package graft

import java.nio.file.{Files, Paths}
import java.time.Instant

import org.scalatest.funsuite.AnyFunSuite

/** Structured logging semantics (`logging_config.py:1-62` analog):
  * level filtering, console vs JSON rendering, field binding, and
  * size-based file rotation. */
class LogSpec extends AnyFunSuite {

  private val t0 = Instant.parse("2026-08-12T00:00:00Z")

  private def collect(settings: Settings): (Log, () => Seq[String]) = {
    val buf = scala.collection.mutable.ArrayBuffer[String]()
    (Log.build(settings, Seq(buf.append(_)), () => t0), () => buf.toSeq)
  }

  test("levels below the configured minimum are suppressed") {
    val (log, lines) = collect(Settings.Defaults.copy(logLevel = "WARNING"))
    log.debug("d"); log.info("i"); log.warning("w"); log.error("e")
    assert(lines().size === 2)
    assert(lines().forall(l => l.contains("[WARNING]") || l.contains("[ERROR]")))
  }

  test("console format carries timestamp, service, event and bound fields") {
    val (log, lines) = collect(Settings.Defaults.copy(serviceName = "svc"))
    log.info("produce.done", "messages" -> 8, "errors" -> 0)
    assert(lines() === Seq(
      "2026-08-12T00:00:00Z [INFO] svc produce.done messages=8 errors=0"))
  }

  test("json format emits one parseable object per event") {
    val (log, lines) = collect(Settings.Defaults.copy(logFormat = "json"))
    log.error("ingest.fail", "batch" -> 3, "msg" -> "a \"quoted\" cause")
    assert(lines().size === 1)
    val line = lines().head
    // Minimal structural check without a JSON lib: balanced object with
    // the bound keys, quotes escaped.
    assert(line.startsWith("{") && line.endsWith("}"))
    for (k <- Seq("\"ts\"", "\"level\"", "\"service\"", "\"event\"", "\"batch\"", "\"msg\""))
      assert(line.contains(k), s"missing $k in $line")
    assert(line.contains("\\\"quoted\\\""))
  }

  test("unknown level names fail fast naming the offender") {
    val e = intercept[IllegalArgumentException](
      collect(Settings.Defaults.copy(logLevel = "LOUD")))
    assert(e.getMessage.contains("LOUD"))
  }

  test("file sink rotates at maxBytes keeping the configured backups") {
    val dir = Files.createTempDirectory("graft_log_").toString
    val path = s"$dir/app.log"
    val sink = new Log.RotatingFile(path, maxBytes = 120, backups = 2)
    for (i <- 1 to 12) sink(s"event line number $i padded to be non-trivial")
    assert(Files.exists(Paths.get(path)))
    assert(Files.exists(Paths.get(s"$path.1")), "first backup missing")
    assert(Files.exists(Paths.get(s"$path.2")), "second backup missing")
    assert(!Files.exists(Paths.get(s"$path.3")), "backups must cap at the configured count")
    assert(Files.size(Paths.get(path)) <= 120)
    // Rotation preserves order: the live file holds the newest lines.
    val live = new String(Files.readAllBytes(Paths.get(path)))
    assert(live.contains("number 12"))
  }

  test("a logToFile logger tees events into the rotating file") {
    val dir = Files.createTempDirectory("graft_log_tee_").toString
    val path = s"$dir/app.log"
    val log = Log(Settings.Defaults.copy(logToFile = true, logFile = path))
    log.info("tee.check", "k" -> "v")
    assert(Files.exists(Paths.get(path)))
    val content = new String(Files.readAllBytes(Paths.get(path)))
    assert(content.contains("tee.check") && content.contains("k=v"))
  }
}
