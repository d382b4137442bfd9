package graft

/** Benchmark main — runs every catalog query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query wall seconds. Failed queries are
  * reported under "errors" and excluded from timings/total so a failure
  * can never masquerade as a fast run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // Box telemetry at capture START, before any load this run adds:
    // BASELINE.md's recurring host-slowdown window reads ~2100 MHz on
    // the otherwise-3000-class box, and every capture inside it medians
    // ~1.3× the floors uniformly — recording the frequency beside the
    // floors turns "looks like the window" into a logged fact the fold
    // discipline can key on.
    val mhzStart = cpuMhz()
    val spark = Session.get()
    // Warm the JVM/codegen paths once so timings measure the queries, not
    // class loading: one join+agg query plus one JSON round-trip query
    // (Jackson codec init alone costs seconds on first use). Wrapped so a
    // warm-up failure can never swallow the JSON line (round-2 advice).
    for (warm <- Seq("j1_star_join", "s3_json_roundtrip"))
      try SparkEntry.queries(warm)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }
    // Each query is timed `runs` times and the MIN reported: a single
    // shot on a shared box reads 10-30x high under contention (official
    // r3 record: l9 62 s vs 5.95 s reproduced; r4 record: s5 9.1 s vs
    // 0.49/0.58 s across three quiet-box runs), which is measurement
    // noise, not engine cost. The min through the full noop-sink plan is
    // the defensible per-query floor; min-of-3 because r4 showed two
    // contended shots can BOTH read high. The max-min spread of the
    // noisiest queries is reported so a noisy run is visible instead of
    // silently folded in.
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    // Optional comma-separated allowlist for profiling a single query on
    // a quiet box (the per-round official run leaves this unset and
    // times the full catalog).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val timings = scala.collection.mutable.LinkedHashMap[String, Double]()
    val spreads = scala.collection.mutable.LinkedHashMap[String, Double]()
    val shots   = scala.collection.mutable.LinkedHashMap[String, Seq[Double]]()
    val errors  = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        def shot(): Double = {
          val t0 = System.nanoTime()
          // noop sink materializes the FULL physical plan; a bare count()
          // would let EliminateSorts drop top-level orderBys and so time a
          // different plan than Verify executes (round-2 advice).
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        var times = (1 to runs).map(_ => shot())
        // Adaptive re-measure: when the spread dwarfs the floor, every
        // shot may have shared one contended window and even the min is
        // suspect (the r15 official j7 read 5.3× its floor as a
        // min-of-3 while ten same-day captures read ≤1.6×) — two extra
        // shots give the row a chance to land outside the window.
        if (runs > 1 && times.max - times.min > math.max(1.0, times.min))
          times = times ++ (1 to 2).map(_ => shot())
        timings(name) = times.min
        spreads(name) = times.max - times.min
        // every shot, in measurement order: the adaptive re-measure
        // gives noisy rows min-of-(runs+2) while quiet rows keep
        // min-of-runs, so downstream floor comparisons need the sample
        // size (and the raw samples) to account for the mixed policy —
        // recorded in the sidecar only, never the budgeted line
        shots(name) = times
        // GC-fence after multi-second rows (the artifact-lifecycle
        // gates): their tenured garbage otherwise lands on the NEXT
        // row's clock. One explicit collection per gate-sized row keeps
        // neighbors independent without reordering the catalog.
        if (times.min > 2.0) { System.gc(); Thread.sleep(200) }
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }
    writeFullRecord(timings.toSeq, spreads.toSeq, shots.toSeq, errors.toSeq,
      runs, sfDir, mhzStart)
    println(renderLine(timings.toSeq, spreads.toSeq, errors.toSeq, runs, sfDir))
    spark.stop()
  }

  private def jstr(s: String): String =
    "\"" + s.flatMap {
      case '"'          => "\\\""
      case '\\'         => "\\\\"
      case '\n'         => "\\n"
      case '\r'         => "\\r"
      case '\t'         => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c            => c.toString
    } + "\""

  // Locale.ROOT: the f-interpolator honors the JVM default locale, and a
  // comma-decimal locale would emit invalid JSON.
  private def fmt(v: Double, decimals: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${decimals}f", Double.box(v))

  /** Adaptive precision: millisecond resolution where it matters
    * (sub-10 s queries), fewer decimals as magnitude grows — on a fully
    * contended run where every query reads 3-digit seconds, fixed
    * 3-decimal values alone would push the 70-query line past the 2 KB
    * tail budget. */
  private def r3(v: Double): String =
    if (v < 10) fmt(v, 3) else if (v < 100) fmt(v, 2) else fmt(v, 1)

  /** What the driver actually keeps: a 2000-char tail of stdout that
    * ALSO contains sbt's `[success] Total time: …` epilogue (~75-90
    * chars, printed AFTER our line — BENCH_r05–r09 all recorded
    * `"parsed": null` because the line itself was budgeted to 2000 and
    * the epilogue pushed its HEAD out of the tail). The line budget is
    * therefore the tail minus the worst-case epilogue minus margin. */
  private[graft] val DriverTailChars   = 2000
  private[graft] val SbtEpilogueChars  = 100 // observed 75; margin for long runtimes
  private[graft] val LineBudget: Int   = DriverTailChars - SbtEpilogueChars - 50

  /** The ONE-line JSON bench record, guaranteed to fit the driver's
    * stdout tail WITH the sbt epilogue appended (see [[LineBudget]]).
    * The full catalog's query names alone cost ~1.5 KB, so the fine
    * 3-decimal render cannot fit — the render degrades in stages until
    * one fits: (1) 3-dec + top-3 spread itemization, (2) 3-dec without
    * itemization, (3) centisecond values (trailing zeros trimmed) with
    * tight fields (drop `spread`/`runs`, empty `errors`, sf basename —
    * `spread_max`/`n_ok`/`n_err` always stay), (4) decisecond values
    * tight, (5) decisecond tight keeping only the SLOWEST entries that
    * fit plus an `"omitted":N` count (slow queries are the regression
    * signal; omitted ones were sub-noise), and finally (6) the bounded
    * minimal record. The exact 3-decimal per-query record is written to
    * `bench_full.json` by main() regardless, so reduced line precision
    * never loses the floors. BenchLineSpec pins the DRIVER-VISIBLE
    * budget: line + worst-case epilogue ≤ 2000. */
  private[graft] def renderLine(
      timings: Seq[(String, Double)], spreads: Seq[(String, Double)],
      errors: Seq[(String, String)], runs: Int, sfDir: String): String = {
    // Errors are compacted before ANY timing degradation (see
    // compactErrors): a failing catalog must cost floors, not render them.
    val (errC, errOmitted) = compactErrors(errors)
    val nErr = errors.size
    // (decimals, itemizeSpread, tight)
    val stages = Seq((3, true, false), (3, false, false),
                     (2, false, true), (1, false, true))
    val rendered = stages.iterator.map { case (dec, sp, tight) =>
      renderAt(timings, spreads, errC, errOmitted, nErr, runs, sfDir, dec, sp, tight)
    }
    // lazy iterator: the common case renders until first fit; then the
    // slowest-K render; the minimal render is the guaranteed fallback
    rendered.find(_.length <= LineBudget)
      .orElse(renderSlowest(timings, spreads, errors, runs, sfDir))
      .getOrElse(renderMinimal(timings, spreads, errors, runs, sfDir))
  }

  /** Compact error itemization, applied BEFORE any timing degradation:
    * each value reduced to its error class (the leading `[…]` tag when
    * present, else a 48-char clip), at most [[MaxItemizedErrors]] entries
    * itemized, the rest reported as an `errors_omitted` count. Round 10
    * lesson: 14 × ~90-char error strings consumed the whole line budget
    * and the stages dropped EVERY per-query floor before touching the
    * errors — the official record came out with `"queries":{}`.
    * Compacting errors up front bounds their line cost to ~250 chars no
    * matter how many queries fail, so the floors always survive. The
    * full messages still land in the sidecar ([[writeFullRecord]]). */
  private[graft] val MaxItemizedErrors = 3
  private[graft] def compactErrors(
      errors: Seq[(String, String)]): (Seq[(String, String)], Int) = {
    val classed = errors.map { case (k, v) =>
      val cls =
        if (v.startsWith("[") && v.indexOf(']') > 1) v.substring(1, v.indexOf(']'))
        else v
      k -> cls.take(48)
    }
    (classed.take(MaxItemizedErrors), (errors.size - MaxItemizedErrors).max(0))
  }

  /** Stage-5 render: keep only the slowest entries that fit the budget
    * (largest-first), report the rest as `"omitted":N`. The total stays
    * exact; the itemization keeps exactly the queries a regression
    * watch needs. Binary-search-free: drops in chunks of 8 from the
    * fast end until it fits, None if even 8 entries don't fit. */
  private def renderSlowest(
      timings: Seq[(String, Double)], spreads: Seq[(String, Double)],
      errors: Seq[(String, String)], runs: Int, sfDir: String): Option[String] = {
    val (errC, errOmitted) = compactErrors(errors)
    val bySlow = timings.sortBy(-_._2)
    Iterator.iterate(bySlow.size - 4)(_ - 4).takeWhile(_ >= 8).map { keep =>
      val kept = bySlow.take(keep)
      val line = renderAt(kept, spreads, errC, errOmitted, errors.size, runs, sfDir,
        decimals = 1, itemizeSpread = false, tight = true,
        omitted = timings.size - keep, totalOverride = Some(timings.map(_._2).sum),
        // n_ok counts every SUCCESSFUL query, not just the itemized
        // slice — kept + omitted must reconcile with it
        nOkOverride = Some(timings.size))
      line
    }.find(_.length <= LineBudget)
  }

  /** The last-resort render: no per-query itemization, error map capped
    * at 3 entries with names/messages clipped. Every field is either a
    * number or a clipped string, so the worst-case length is a small
    * constant (≲ 400 chars) no matter how large the catalog grows —
    * the stage the doc comment's "stays a parseable record" claim
    * bottoms out on. */
  private def renderMinimal(
      timings: Seq[(String, Double)], spreads: Seq[(String, Double)],
      errors: Seq[(String, String)], runs: Int, sfDir: String): String = {
    val spMax = if (spreads.isEmpty) 0.0 else spreads.map(_._2).max
    val (errC, _) = compactErrors(errors)
    // clipped names get a `~i` ordinal suffix: two failing queries that
    // share a 24-char prefix must not collapse into duplicate JSON keys
    // (a parser would keep only the last). `~` can't appear in a real
    // query name, so the suffixed key never collides with an unclipped one.
    val es = errC.zipWithIndex
      .map { case ((k, v), i) =>
        val key = if (k.length > 24) k.take(22) + "~" + i else k
        s"${jstr(key)}:${jstr(v)}"
      }
      .mkString("{", ",", "}")
    val total = timings.map(_._2).sum
    s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":{},"spread":{},"spread_max":${r3(spMax)},"runs":$runs,"errors":$es,"n_ok":${timings.size},"n_err":${errors.size},"sf":${jstr(sfDir.take(64))}}"""
  }

  /** One render attempt. `errors` is the (already-compacted, ≤3-entry)
    * itemization and `errOmitted`/`nErr` the counts that go with it —
    * the sidecar passes the FULL error list with `errOmitted = 0`.
    * `decimals` is the sub-10 s resolution (values
    * ≥10 s always coarsen one step further, see [[r3]]); `tight` drops
    * the pure-diagnostic fields (`spread` itemization, `runs`, an EMPTY
    * `errors` map — a non-empty one always survives) and shortens the
    * sf dir to its basename; trailing zeros are trimmed below 3
    * decimals ("0.40" → "0.4") because they carry no information at
    * reduced precision. `spread_max`, `n_ok`, `n_err` are always kept:
    * they are the one-glance contention/failure markers. */
  private def renderAt(
      timings: Seq[(String, Double)], spreads: Seq[(String, Double)],
      errors: Seq[(String, String)], errOmitted: Int, nErr: Int,
      runs: Int, sfDir: String,
      decimals: Int, itemizeSpread: Boolean, tight: Boolean,
      omitted: Int = 0, totalOverride: Option[Double] = None,
      nOkOverride: Option[Int] = None): String = {
    def trim(s: String): String =
      if (!s.contains('.')) s
      else s.reverse.dropWhile(_ == '0').dropWhile(_ == '.').reverse
    def rv(v: Double): String = decimals match {
      case 3 => r3(v)
      case d => trim(if (v < 10) fmt(v, d) else if (v < 100) fmt(v, (d - 1).max(0)) else fmt(v, 0))
    }
    val qs = timings.map { case (k, v) => s"${jstr(k)}:${rv(v)}" }.mkString("{", ",", "}")
    val noisy = if (!itemizeSpread) Nil else spreads.filter(_._2 > 0.5).sortBy(-_._2).take(3)
    val spMax = if (spreads.isEmpty) 0.0 else spreads.map(_._2).max
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = totalOverride.getOrElse(timings.map(_._2).sum)
    val sf = if (tight) sfDir.split('/').filter(_.nonEmpty).lastOption.getOrElse(sfDir) else sfDir
    val b = new StringBuilder
    b ++= s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs"""
    if (!tight)
      b ++= s""","spread":${noisy.map { case (k, v) => s"${jstr(k)}:${rv(v)}" }.mkString("{", ",", "}")}"""
    b ++= s""","spread_max":${r3(spMax)}"""
    if (!tight) b ++= s""","runs":$runs"""
    if (!tight || errors.nonEmpty) b ++= s""","errors":$es"""
    if (errOmitted > 0) b ++= s""","errors_omitted":$errOmitted"""
    if (omitted > 0) b ++= s""","omitted":$omitted"""
    b ++= s""","n_ok":${nOkOverride.getOrElse(timings.size)},"n_err":$nErr,"sf":${jstr(sf)}}"""
    b.result()
  }

  /** Best-effort sidecar with the EXACT 3-decimal per-query record —
    * the stdout line may legitimately render at reduced precision (the
    * catalog's names alone approach the driver-tail budget), so the
    * full-precision floors land here for BENCH_NOTES reconciliation.
    * Never throws: a read-only cwd must not cost the stdout record. */
  /** Median "cpu MHz" across /proc/cpuinfo — the one box-state reading
    * that distinguishes the documented 2100 MHz host-slowdown window
    * from a quiet capture. None on any failure (non-Linux, masked
    * procfs): telemetry must never cost the record. */
  private[graft] def cpuMhz(): Option[Double] =
    try {
      val src = scala.io.Source.fromFile("/proc/cpuinfo")
      try {
        val vals = src.getLines()
          .filter(_.startsWith("cpu MHz"))
          .map(_.split(":")(1).trim.toDouble).toSeq.sorted
        if (vals.isEmpty) None else Some(vals(vals.length / 2))
      } finally src.close()
    } catch { case _: Throwable => None }

  private def writeFullRecord(
      timings: Seq[(String, Double)], spreads: Seq[(String, Double)],
      shots: Seq[(String, Seq[Double])],
      errors: Seq[(String, String)], runs: Int, sfDir: String,
      mhzStart: Option[Double]): Unit =
    try {
      val base = renderAt(timings, spreads, errors,
        errOmitted = 0, nErr = errors.size, runs, sfDir,
        decimals = 3, itemizeSpread = true, tight = false)
      // every raw shot per query (sidecar-only — the budgeted line
      // carries min + spread): variable sample sizes from the adaptive
      // re-measure are visible instead of silently mixing policies
      val shotsJson = shots.map { case (k, ts) =>
        jstr(k) + ":[" + ts.map(fmt(_, 3)).mkString(",") + "]"
      }.mkString("{", ",", "}")
      // splice the shots field before renderAt's closing brace — valid
      // only while the rendered object ends with a bare '}'; assert it
      // so a future renderAt change (trailing newline, field reorder)
      // surfaces here as a loud failure instead of corrupt JSON
      assert(base.endsWith("}"),
        s"writeFullRecord: renderAt output does not end with '}': " +
          base.takeRight(8))
      // start + end frequency: a capture that ENTERED or LEFT the
      // slowdown window mid-run shows a split reading
      val mhz = (mhzStart.map(m => s""","cpu_mhz_start":${fmt(m, 0)}""") ++
        cpuMhz().map(m => s""","cpu_mhz_end":${fmt(m, 0)}""")).mkString
      val full = base.dropRight(1) + ",\"shots\":" + shotsJson + mhz + "}"
      val bytes = (full + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8)
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_full.json"), bytes)
      // Timestamped copy too: the fixed-name sidecar of round 10's
      // OFFICIAL run was clobbered by a later repro invocation in the
      // same cwd — a per-invocation name preserves every record.
      val stamp = new java.text.SimpleDateFormat("yyyyMMdd_HHmmss")
        .format(new java.util.Date())
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"bench_full_$stamp.json"), bytes)
    } catch { case _: Throwable => () }
}
