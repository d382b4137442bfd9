package graft

/** Benchmark main — runs every catalog query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line with per-query wall seconds. Failed queries are
  * reported under "errors" and excluded from timings/total so a failure
  * can never masquerade as a fast run.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val errors  = scala.collection.mutable.LinkedHashMap[String, String]()
    SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        val times = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          // noop sink materializes the FULL physical plan; a bare count()
          // would let EliminateSorts drop top-level orderBys and so time a
          // different plan than Verify executes (round-2 advice).
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        timings(name) = times.min
        spreads(name) = times.max - times.min
      } catch {
        case e: Throwable =>
          errors(name) = Option(e.getMessage).getOrElse(e.getClass.getName).take(200)
      }
    }
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

  /** The ONE-line JSON bench record. The official harness captures a
    * bounded tail of stdout (the r4 record kept 2000 chars and recorded
    * `"parsed": null` against our 3.9 KB line), so the line must stay
    * under that budget at full catalog size even on a fully contended
    * run. Normal render: 3-decimal seconds (1 ms resolution — below
    * that is JVM noise) with the top-3 noisiest spreads itemized
    * (`spread_max` covers the rest). If that would overflow the tail
    * (only possible when every query reads 3-digit contended seconds),
    * the render degrades in stages — first the spread itemization goes
    * (pure diagnostics; `spread_max` stays), then values coarsen to
    * centiseconds/whole seconds, and as a last resort the per-query
    * itemization is dropped entirely (totals + counts + the first 3
    * errors, each clipped — a PROVABLY bounded record, asserted under
    * the budget by BenchLineSpec) — so a quiet run keeps millisecond
    * per-query floors and even a pathological run stays a parseable
    * record instead of a truncated one. */
  private[graft] def renderLine(
      timings: Seq[(String, Double)], spreads: Seq[(String, Double)],
      errors: Seq[(String, String)], runs: Int, sfDir: String): String = {
    val stages = Seq((false, true), (false, false), (true, false))
    val rendered = stages.iterator.map { case (coarse, withSpread) =>
      renderAt(timings, spreads, errors, runs, sfDir, coarse, withSpread)
    }
    // lazy iterator: the common (fits-at-stage-1) case renders once;
    // the minimal render is the guaranteed-bounded oversize fallback
    rendered.find(_.length <= 2000)
      .getOrElse(renderMinimal(timings, spreads, errors, runs, sfDir))
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
    // clipped names get a `~i` ordinal suffix: two failing queries that
    // share a 24-char prefix must not collapse into duplicate JSON keys
    // (a parser would keep only the last). `~` can't appear in a real
    // query name, so the suffixed key never collides with an unclipped one.
    val es = errors.take(3).zipWithIndex
      .map { case ((k, v), i) =>
        val key = if (k.length > 24) k.take(22) + "~" + i else k
        s"${jstr(key)}:${jstr(v.take(48))}"
      }
      .mkString("{", ",", "}")
    val total = timings.map(_._2).sum
    s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":{},"spread":{},"spread_max":${r3(spMax)},"runs":$runs,"errors":$es,"n_ok":${timings.size},"n_err":${errors.size},"sf":${jstr(sfDir.take(64))}}"""
  }

  private def renderAt(
      timings: Seq[(String, Double)], spreads: Seq[(String, Double)],
      errors: Seq[(String, String)], runs: Int, sfDir: String,
      coarse: Boolean, withSpread: Boolean): String = {
    def rv(v: Double): String =
      if (!coarse) r3(v) else if (v < 10) fmt(v, 2) else fmt(v, 0)
    val qs = timings.map { case (k, v) => s"${jstr(k)}:${rv(v)}" }.mkString("{", ",", "}")
    val noisy = if (!withSpread) Nil else spreads.filter(_._2 > 0.5).sortBy(-_._2).take(3)
    val sp = noisy.map { case (k, v) => s"${jstr(k)}:${rv(v)}" }.mkString("{", ",", "}")
    val spMax = if (spreads.isEmpty) 0.0 else spreads.map(_._2).max
    val es = errors.map { case (k, v) => s"${jstr(k)}:${jstr(v)}" }.mkString("{", ",", "}")
    val total = timings.map(_._2).sum
    s"""{"metric":"total","value":${r3(total)},"unit":"sec","queries":$qs,"spread":$sp,"spread_max":${r3(spMax)},"runs":$runs,"errors":$es,"n_ok":${timings.size},"n_err":${errors.size},"sf":${jstr(sfDir)}}"""
  }
}
