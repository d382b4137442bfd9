package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench JSON line must survive the official harness's 2000-char
  * stdout tail capture — WITH sbt's `[success] Total time …` epilogue
  * (~75-90 chars) appended after it, which is what actually truncated
  * the line head in BENCH_r05–r09 even though the line itself was
  * ≤2000 chars. Pinned here against the live catalog so adding queries
  * (or spread itemization) can't silently push the record past the
  * DRIVER-VISIBLE budget again. */
class BenchLineSpec extends AnyFunSuite {

  // A worst-case epilogue, longer than any observed (75 chars in r9).
  private val epilogue =
    "\n[success] Total time: 99999 s (999:59:59), completed Dec 31, 2026, 12:59:59 PM\n"

  private def assertDriverVisible(line: String): Unit = {
    assert(line.length + epilogue.length <= Bench.DriverTailChars,
      s"line ${line.length} B + epilogue ${epilogue.length} B exceeds the " +
        s"${Bench.DriverTailChars} B driver tail: the line HEAD would be cut")
    // and the configured internal budget must itself leave that room
    assert(Bench.LineBudget + epilogue.length <= Bench.DriverTailChars,
      "LineBudget leaves no room for the sbt epilogue")
  }

  test("quiet-run bench line for the live catalog fits the driver tail with the sbt epilogue") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // realistic quiet values: mixed sub-second and few-second floors
    val timings = names.zipWithIndex.map { case (n, i) => n -> (0.107 + (i % 40) * 0.1) }
    val spreads = names.map(_ -> 0.02)
    val line = Bench.renderLine(timings, spreads, Nil, runs = 3,
      sfDir = "/root/testdata/sf0.1")
    assertDriverVisible(line)
    assert(line.startsWith("""{"metric":"total","""))
    for (f <- Seq("\"queries\":", "\"spread_max\":", "\"n_ok\":", "\"sf\":"))
      assert(line.contains(f))
    // The catalog (79 queries, round 11) has outgrown FULL itemization
    // within the 2000-char driver tail — the names+values alone exceed
    // the budget at any precision — so a quiet run legitimately lands
    // on the slowest-K stage. Pin the contract that matters: the line
    // fits, the SLOW half (the regression signal) is always itemized,
    // any omission is a small sub-noise tail, and the total stays the
    // full-catalog sum.
    val omitted = """"omitted":(\d+)""".r.findFirstMatchIn(line)
      .map(_.group(1).toInt).getOrElse(0)
    // proportional, not absolute — and sized by the LINE-BUDGET
    // arithmetic, not wishful thinking: ~1670 B of query-map room at
    // ~23 B/entry itemizes ~72 entries, so past ~120 queries (round 14:
    // 126) even the slow-three-fifths bound of the 122-query round is
    // unreachable at any precision. The contract that survives growth:
    // the SLOW HALF (every floor-relevant magnitude) is itemized, the
    // omission is exactly the fastest tail (checked below), and the
    // total covers the full catalog. Per-query floors come from the
    // full bench_full_*.json records, never from the tail line.
    assert(omitted <= names.size / 2, s"omitted tail too large: $omitted")
    timings.sortBy(-_._2).dropRight(omitted)
      .foreach { case (n, _) =>
        assert(line.contains("\"" + n + "\":"), s"slow query $n missing") }
    val total = """"value":([0-9.]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
    assert(math.abs(total - timings.map(_._2).sum) < 1.0,
      "total must cover the FULL catalog even when the fast tail is omitted")
    // n_ok counts every successful query, NOT the itemized slice
    assert(line.contains(s""""n_ok":${timings.size}"""),
      s"n_ok must stay ${timings.size} with $omitted itemizations dropped")
  }

  test("worst-case contended line for the live catalog stays within the driver tail") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // worst case: three-digit seconds everywhere, every query noisy
    val timings = names.map(_ -> 999.999)
    val spreads = names.map(_ -> 999.999)
    val line = Bench.renderLine(timings, spreads, Nil, runs = 3,
      sfDir = "/root/testdata/sf0.001")
    assertDriverVisible(line)
    assert(line.startsWith("""{"metric":"total","""))
    for (f <- Seq("\"queries\":", "\"spread_max\":", "\"n_ok\":", "\"sf\":"))
      assert(line.contains(f))
  }

  test("oversized catalog degrades to slowest-K itemization with an omitted count") {
    val names = (1 to 300).map(i => f"generated_query_name_$i%03d")
    // make the slow end distinctive: query 300 is the slowest
    val timings = names.zipWithIndex.map { case (n, i) => n -> (0.1 + i * 0.05) }
    val spreads = names.map(_ -> 0.3)
    val line = Bench.renderLine(timings, spreads, Nil, runs = 3,
      sfDir = "/root/testdata/sf0.1")
    assertDriverVisible(line)
    assert(line.contains("\"omitted\":"), s"expected omitted count in: ${line.take(200)}")
    // the slowest query must be present; the fastest must be the one omitted
    assert(line.contains("\"generated_query_name_300\":"))
    assert(!line.contains("\"generated_query_name_001\":"))
    // the total must still cover ALL queries, not just the kept ones
    val total = """"value":([0-9.]+)""".r.findFirstMatchIn(line).get.group(1).toDouble
    val expected = timings.map(_._2).sum
    assert(math.abs(total - expected) < 1.0, s"total $total != full-catalog $expected")
  }

  test("a 14-error round keeps the per-query floors AND fits the driver tail") {
    // Round-10 regression pin: 14 events-broken queries each threw a
    // ~90-char DATATYPE_MISMATCH message; the error map ate the budget
    // and the official record degraded to `"queries":{}` — losing every
    // floor. Errors must now compact to their error class (≤3 itemized
    // + errors_omitted) BEFORE any floor is dropped.
    val names = SparkEntry.queries.keys.toSeq.sorted
    val (broken, ok) = names.splitAt(14)
    val timings = ok.zipWithIndex.map { case (n, i) => n -> (0.107 + (i % 40) * 0.1) }
    val spreads = ok.map(_ -> 0.02)
    val errors = broken.map(_ -> ("[DATATYPE_MISMATCH.BINARY_OP_DIFF_TYPES] Cannot resolve \"(ts div 1000)\" due to data type mismatch: differing types"))
    val line = Bench.renderLine(timings, spreads, errors, runs = 3,
      sfDir = "/root/testdata/sf0.1")
    assertDriverVisible(line)
    // The surviving floors must outlive the errors. With the catalog
    // now past ~80 queries the 2 KB driver tail can no longer carry
    // EVERY floor even error-free (the slowest-K stage is the designed
    // degradation; bench_full.json keeps the exact record), so the pin
    // is the real contract: the map is non-empty, the accounting
    // reconciles (itemized + omitted = n_ok), and what is itemized is
    // exactly the slow end — every kept timing ≥ every dropped one.
    assert(!line.contains("\"queries\":{}"), "per-query map must not be empty")
    val itemized = ok.filter(n => line.contains("\"" + n + "\":"))
    assert(itemized.nonEmpty)
    val omitted = """"omitted":(\d+)""".r.findFirstMatchIn(line)
      .map(_.group(1).toInt).getOrElse(0)
    assert(itemized.size + omitted === ok.size,
      s"accounting broken: ${itemized.size} itemized + $omitted omitted != ${ok.size}")
    if (omitted > 0) {
      val t = timings.toMap
      val minKept = itemized.map(t).min
      val maxDropped = ok.filterNot(itemized.contains).map(t).max
      assert(minKept >= maxDropped,
        s"slowest-K violated: kept $minKept < dropped $maxDropped")
    }
    // errors: ≤3 itemized, class-only values, the rest counted
    assert(line.contains("\"errors\":{"))
    assert(line.contains("DATATYPE_MISMATCH.BINARY_OP_DIFF_TYPES"))
    assert(!line.contains("Cannot resolve"), "full error message must not be itemized")
    assert(line.contains("\"errors_omitted\":11"))
    assert(line.contains(s""""n_err":14"""))
  }

  test("pathological input degrades to the minimal render, still parseable and bounded") {
    // worst case the staged renders can NOT absorb: a huge catalog of
    // ~200-char query names (so even 8 slowest-K entries overflow) where
    // every query fails with a max-length message. The final degradation
    // stage must emit a bounded record (no per-query itemization, errors
    // capped at 3).
    val names = (1 to 400).map(i => f"pathological_query_name_$i%03d" + "_pad" * 44)
    val timings = names.map(_ -> 999.999)
    val spreads = names.map(_ -> 999.999)
    val errors = names.map(_ -> ("x" * 200))
    val line = Bench.renderLine(timings, spreads, errors, runs = 3,
      sfDir = "/root/testdata/" + ("y" * 100))
    assertDriverVisible(line)
    assert(line.startsWith("""{"metric":"total","""))
    for (f <- Seq("\"queries\":{}", "\"spread_max\":", "\"n_ok\":400", "\"n_err\":400"))
      assert(line.contains(f), s"missing $f in: $line")
    // the 3 kept errors all share a 24-char name prefix: clipping must
    // keep their JSON keys UNIQUE (duplicate keys collapse in a parser)
    val keys = """"(pathological[^"]*)":""".r
      .findAllMatchIn(line).map(_.group(1)).toSeq
    assert(keys.size == 3 && keys.distinct.size == 3,
      s"clipped error keys not unique: $keys")
  }

  test("a failed query is reported under errors, never as a timing") {
    val line = Bench.renderLine(
      Seq("ok_query" -> 1.0), Seq("ok_query" -> 0.1),
      Seq("bad_query" -> "boom"), runs = 3, sfDir = "/x")
    assert(line.contains(""""errors":{"bad_query":"boom"}"""))
    assert(line.contains(""""n_ok":1"""))
    assert(line.contains(""""n_err":1"""))
    assert(!line.contains(""""bad_query":1"""))
  }
}
