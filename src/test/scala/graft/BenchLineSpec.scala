package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench JSON line must survive the official harness's 2000-char
  * stdout tail capture at FULL catalog size under worst-case noise —
  * pinned here against the live catalog so adding queries (or spread
  * itemization) can't silently push the record past the budget again
  * (BENCH_r04 was recorded `"parsed": null` against a 3.9 KB line). */
class BenchLineSpec extends AnyFunSuite {

  test("worst-case bench line for the live catalog stays within the 2 KB tail") {
    val names = SparkEntry.queries.keys.toSeq.sorted
    // worst case: three-digit seconds everywhere, every query noisy
    // (all spreads itemizable), longest plausible sf dir
    val timings = names.map(_ -> 999.999)
    val spreads = names.map(_ -> 999.999)
    val line = Bench.renderLine(timings, spreads, Nil, runs = 3,
      sfDir = "/root/testdata/sf0.001")
    assert(line.length <= 2000, s"bench line ${line.length} B > 2000 B budget")
    // and it must stay parseable JSON with the contract fields
    assert(line.startsWith("""{"metric":"total","""))
    for (f <- Seq("\"queries\":", "\"spread_max\":", "\"n_ok\":", "\"sf\":"))
      assert(line.contains(f))
  }

  test("pathological input degrades to the minimal render, still parseable and bounded") {
    // worst case the staged renders can NOT absorb: a huge catalog where
    // every query fails with a max-length (200-char) message — the error
    // map alone would be ~50 KB. The final degradation stage must emit a
    // bounded record (no per-query itemization, errors capped at 3).
    val names = (1 to 400).map(i => f"pathological_query_name_$i%03d")
    val timings = names.map(_ -> 999.999)
    val spreads = names.map(_ -> 999.999)
    val errors = names.map(_ -> ("x" * 200))
    val line = Bench.renderLine(timings, spreads, errors, runs = 3,
      sfDir = "/root/testdata/" + ("y" * 100))
    assert(line.length <= 2000, s"minimal render ${line.length} B > 2000 B budget")
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
