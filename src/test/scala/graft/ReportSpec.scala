package graft

import com.fasterxml.jackson.databind.ObjectMapper
import org.scalatest.funsuite.AnyFunSuite

/** The dashboard-KPI artifact (`graft.Report`): the declared panel set,
  * parseable JSON, and values consistent with the underlying cataloged
  * queries. */
class ReportSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"
  private val mapper = new ObjectMapper()

  test("report emits every declared dashboard panel as parseable JSON") {
    val root = mapper.readTree(Report.build(spark, sf))
    for (k <- Seq("source", "n_purchases", "orders_per_minute", "revenue_trend",
        "top_products", "quality_rates", "order_value_percentiles", "sessions",
        "events_hourly_recent", "dedup_exact", "dedup_neardup",
        "dedup_clusters", "contamination", "mix_manifest",
        "cleaning", "pii_scrub", "quality_classifier", "repetition_ladder",
        "snapshot_diff", "increment_screen", "source_overlap",
        "heavy_hitters", "media_dedup", "distribution_drift",
        "media_quality", "mix_plan", "tokenizer_fertility",
        "source_report", "dup_profile", "suite_contamination",
        "quality_ladder", "length_histogram", "vocab_growth",
        "pii_by_source"))
      assert(root.has(k), s"missing panel $k")
    // datasheet panels carry their gate queries' own invariant columns:
    // the dup profile's singleton bucket exists, the PII table is
    // (sources × 3 types), vocab growth is monotone per language
    assert(root.get("dup_profile").get(0).has("n_grams"))
    assert(root.get("pii_by_source").size() % 3 === 0)
    assert(root.get("pii_by_source").get(0).has("occ_ppm_chars"))
    root.get("vocab_growth").forEach { n =>
      assert(n.get("types_p25").asLong() <= n.get("types_p50").asLong() &&
        n.get("types_p50").asLong() <= n.get("types_all").asLong())
    }
    assert(root.get("source_report").get(0).has("n_lowq"))
    assert(root.get("quality_ladder").get(0).has("n_flag_any"))
    assert(root.get("length_histogram").get(0).has("padded_chunks"))
    assert(root.get("suite_contamination").get(0).has("n_train_hit"))
    // round-13 panels: the allocation decision frame carries all three
    // allocators' columns; the fertility audit its milli ratios
    for (c <- Seq("temp_bp", "realized_tokens", "allocated", "water_level"))
      assert(root.get("mix_plan").get(0).has(c), s"mix_plan missing $c")
    assert(root.get("tokenizer_fertility").get(0).get("fertility_milli")
      .asLong() >= 1000L)
    // the drift panel is the retraining alarm: it must carry the flag
    // column and at least one flagged row on the planted history
    assert(root.get("distribution_drift").get(0).has("drifted"))
    var anyDrift = false
    root.get("distribution_drift").forEach(n =>
      anyDrift = anyDrift || n.get("drifted").asBoolean())
    assert(anyDrift, "planted history must flag at least one dimension value")
    assert(root.get("media_quality").get(0).has("kept_pixels"))
    // hygiene panels carry the gate queries' own invariants: the scrub
    // panel's residual count is the l32 in-plan proof (always 0), the
    // classifier split is non-degenerate, the cleaning panel never
    // grows text
    assert(root.get("pii_scrub").get(0).get("n_residual").asLong() === 0L)
    assert(root.get("quality_classifier").get(0).has("n_keep"))
    assert(root.get("cleaning").get(0).get("n_chars_out").asLong()
      <= root.get("cleaning").get(0).get("n_chars_in").asLong())
    assert(root.get("repetition_ladder").get(0).has("n_flag_any"))
    // pipeline-health panels carry the gate queries' own columns and
    // hold their gated invariants (closure converged, 5-lang screens)
    assert(root.get("dedup_exact").get(0).has("n_dupes"))
    assert(root.get("dedup_neardup").get(0).has("n_near_dup"))
    assert(root.get("dedup_clusters").get(0).get("n_unconverged").asLong() === 0L)
    assert(root.get("contamination").size() === 5)
    assert(root.get("contamination").get(0).has("contam_bp"))
    assert(root.get("mix_manifest").size() > 0)
    assert(root.get("mix_manifest").get(0).has("n_tokens"))
    // consistency: the contamination panel IS l25's rollup
    val l25 = operators.SamplingQueries.l25.fn(spark, sf).collect()
    assert(root.get("contamination").get(0).get("n_contaminated").asLong()
      === l25(0).getAs[Long]("n_contaminated"))
    assert(root.get("order_value_percentiles").get(0).has("p50_cents"))
    assert(root.get("source").asText() === sf)
    assert(root.get("orders_per_minute").asDouble() > 0.0)
    assert(root.get("revenue_trend").size() > 0)
    assert(root.get("top_products").size() === 10)
    assert(root.get("events_hourly_recent").size() === 24)
    // Panel values come FROM the cataloged queries — spot-check one
    // against a direct run so the report can't drift.
    val j3 = operators.RelationalQueries.j3.fn(spark, sf).collect()
    assert(root.get("top_products").get(0).get("p_brand").asText()
      === j3(0).getAs[String]("p_brand"))
    assert(root.get("top_products").get(0).get("qty").asLong()
      === j3(0).getAs[Long]("qty"))
    // Sessions panel carries the w5 aggregate row.
    assert(root.get("sessions").get(0).has("n_sessions"))
  }

  test("orders_per_minute is purchases over covered event-time minutes") {
    import org.apache.spark.sql.functions._
    val root = mapper.readTree(Report.build(spark, sf))
    val ev = Tables.events(spark, sf).filter(col("event_type") === "purchase")
      .agg(count(lit(1)).as("n"),
        unix_micros(min(col("ts"))).as("t0"), unix_micros(max(col("ts"))).as("t1"))
      .collect()(0)
    val spanMin = math.max((ev.getAs[Long]("t1") - ev.getAs[Long]("t0")) / 6e7, 1.0)
    val expected = ev.getAs[Long]("n") / spanMin
    assert(math.abs(root.get("orders_per_minute").asDouble() - expected) < 0.01,
      s"opm ${root.get("orders_per_minute").asDouble()} vs $expected")
    assert(root.get("n_purchases").asLong() === ev.getAs[Long]("n"))
  }

  test("--out writes the artifact to a file") {
    val f = java.nio.file.Files.createTempFile("graft_report_", ".json")
    val json = Report.build(spark, sf)
    java.nio.file.Files.write(f, json.getBytes("UTF-8"))
    val back = mapper.readTree(java.nio.file.Files.readAllBytes(f))
    assert(back.get("top_products").size() === 10)
    assert(Report.parse(List("--sf", sf, "--out", f.toString))
      === Report.Args(sf, None, Some(f.toString)))
    assert(Report.parse(List("--sf", sf, "--mart", "/tmp/m"))
      === Report.Args(sf, Some("/tmp/m"), None))
    intercept[IllegalArgumentException](Report.parse(List("--bogus")))
  }

  test("Query CLI arg parsing: name, sf, limit, explain; rejects unknowns") {
    assert(Query.parse(List("j9_asof_join", "--sf", sf, "--limit", "5", "--explain"))
      === Query.Args("j9_asof_join", sf, 5, explain = true))
    assert(Query.parse(List("a1_per_order_total")).name === "a1_per_order_total")
    assert(Query.parse(Nil).name === "")
    intercept[IllegalArgumentException](Query.parse(List("--bogus")))
    // a second positional is an unknown argument, not a silent overwrite
    intercept[IllegalArgumentException](Query.parse(List("a", "b")))
    // non-numeric --limit hits the same usage path, not a raw
    // NumberFormatException stack trace
    val ex = intercept[IllegalArgumentException](
      Query.parse(List("a1_per_order_total", "--limit", "x")))
    assert(ex.getMessage.contains("--limit"))
  }
}
