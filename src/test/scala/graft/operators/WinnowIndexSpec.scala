package graft.operators

import graft.{Session, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The persisted winnowing-fingerprint index: guarantee-backed
  * screening, append ≡ rebuild, probe-from-disk ≡ composed, and the
  * two-tier consistency with the exact substring index. */
class WinnowIndexSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def df(rows: Seq[(String, Long, String)]) = {
    import spark.implicits._
    rows.toDF("lang", "doc_id", "text")
  }

  test("screenAgainst catches a k+w-1-token verbatim overlap (published " +
      "guarantee) and stays silent on token-disjoint docs") {
    val shared = "quartz plover basalt nimbus ferrule osprey garnet mica"
    val corpus = df(Seq(("en", 1L,
      s"alpha bravo charlie delta echo $shared foxtrot golf hotel india")))
    val base = tmp("graft_winnow1")
    WinnowIndex.write(corpus, base)
    val probes = df(Seq(
      ("en", 10L, s"november oscar papa quebec romeo $shared sierra tango"),
      ("en", 11L, "yankee zulu anchor bobbin crate dowel easel flange " +
        "grommet hasp inlet jamb keel")))
    val hits = WinnowIndex.screenAgainst(probes,
        WinnowIndex.read(spark, base))
      .collect().map(r => r.getLong(1) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(hits.contains(10L), "an 8-token overlap MUST share a fingerprint")
    assert(hits(10L)._1 >= 1L && hits(10L)._2 === 1L)
    assert(!hits.contains(11L), "disjoint doc must be absent from the frame")
  }

  test("append-then-probe equals full rebuild, and probe-from-disk " +
      "equals the composed build") {
    val docsAll = Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("lang", "doc_id", "text")
    val first = docsAll.filter(col("doc_id") % 3 =!= 0)
    val more = docsAll.filter(col("doc_id") % 3 === 0)
    val base = tmp("graft_winnow2")
    WinnowIndex.write(first, base)
    WinnowIndex.append(more, base)
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).toSet
    assert(rows(WinnowIndex.read(spark, base)) ===
      rows(WinnowIndex.build(docsAll)), "append ≡ rebuild")
  }

  test("two-tier consistency at sf0.001: every doc the EXACT substring " +
      "index flags (15-token spans ≥ k+w-1 = 8) is winnow-flagged too — " +
      "the cheap screen never misses what the exact probe would find") {
    val docsAll = Tables.documents(spark, sf)
      .filter(col("text").isNotNull).select("lang", "doc_id", "text")
    // corpus = stock docs; probe = l33's planted near-dup copies
    // (first token dropped, offset ids) — verbatim lifts by construction
    val off = 1000000L
    val probes = docsAll.filter(col("doc_id") % 10 === 0)
      .select(col("lang"), (col("doc_id") + lit(off)).as("doc_id"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val wBase = tmp("graft_winnow3")
    val sBase = tmp("graft_winnow3s")
    WinnowIndex.write(docsAll, wBase)
    SubstringIndex.write(docsAll, sBase)
    val winnowHit = WinnowIndex.screenAgainst(probes,
        WinnowIndex.read(spark, wBase))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exactHit = SamplingQueries.cutAgainstIndex(probes,
        SubstringIndex.read(spark, sBase), SamplingQueries.SpanK)
      .filter(col("n_cut_tokens") > 0L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exactHit.nonEmpty, "planted lifts must produce exact spans")
    assert(exactHit.subsetOf(winnowHit),
      s"winnow screen missed ${exactHit -- winnowHit} — violates the " +
        "k+w-1 guarantee (15 ≥ 8)")

    // and the COMPOSED two-tier probe is row-identical to the untiered
    // one: pre-filtering the exact probe to winnow-flagged docs drops
    // nothing (the guarantee, realized as a call)
    val untiered = SubstringIndex.spansAgainst(probes,
      SubstringIndex.read(spark, sBase))
    val tiered = SubstringIndex.spansAgainstTiered(probes,
      WinnowIndex.read(spark, wBase), SubstringIndex.read(spark, sBase))
    assert(tiered.collect().map(_.toString).sorted.toSeq ===
      untiered.collect().map(_.toString).sorted.toSeq,
      "tiered ≡ untiered")
  }
}
