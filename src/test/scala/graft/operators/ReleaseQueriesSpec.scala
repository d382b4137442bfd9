package graft.operators

import graft.Session
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r1's oracle is deterministic only because of construction
  * guarantees the DQ's planted shard must uphold (see the
  * [[ReleaseQueries]] scaladoc). This spec pins those guarantees
  * directly, so an edit to the construction that silently breaks the
  * sketch-arm pin (the one arm the DuckDB oracle cannot replay) fails
  * HERE with a named reason instead of as an opaque hash mismatch in
  * the driver's gate.
  */
class ReleaseQueriesSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  test("ws-variant guarantee: doubling one internal space keeps the " +
      "token array (hence sketch and band keys) and changes the content " +
      "hash on every eligible doc") {
    val docs = graft.Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .withColumn("ta", split(lower(col("text")), "\\s+"))
      .filter(size(col("ta")) >= 3 && instr(col("text"), " ") > 0)
      .withColumn("vtext", expr(
        "concat(substring(text, 1, instr(text, ' ')), ' ', " +
          "substring(text, instr(text, ' ') + 1))"))
    val bad = docs.filter(
      !(split(lower(col("vtext")), "\\s+") === col("ta")) ||
        sha2(lower(trim(col("vtext"))), 256) === sha2(lower(trim(col("text"))), 256))
    assert(bad.count() === 0,
      "a ws-variant drifted in tokens or collided in hash")
  }

  test("r1 audit matrix invariants at sf0.001: release-2 decisions are " +
      "exactly the duplicate family and tally release-1 admissions " +
      "copy-for-copy (the append actually reached the artifacts)") {
    val out = ReleaseQueries.r1.fn(spark, sf).collect()
    val rel2 = out.filter(_.getLong(0) == 2L)
    assert(rel2.nonEmpty, "release 2 must exercise the appended artifacts")
    assert(rel2.map(_.getString(2)).toSet
      .subsetOf(Set("corpus_duplicate", "near_duplicate")),
      "release 2 plants only copies of admitted docs")
    val admit = out.filter(r => r.getLong(0) == 1L && r.getString(2) == "admit")
      .map(r => r.getString(1) -> (r.getLong(3), r.getLong(4))).toMap
    val off = graft.Tables.documents(spark, sf)
      .agg(max(col("doc_id"))).collect()(0).getLong(0) + 1L
    // every admitted doc (>= 200 chars, so >= 3 tokens with spaces in
    // this corpus) yields exactly one exact copy at +off and one
    // ws-copy at +2*off -- counts AND id sums must reconcile per lang
    for (r <- rel2) {
      val (lang, dec, n, sum) =
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))
      val (na, sa) = admit.getOrElse(lang, (0L, 0L))
      assert(n === na, s"$lang/$dec count vs admissions")
      val k = if (dec == "corpus_duplicate") 1L else 2L
      assert(sum === sa + k * off * na, s"$lang/$dec id-sum arithmetic")
    }
    // and every lang that admitted anything shows up in BOTH release-2
    // decision rows
    for ((lang, (na, _)) <- admit if na > 0; dec <-
        Seq("corpus_duplicate", "near_duplicate"))
      assert(rel2.exists(r => r.getString(1) == lang && r.getString(2) == dec),
        s"missing release-2 $dec row for $lang")
  }
}
