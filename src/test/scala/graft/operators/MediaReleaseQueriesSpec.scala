package graft.operators

import graft.Session
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r3's oracle is deterministic only because of construction
  * guarantees the planted media shard must uphold (see the
  * [[MediaReleaseQueries]] scaladoc — the perceptual arm is the one
  * arm DuckDB cannot replay). This spec pins those guarantees
  * directly, so a construction edit that silently breaks the
  * signature-arm pin fails HERE with a named reason instead of as an
  * opaque hash mismatch in the driver's gate.
  */
class MediaReleaseQueriesSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  test("perturbation guarantee: overwriting the first payload byte " +
      "flips at most 3 signature bits (the verify bar) and changes the " +
      "byte hash on every non-0x7F-leading payload") {
    val m = graft.Tables.documents(spark, sf)
      .select(col("doc_id").cast("long").as("doc_id"),
        graft.functions.Multimodal.payloadCol(col("doc_id")).as("payload"))
      .withColumn("ppayload", concat(lit(Array[Byte](0x7F.toByte)),
        expr("substring(payload, 2, 31)")))
      .withColumn("sig", graft.functions.Multimodal.sigCol(col("payload")))
      .withColumn("psig", graft.functions.Multimodal.sigCol(col("ppayload")))
      .withColumn("hamming",
        bit_count(col("sig").bitwiseXOR(col("psig"))).cast("long"))
      .withColumn("sameBytes",
        sha2(col("payload"), 256) === sha2(col("ppayload"), 256))
    val rows = m.select("doc_id", "hamming", "sameBytes").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) <= LlmQueries.PhashHammingMax.toLong,
        s"doc ${r.getLong(0)}: perturbation moved ${r.getLong(1)} bits — " +
          "outside the banding guarantee")
    }
    // at least one perturbation must be byte-visible for the media_
    // duplicate arm to be exercised at all (the 0x7F-leading payloads
    // fall through to the byte arm on both sides — tolerated, but they
    // must not be the WHOLE fixture)
    assert(rows.count(!_.getBoolean(2)) > 0,
      "every payload led with 0x7F — the perceptual arm never fires")
  }

  test("zero natural <=3-Hamming pairs among base payloads at sf0.001 " +
      "— the claim that makes 'flagged == planted' construction-exact") {
    val sigs = graft.Tables.documents(spark, sf)
      .select(col("doc_id").cast("long").as("doc_id"),
        graft.functions.Multimodal.sigCol(
          graft.functions.Multimodal.payloadCol(col("doc_id"))).as("sig"))
    val bands = graft.functions.Multimodal.sigBandFrame(sigs)
    val natural = bands.as("x").join(bands.as("y"),
        col("x.band_id") === col("y.band_id") &&
          col("x.bkey") === col("y.bkey") &&
          col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("a"), col("y.doc_id").as("b")).distinct()
      .join(sigs.select(col("doc_id").as("a"), col("sig").as("siga")), "a")
      .join(sigs.select(col("doc_id").as("b"), col("sig").as("sigb")), "b")
      .filter(bit_count(col("siga").bitwiseXOR(col("sigb"))) <=
        lit(LlmQueries.PhashHammingMax))
    assert(natural.count() === 0L,
      "a natural near-pair exists — the oracle's perceptual pin breaks")
  }

  test("r3 audit matrix invariants at sf0.001: release-2 decisions are " +
      "exactly the duplicate family and tally release-1 admissions " +
      "copy-for-copy (both appends actually reached the artifacts)") {
    val out = MediaReleaseQueries.r3.fn(spark, sf).collect()
    val rel1 = out.filter(_.getLong(0) == 1L)
    val rel2 = out.filter(_.getLong(0) == 2L)
    assert(rel2.nonEmpty, "release 2 must exercise the appended artifacts")
    assert(rel2.map(_.getString(1)).toSet
      .subsetOf(Set("corpus_duplicate", "media_duplicate")),
      "release 2 plants only copies of admitted items")
    // release 1 must have exercised EVERY decision arm
    assert(rel1.map(_.getString(1)).toSet === Set("corrupt",
      "corpus_duplicate", "media_duplicate", "too_small",
      "extreme_aspect", "admit"),
      s"release-1 arms: ${rel1.map(_.getString(1)).toSet}")
    val admit = rel1.filter(_.getString(1) == "admit")
      .map(r => (r.getLong(2), r.getLong(3))).head
    val off = graft.Tables.documents(spark, sf)
      .agg(max(col("doc_id").cast("long"))).collect()(0).getLong(0) + 1L
    // every admitted item yields exactly one byte copy at +2*off and
    // one perturbed copy at +3*off — counts AND id sums must reconcile
    // (the perturbed copies of 0x7F-leading payloads land in the
    // corpus_duplicate row instead, so compare the two rows JOINTLY)
    val n2 = rel2.map(_.getLong(2)).sum
    val s2 = rel2.map(_.getLong(3)).sum
    assert(n2 === 2L * admit._1, "release-2 row count vs admissions")
    assert(s2 === 2L * admit._2 + 5L * off * admit._1,
      "release-2 id-sum arithmetic (2a + (2+3)·off·n)")
  }
}
