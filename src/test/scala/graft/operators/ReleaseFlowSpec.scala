package graft.operators

import graft.{Session, Tables}
import graft.streaming.StreamingNearDup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end release composition: the three persisted dedup artifacts
  * screen and absorb a shard in one call, decisions match the
  * components' own semantics, a re-release admits nothing, and every
  * artifact after the release equals the artifact rebuilt from scratch
  * over corpus ∪ admitted. */
class ReleaseFlowSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  private def docsAll = Tables.documents(spark, sf)
    .filter(col("text").isNotNull)
    .select("lang", "doc_id", "text")

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** corpus = %3 ≠ 0 docs; shard = the %3 = 0 docs (novel) plus, at
    * offset ids, one exact replay and one first-token-dropped near-dup
    * of corpus docs. */
  private def fixture() = {
    val corpus = docsAll.filter(col("doc_id") % 3 =!= 0)
    val novel = docsAll.filter(col("doc_id") % 3 === 0)
    val off = 1000000L
    val replaySrc = corpus.orderBy("doc_id").limit(1)
    val replay = replaySrc.select(col("lang"),
      (col("doc_id") + lit(off)).as("doc_id"), col("text"))
    val nearSrc = corpus.orderBy(desc("doc_id")).limit(1)
    val near = nearSrc.select(col("lang"),
      (col("doc_id") + lit(off) + lit(1L)).as("doc_id"),
      expr("substring(text, instr(text, ' ') + 1)").as("text"))
    // a malformed null-text row: the release screen must DROP it (it
    // can neither be screened nor indexed — admitting would break
    // idempotence), not label it
    val nullRow = replaySrc.select(col("lang"),
      (col("doc_id") + lit(off) + lit(2L)).as("doc_id"),
      lit(null).cast("string").as("text"))
    val shard = novel.unionByName(replay).unionByName(near)
      .unionByName(nullRow)
    (corpus, shard,
      replay.select("doc_id").collect().map(_.getLong(0)).toSet,
      near.select("doc_id").collect().map(_.getLong(0)).toSet,
      novel.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("release labels replay/near/novel correctly, appends only the " +
      "admitted slice, and a re-release admits nothing") {
    val base = tmp("graft_release")
    val (corpus, shard, replayIds, nearIds, novelIds) = fixture()
    ReleaseFlow.init(corpus, base)

    val decided = ReleaseFlow.release(spark, shard, base)
      .select("doc_id", "decision").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(decided.size.toLong === shard.count() - 1,
      "the null-text row must be dropped, every other row labeled")
    replayIds.foreach(id => assert(decided(id) === "corpus_duplicate", s"$id"))
    nearIds.foreach(id => assert(decided(id) === "near_duplicate", s"$id"))
    // the novel slice: no hash can match (ids and texts disjoint from
    // the corpus), so nothing reads corpus_duplicate; the corpus'
    // NATURAL near-dup families straddle the %3 split, so a minority
    // legitimately reads near_duplicate — most admits
    novelIds.foreach(id => assert(decided(id) !== "corpus_duplicate", s"$id"))
    val admitCount = novelIds.count(id => decided(id) == "admit")
    assert(admitCount * 10 >= novelIds.size * 8,
      s"most novel docs must admit: $admitCount of ${novelIds.size}")

    // idempotence by artifact semantics: the same shard re-released
    // admits nothing — every formerly-admitted row is now byte-known
    // to the hash index
    val admittedIds = decided.collect { case (id, "admit") => id }.toSet
    val again = ReleaseFlow.release(spark, shard, base)
      .select("doc_id", "decision").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    admittedIds.foreach(id => assert(again(id) === "corpus_duplicate", s"$id"))
    nearIds.foreach(id => assert(again(id) === "near_duplicate", s"$id"))
    assert(!again.values.exists(_ == "admit"), again.toString)
  }

  test("after a release every artifact equals the artifact rebuilt from " +
      "scratch over corpus ∪ admitted (composition-level append ≡ rebuild)") {
    val base = tmp("graft_release2")
    val (corpus, shard, _, _, novelIds) = fixture()
    ReleaseFlow.init(corpus, base)
    val decided = ReleaseFlow.release(spark, shard, base)
    val admitted = decided.filter(col("decision") === "admit").drop("decision")
    // most (not all) of the novel slice admits — natural near-dup
    // families straddle the corpus/shard split
    assert(admitted.count() >= novelIds.size.toLong * 8 / 10 &&
      admitted.count() > 0L)
    val union = corpus.unionByName(admitted)

    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet

    assert(rows(DedupIndex.read(spark, ReleaseFlow.dedupDir(base))) ===
      rows(DedupIndex.build(union)), "hash index")
    assert(rows(SubstringIndex.read(spark, ReleaseFlow.substrDir(base))) ===
      rows(SubstringIndex.build(union)), "substring index")
    val persisted = StreamingNearDup.readIndex(spark, ReleaseFlow.neardupDir(base))
    val rebuilt = StreamingNearDup.buildIndex(union)
    assert(rows(persisted.bands) === rows(rebuilt.bands), "band index")
    assert(rows(persisted.sketch.select("doc_id")) ===
      rows(rebuilt.sketch.select("doc_id")), "sketch ids")
  }

  test("audit rolls decisions up per (lang, decision) with checksums " +
      "reconciling to the decision frame") {
    val base = tmp("graft_release3")
    val (corpus, shard, _, _, _) = fixture()
    ReleaseFlow.init(corpus, base)
    val decided = ReleaseFlow.release(spark, shard, base)
    val audit = ReleaseFlow.audit(decided).collect()
    assert(audit.map(_.getAs[Long]("n_docs")).sum === decided.count())
    assert(audit.map(_.getAs[Long]("doc_id_sum")).sum ===
      decided.agg(sum("doc_id")).collect().head.getLong(0))
    assert(audit.map(_.getAs[String]("decision")).toSet.contains("admit"))
  }
}
