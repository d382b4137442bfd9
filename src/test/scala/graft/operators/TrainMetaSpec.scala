package graft.operators

import graft.Session
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[TrainMeta]]'s two round-18 hardenings, pinned directly:
  *
  *  1. MEMO SAFETY: [[TrainMeta.hasRetractionsSinceTrain]] caches the
  *     marker-dir content read per (mtime, file count) — the pin is
  *     that every staleness TRANSITION still lands after a warm memo:
  *     stamp → fresh, mark → stale (dir appeared), mark again → still
  *     stale (count changed), re-stamp → fresh (dir gone). A memo that
  *     over-caches would freeze one of these flips.
  *  2. LAYOUT MIGRATION: a stamp written under an OLDER sidecar layout
  *     (fewer fingerprint columns than the current 4) makes
  *     [[TrainMeta.isStaleFor]] answer STALE — a verdict, not a
  *     `fieldIndex` crash — so pre-existing stamped artifacts flow
  *     into the ordinary rebuild-and-re-stamp path.
  */
class TrainMetaSpec extends AnyFunSuite {

  private lazy val spark = Session.get()

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def idFrame(ids: Long*) = {
    import spark.implicits._
    ids.toDF("doc_id")
  }

  test("staleness flips survive the warm hasRetractionsSinceTrain memo") {
    val base = tmp("graft_tm_memo")
    val corpus = idFrame(1L, 2L, 3L)
    TrainMeta.stamp(corpus, base)
    // warm the memo: repeated probes of the fresh artifact
    (1 to 3).foreach { _ =>
      assert(!TrainMeta.hasRetractionsSinceTrain(spark, base),
        "fresh stamp has no retractions")
    }
    TrainMeta.markRetraction(idFrame(2L), base)
    assert(TrainMeta.hasRetractionsSinceTrain(spark, base),
      "a mark after a warm fresh memo must flip to stale")
    assert(TrainMeta.isStale(spark, base))
    // warm the STALE verdict, then mark again — still stale (the memo
    // key moved with the marker file count, so no stale entry can ever
    // mask a later transition either way)
    (1 to 3).foreach { _ =>
      assert(TrainMeta.hasRetractionsSinceTrain(spark, base))
    }
    TrainMeta.markRetraction(idFrame(3L), base)
    assert(TrainMeta.hasRetractionsSinceTrain(spark, base))
    // re-stamp clears the markers — fresh again despite the warm memo
    TrainMeta.stamp(idFrame(1L), base)
    assert(!TrainMeta.hasRetractionsSinceTrain(spark, base),
      "a re-stamp after a warm stale memo must flip back to fresh")
    assert(!TrainMeta.isStale(spark, base))
    // and the gate at the scoring site agrees with the memoized verdict
    TrainMeta.assertFresh(spark, base, allowStale = false, "test artifact")
    TrainMeta.markRetraction(idFrame(1L), base)
    val ex = intercept[IllegalStateException] {
      TrainMeta.assertFresh(spark, base, allowStale = false, "test artifact")
    }
    assert(ex.getMessage.contains("STALE"), ex.getMessage)
  }

  test("a pre-id_hash2_xor (3-column) sidecar reads as STALE, not a crash") {
    val base = tmp("graft_tm_layout")
    val corpus = idFrame(10L, 20L, 30L)
    // hand-write the OLD 3-column layout the ADVICE finding describes:
    // an artifact stamped before the second keyed fold existed
    corpus.agg(
        count(lit(1)).as("n_docs"),
        coalesce(expr("bit_xor(doc_id)"), lit(0L)).as("id_xor"),
        coalesce(expr("bit_xor(xxhash64(doc_id))"), lit(0L)).as("id_hash_xor"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/train_meta")
    // the verdict is STALE even though every column the old stamp DOES
    // carry matches the corpus exactly — the missing column is the
    // mismatch, and the caller's rebuild re-stamps the current layout
    assert(TrainMeta.isStaleFor(corpus, base),
      "an old-layout stamp must read stale, not crash")
    TrainMeta.stamp(corpus, base)
    assert(!TrainMeta.isStaleFor(corpus, base),
      "re-stamping under the current layout restores the strong check")
  }
}
