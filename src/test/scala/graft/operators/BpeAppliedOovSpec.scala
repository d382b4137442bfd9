package graft.operators

import graft.Session
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The OOV contract of [[BpeIndex.applied]]: applying a PERSISTED
  * trained tokenizer to a corpus the trainer never saw — the entire
  * point of the artifact — must fall back to char-count segmentation
  * for unseen words, not fail the job. The lookup follows the
  * `try_element_at` convention [[CleaningQueries]] established for
  * tolerant map access. (Precise ANSI behavior, for the record: since
  * Spark 3.3 / SPARK-40066 a plain `element_at(map, key)` also returns
  * NULL for a missing MAP key even under ANSI — only ARRAY indexing
  * throws — so the try-form is about stating the fallback intent and
  * guarding against that behavior ever tightening, not about a crash
  * observed today.) This spec pins the fallback itself.
  */
class BpeAppliedOovSpec extends AnyFunSuite {

  private lazy val spark = Session.get()

  test("applied() on a corpus with words outside the trained map " +
      "falls back to char-count segments instead of throwing") {
    import spark.implicits._
    val dict = Seq("low" -> 5L, "lower" -> 2L)
    val merges = BpeIndex.trainFromDict(dict, 4)
    val segMap = BpeIndex.segmentMap(dict.map(_._1), merges)
    val novel = Seq((1L, "low unseen zz"), (2L, "lower")).toDF("doc_id", "text")
    val out = BpeIndex.applied(novel, BpeIndex.segMapCol(segMap))
      .select("doc_id", "n_toks", "n_segs").orderBy("doc_id").collect()
    // 'unseen' (6 chars) and 'zz' (2 chars) fall back to char counts
    assert(out(0).getLong(1) === 3L)
    assert(out(0).getLong(2) === segMap("low") + 6L + 2L)
    assert(out(1).getLong(2) === segMap("lower"))
  }

  test("applied() under an EMPTY map (no trained release yet) " +
      "char-segments every word") {
    import spark.implicits._
    val novel = Seq((1L, "ab cde")).toDF("doc_id", "text")
    val out = BpeIndex.applied(novel,
      BpeIndex.segMapCol(Map.empty[String, Long])).collect()
    assert(out(0).getAs[Long]("n_segs") === 5L)
  }
}
