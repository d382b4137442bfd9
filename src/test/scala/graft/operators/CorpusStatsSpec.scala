package graft.operators

import graft.{Session, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Corpus-statistics operators (l41 vocabulary + coverage): semantics
  * re-derived driver-side at sf0.001, independent of the DuckDB oracle,
  * plus the scale plan shape (TakeOrdered vocab, broadcast mark join). */
class CorpusStatsSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  private val TokRe = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  test("l41 vocab coverage equals a brute driver-side recompute and the " +
      "16-token vocabulary genuinely binds") {
    val rows = LlmQueries.l41.fn(spark, sf).collect()
    assert(rows.nonEmpty)

    // brute recompute: token counts per (lang, tok) in plain Scala
    val toks = Tables.documents(spark, sf)
      .filter(col("text").isNotNull)
      .select(col("lang"), col("text")).collect()
      .flatMap { r =>
        TokRe.r.findAllIn(r.getString(1).toLowerCase).map(r.getString(0) -> _)
      }
    val langTok = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val global = toks.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val vocab = global.toSeq.sortBy { case (t, c) => (-c, t) }
      .take(LlmQueries.VocabSize).map(_._1).toSet
    assert(vocab.size === LlmQueries.VocabSize,
      "corpus vocabulary must exceed V for the cut to bind")

    for (r <- rows) {
      val lang = r.getString(0)
      val mine = langTok.collect { case ((l, t), c) if l == lang => (t, c) }
      assert(r.getAs[Long]("n_occ") === mine.map(_._2).sum, s"$lang n_occ")
      assert(r.getAs[Long]("n_occ_vocab") ===
        mine.collect { case (t, c) if vocab(t) => c }.sum, s"$lang in-vocab")
      assert(r.getAs[Long]("n_types") === mine.size, s"$lang types")
      assert(r.getAs[Long]("n_types_vocab") ===
        mine.count { case (t, _) => vocab(t) }, s"$lang vocab types")
      assert(r.getAs[Long]("oov_bp") >= 0 && r.getAs[Long]("oov_bp") <= 10000)
    }
    // the cut line is visible somewhere: OOV occurrences exist
    assert(rows.map(_.getAs[Long]("n_occ")).sum >
      rows.map(_.getAs[Long]("n_occ_vocab")).sum)
  }

  test("l44 snapshot diff classifies exactly the planted version history") {
    val rows = CorpusOpsQueries.l44.fn(spark, sf).collect()
    assert(rows.nonEmpty)
    val dd = Tables.documents(spark, sf).filter(col("text").isNotNull)
    val added = dd.filter(col("doc_id") % 7 === 0).count()
    val removed = dd.filter(col("doc_id") % 13 === 0).count()
    // modified = ' edited' in v1 AND still present in v1 (%7 wins)
    val modified = dd.filter(col("doc_id") % 11 === 0 &&
      col("doc_id") % 7 =!= 0).count()
    val total = dd.count()
    assert(rows.map(_.getAs[Long]("n_added")).sum === added)
    assert(rows.map(_.getAs[Long]("n_removed")).sum === removed)
    assert(rows.map(_.getAs[Long]("n_modified")).sum === modified)
    assert(rows.map(_.getAs[Long]("n_unchanged")).sum ===
      total - added - modified)
    // checksums pin WHICH docs, not just counts
    val expectAdded = dd.filter(col("doc_id") % 7 === 0)
      .agg(coalesce(sum("doc_id"), lit(0L))).collect().head.getLong(0)
    assert(rows.map(_.getAs[Long]("added_checksum")).sum === expectAdded)
  }

  test("l44's diff is ONE primary-key equi-join (co-partitionable at " +
      "scale), never a nested loop over the snapshots") {
    val plan = CorpusOpsQueries.l44.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("FullOuter"), s"full-outer diff join:\n$plan")
    // the only BNLJ is the 1-row offset broadcast; the snapshot join
    // itself must be hash/sort-merge on doc_id
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"), s"keyed join expected:\n$plan")
  }

  test("l41 plan: the vocabulary is a TakeOrdered (no global sort) and " +
      "marks tokens through a broadcast join") {
    val plan = LlmQueries.l41.fn(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"vocab cut:\n$plan")
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastExchange"), s"mark join must broadcast:\n$plan")
  }
}
