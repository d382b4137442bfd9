package graft.operators

import graft.{Session, Tables}
import graft.functions.Multimodal
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multimodal perceptual-hash dedup (l53): the signature stage must
  * equal a driver-side recompute of the histogram+threshold math, a
  * one-byte payload perturbation must stay within 2 signature bits
  * (the constant-mean argument), and the DQ's planted recall must be
  * exactly total with zero natural matches. */
class MediaDedupSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  private def sigOf(payload: Array[Byte]): Long = {
    val bins = 64
    val counts = new Array[Double](bins)
    payload.foreach { b => counts(((b & 0xFF) * bins) / 256) += 1.0 }
    val n = math.max(1, payload.length)
    val hist = counts.map(_ / n)
    val m = hist.sum / bins
    var sig = 0L
    var i = 0
    while (i < 64) { if (hist(i) > m) sig |= (1L << i); i += 1 }
    sig
  }

  private def payloadOf(docId: Long): Array[Byte] = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(s"media:$docId".getBytes("UTF-8"))
  }

  test("perceptualHash equals the driver-side histogram+threshold recompute") {
    import org.apache.spark.sql.Encoders
    val dd = Tables.documents(spark, sf).limit(20)
    val raw = dd.select(col("doc_id"),
      Multimodal.payloadCol(col("doc_id")).as("payload"))
      .as[Multimodal.MediaRaw](Encoders.product[Multimodal.MediaRaw])
    val got = Multimodal.perceptualHash(Multimodal.extractFeatures(raw, 64))
      .collect().map(s => s.doc_id -> s.sig).toMap
    got.foreach { case (id, sig) =>
      assert(sig === sigOf(payloadOf(id)), s"doc $id") }
    assert(got.nonEmpty)
  }

  test("a one-byte perturbation flips at most 2 signature bits (the " +
      "constant-mean argument), so banding can never miss a planted pair") {
    val ids = Tables.documents(spark, sf).select("doc_id")
      .filter(col("doc_id") % 10 === 0)
      .collect().map(_.getLong(0))
    assert(ids.nonEmpty)
    ids.foreach { id =>
      val orig = payloadOf(id)
      val pert = 0x7F.toByte +: orig.drop(1)
      val h = java.lang.Long.bitCount(sigOf(orig) ^ sigOf(pert))
      assert(h <= 2, s"doc $id perturbation flipped $h bits")
    }
  }

  test("l53 DQ: planted recall is exactly total, natural matches zero, " +
      "and the counters reconcile") {
    val row = LlmQueries.l53.fn(spark, sf).collect().head
    val nDocs = Tables.documents(spark, sf).count()
    val nPlanted = Tables.documents(spark, sf)
      .filter(col("doc_id") % 10 === 0).count()
    assert(row.getAs[Long]("n_media") === nDocs + nPlanted)
    assert(row.getAs[Long]("n_planted") === nPlanted)
    assert(row.getAs[Long]("n_planted_found") === nPlanted,
      "the ≤2-bit perturbation cannot dodge all four bands")
    assert(row.getAs[Long]("recall_bp") === 10000L)
    assert(row.getAs[Long]("n_natural_matched") === 0L,
      "random payload signatures sit ~30 bits apart — nothing natural matches")
    // candidates are a bounded superset of matches, never all-pairs
    val n = row.getAs[Long]("n_media")
    assert(row.getAs[Long]("n_candidate_pairs") >= row.getAs[Long]("n_matched_pairs"))
    assert(row.getAs[Long]("n_candidate_pairs") < n * (n - 1) / 4,
      "banding must prune the pair space")
  }

  test("l58 media quality: keep/violation sets equal a driver-side " +
      "header recompute, and both rules genuinely bind") {
    val rows = LlmQueries.l58.fn(spark, sf).collect()
    val ids = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0))
    val hdr = ids.map { id =>
      val b = payloadOf(id)
      val w = ((b(0) & 0xFF) << 8) | (b(1) & 0xFF)
      val h = ((b(2) & 0xFF) << 8) | (b(3) & 0xFF)
      (id, w, h)
    }
    val small = hdr.filter { case (_, w, h) => w < 4096 || h < 4096 }
    val extreme = hdr.filter { case (_, w, h) =>
      math.max(w, h).toLong > 4L * math.min(w, h) }
    val kept = hdr.filterNot { case t =>
      small.contains(t) || extreme.contains(t) }
    assert(rows.map(_.getAs[Long]("n_media")).sum === ids.length.toLong)
    assert(rows.map(_.getAs[Long]("n_small")).sum === small.length.toLong)
    assert(rows.map(_.getAs[Long]("n_extreme_aspect")).sum ===
      extreme.length.toLong)
    assert(rows.map(_.getAs[Long]("n_kept")).sum === kept.length.toLong)
    assert(rows.map(_.getAs[Long]("kept_checksum")).sum ===
      kept.map(_._1).sum)
    assert(rows.map(_.getAs[Long]("kept_pixels")).sum ===
      kept.map { case (_, w, h) => w.toLong * h.toLong }.sum)
    // differential at every sf: uniform 16-bit dims put ~1/8 under the
    // size floor and ~1/4 past the aspect bound — neither arm vacuous
    assert(small.nonEmpty && extreme.nonEmpty && kept.nonEmpty)
  }
}
