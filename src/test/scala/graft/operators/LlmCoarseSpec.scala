package graft.operators

import graft.{Session, Tables}
import graft.functions.Ivf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cap-regime coarse-assignment arm WIRED INTO its consumers —
  * round 18's closing of the "remedy ships but nothing user-facing
  * consumes it" gap. [[Ivf.assignAuto]]/[[Ivf.assignAutoWithDist]]
  * pick exact assignment below [[Ivf.CellCap]] (every sf gate —
  * bit-identical to the pre-selector plans, pinned here) and the
  * measured-7.5×-cheaper two-level arm at the cap. Because the gates
  * run far below the cap, the coarse arm is FORCED here at gate scale
  * to pin what the 100× regime actually gets:
  *
  *  - l26 (SemDeDup) under coarse assignment: corpus counters
  *    unchanged, planted recall ≥ 80% held, kept = corpus − marked;
  *  - l50 (prototype prune) under coarse assignment: totals preserved,
  *    the per-cell ⌊n/5⌋ quota exact over the REALIZED coarse cells,
  *    pruned-core mean d² strictly below kept mean d²;
  *  - [[Ivf.assignCoarseWithDist]]: degenerate exactness when
  *    probeSuper covers every super-cell, kept d2 = the true distance
  *    to the chosen centroid (never an underestimate of the exact
  *    argmin's).
  */
class LlmCoarseSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  private def vecs = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("assignAuto and assignAutoWithDist are bit-identical to the exact " +
      "forms below the cell cap (the sf-gate regime)") {
    val e = vecs
    val n = e.count()
    val k = Ivf.cellCount(n)
    assert(k < Ivf.CellCap, s"fixture corpus must sit below the cap, k=$k")
    val c = Ivf.trainSampled(e, k, 2, n).localCheckpoint()
    assert(Ivf.assignAuto(e, c, k).orderBy("vec_id").collect().toSeq ===
      Ivf.assign(e, c).orderBy("vec_id").collect().toSeq,
      "below the cap assignAuto IS assign")
    assert(Ivf.assignAutoWithDist(e, c, k).orderBy("vec_id").collect().toSeq ===
      Ivf.assignWithDist(e, c).orderBy("vec_id").collect().toSeq,
      "below the cap assignAutoWithDist IS assignWithDist")
  }

  test("assignCoarseWithDist: exact when probeSuper covers every " +
      "super-cell; kept d2 is the TRUE distance to the chosen centroid " +
      "and never under the exact argmin's") {
    val e = vecs
    val n = e.count()
    val k = 16 // s = 4 super-cells
    val c = Ivf.trainSampled(e, k, 2, n).localCheckpoint()
    val exact = Ivf.assignWithDist(e, c).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    val full = Ivf.assignCoarseWithDist(e, c, k, probeSuper = 4).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(full === exact,
      "probeSuper covering all super-cells must equal assignWithDist")
    val cent = c.collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
    val vmap = e.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0d; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val coarse = Ivf.assignCoarseWithDist(e, c, k, probeSuper = 2).collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2))).toMap
    assert(coarse.keySet === exact.keySet, "count-preserving")
    coarse.foreach { case (v, (cid, dd)) =>
      assert(math.abs(dd - d2(vmap(v), cent(cid))) < 1e-9,
        s"vec $v: kept d2 must be the true distance to cell $cid")
      assert(dd >= exact(v)._2 - 1e-12,
        s"vec $v: coarse d2 cannot beat the exact argmin")
    }
    val agree = coarse.count { case (v, (cid, _)) => exact(v)._1 == cid }
    assert(agree.toDouble / n >= 0.90,
      s"coarse/exact agreement ${agree.toDouble / n} below the 90% bar")
  }

  test("train's lloydStepAuto fold is bit-identical to the explicit " +
      "exact fold below the cap, and the at-cap coarse fold still " +
      "trains a usable quantizer") {
    val e = vecs
    val exactFold = (1 to 2).foldLeft(Ivf.seedCentroids(e, 8))(
      (c, _) => Ivf.lloydStep(e, c))
    assert(Ivf.train(e, 8, 2).orderBy("cid").collect().toSeq ===
      exactFold.orderBy("cid").collect().toSeq,
      "below the cap train IS the exact Lloyd fold")
    // k pinned AT the cap on the small fixture: the fold runs the
    // coarse argmin end-to-end; the result must still be a valid
    // quantizer — deterministic, full-dimension centroids, and an
    // assignment over them partitions the corpus
    val atCap = Ivf.train(e, Ivf.CellCap, 1)
    val again = Ivf.train(e, Ivf.CellCap, 1)
    assert(atCap.orderBy("cid").collect().toSeq ===
      again.orderBy("cid").collect().toSeq, "at-cap training deterministic")
    val cents = atCap.localCheckpoint()
    assert(cents.collect().forall(_.getSeq[Double](1).length === 64))
    val n = e.count()
    val assigned = Ivf.assignAuto(e, cents, Ivf.CellCap)
    assert(assigned.count() === n)
    assert(assigned.select("vec_id").distinct().count() === n,
      "at-cap coarse assignment still partitions the corpus")
  }

  test("l26 under the FORCED coarse arm: corpus counters unchanged, " +
      "planted recall >= 80% held, kept = corpus - marked") {
    val k = LlmQueries.sharedIvfK(spark, sf)
    val exactRow = LlmQueries.l26From(spark, sf,
      (e, c) => Ivf.assign(e, c)).head()
    val coarseRow = LlmQueries.l26From(spark, sf,
      (e, c) => Ivf.assignCoarse(e, c, k, probeSuper = 2)).head()
    def g(r: org.apache.spark.sql.Row, c: String) = r.getAs[Long](c)
    // corpus-shape counters are assignment-independent
    assert(g(coarseRow, "n_vecs") === g(exactRow, "n_vecs"))
    assert(g(coarseRow, "n_planted") === g(exactRow, "n_planted"))
    assert(g(coarseRow, "n_kept") ===
      g(coarseRow, "n_vecs") - g(coarseRow, "n_dup_marked"),
      "kept must remain corpus minus marked under coarse cells")
    // the operator's documented quality bar HOLDS under the coarse arm:
    // a planted near-identical copy probes the same super-cells as its
    // original (near-identical distances), so pairs survive cell-split
    // at the same >= 80% bar the exact arm is pinned to
    val recall = g(coarseRow, "n_planted_found").toDouble /
      g(coarseRow, "n_planted")
    assert(recall >= 0.80,
      s"coarse-arm planted recall $recall below the 80% bar")
  }

  test("l50 under the FORCED coarse arm: totals preserved, per-cell " +
      "quota exact over the realized coarse cells, pruned core denser " +
      "than kept") {
    val raw = Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val centroids = LlmQueries.sharedIvfCentroids(spark, sf)
    val k = LlmQueries.sharedIvfK(spark, sf)
    val coarseAssign: (org.apache.spark.sql.DataFrame,
      org.apache.spark.sql.DataFrame) => org.apache.spark.sql.DataFrame =
      (e, c) => Ivf.assignCoarseWithDist(e, c, k, probeSuper = 2)
    val out = LlmQueries.prototypePruneFrom(raw, centroids, coarseAssign)
      .collect()
    val nVecs = out.map(_.getAs[Long]("n_vecs")).sum
    assert(nVecs === raw.count(), "every vector accounted for")
    // the prune fold is exact over WHATEVER cells the assignment
    // realized: recompute the per-cell ⌊n/5⌋ quota from the coarse
    // assignment frame itself
    val cells = coarseAssign(raw.select("vec_id", "v"), centroids)
      .groupBy("cid").agg(count(lit(1)).as("n"))
      .collect().map(_.getAs[Long]("n"))
    val quota = cells.map(_ / LlmQueries.PrototypePruneDen).sum
    assert(out.map(_.getAs[Long]("n_pruned")).sum === quota,
      "pruned count must equal the summed per-cell quota of the " +
        "realized coarse cells")
    // dense-core claim survives the coarse arm: mean pruned d2 < mean
    // kept d2 (guard against a zero-prune degenerate fixture)
    val prunedN = out.map(_.getAs[Long]("n_pruned")).sum
    val keptN = nVecs - prunedN
    assert(prunedN > 0 && keptN > 0, "fixture must prune a strict subset")
    val prunedMass = out.map(_.getAs[Long]("pruned_d2e4_sum")).sum.toDouble / prunedN
    val keptMass = out.map(_.getAs[Long]("kept_d2e4_sum")).sum.toDouble / keptN
    assert(prunedMass < keptMass,
      s"pruned per-vector d2 mass $prunedMass must undercut kept $keptMass")
  }
}
