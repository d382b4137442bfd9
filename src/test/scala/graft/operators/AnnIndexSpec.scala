package graft.operators

import java.nio.file.Files

import graft.{Session, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Persisted ANN indexes (AnnIndexes): probe-from-parquet must equal
  * the composed l12/l16 plans row for row — the build-once/probe-many
  * split cannot drift from the gate-checked composition. */
class AnnIndexSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  private def vecs(d: String) = Tables.embeddings(spark, d)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  private def pairs(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
    df.select("vec_id", "sim_e4").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("LSH probe from a materialized parquet band index equals the composed l12 plan") {
    val e = vecs(sf)
    val base = Files.createTempDirectory("graft_annidx_lsh_").toString
    AnnIndexes.writeLsh(AnnIndexes.lshBands(e), base)
    val probe = AnnIndexes.probeLsh(
      AnnIndexes.readLsh(spark, base), e,
      e.filter(col("vec_id") === 0), topK = 5, excludeId = 0L)
    val probed = pairs(probe)
    val composed = pairs(LlmQueries.l12.fn(spark, sf))
    assert(probed === composed)
    assert(probed.length === 5)
    // the band keys reach the index scan as PUSHED literal predicates
    // (row-group min/max skipping on the clustered layout) — a join
    // form would read the whole index
    val scan = probe.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("lsh_bands")).mkString("\n")
    assert(scan.contains("PushedFilters: [") && scan.contains("bval"),
      s"band keys not pushed into the index scan:\n$scan")
  }

  test("IVF probe from materialized centroids + inverted lists equals the composed l16 plan") {
    val e = vecs(sf)
    val base = Files.createTempDirectory("graft_annidx_ivf_").toString
    AnnIndexes.writeIvf(AnnIndexes.buildIvf(e, k = 16, iters = 2), base)
    val back = AnnIndexes.readIvf(spark, base)
    val probed = pairs(AnnIndexes.probeIvf(back, e,
      e.filter(col("vec_id") === 0), nprobe = 4, topK = 5, excludeId = 0L))
    val composed = pairs(LlmQueries.l16.fn(spark, sf))
    assert(probed === composed)
    assert(probed.length === 5)
    // the inverted file is genuinely directory-partitioned by cell —
    // the layout that lets a probe path-prune to nprobe/k of the files
    val cellDirs = new java.io.File(s"$base/ivf_lists")
      .listFiles().filter(_.isDirectory).map(_.getName).filter(_.startsWith("cid="))
    assert(cellDirs.length > 1, s"expected cid= partition dirs, got ${cellDirs.toSeq}")
    // every corpus vector is in exactly one persisted list
    assert(back.lists.count() === e.count())
    assert(back.lists.select("vec_id").distinct().count() === e.count())
    // and the probe PRUNES: the inverted-list scan must carry a dynamic
    // partition-pruning filter on cid (the probed-cells broadcast), so
    // only nprobe/k of the files are read — the load-bearing scale
    // claim of the directory-partitioned layout
    val probePlan = AnnIndexes.probeIvf(back, e,
      e.filter(col("vec_id") === 0), nprobe = 4, topK = 5, excludeId = 0L)
    probePlan.collect()
    val scan = probePlan.queryExecution.executedPlan.toString.linesIterator
      .filter(_.contains("ivf_lists")).mkString("\n")
    assert(scan.contains("dynamicpruning"),
      s"IVF probe scan lost dynamic partition pruning:\n$scan")
  }

  test("a NOVEL query vector (not in the corpus) probes both indexes without rebuild") {
    val e = vecs(sf)
    // perturb vector 0 so the query is genuinely out-of-corpus
    val novel = e.filter(col("vec_id") === 0)
      .select(expr("transform(v, x -> x * 0.9 + 0.01)").as("v"))
    val lsh = AnnIndexes.probeLsh(AnnIndexes.lshBands(e), e, novel, topK = 5)
    val ivf = AnnIndexes.probeIvf(AnnIndexes.buildIvf(e, 16, 2), e, novel,
      nprobe = 4, topK = 5)
    assert(lsh.collect().nonEmpty)
    assert(ivf.collect().length === 5)
    // a near-copy of vector 0 should rank vector 0 at the top of IVF's
    // candidates (cosine is scale-invariant, so 0.9·v+ε stays closest)
    assert(ivf.collect().head.getLong(0) === 0L)
  }

  test("sf0.01 golden: probe-from-parquet reproduces the pinned l12/l16 rows") {
    val sf01 = "/root/testdata/sf0.01"
    assume(new java.io.File(sf01).isDirectory)
    val e = vecs(sf01)
    val base = Files.createTempDirectory("graft_annidx_g_").toString
    AnnIndexes.writeLsh(AnnIndexes.lshBands(e), base)
    AnnIndexes.writeIvf(AnnIndexes.buildIvf(e, 16, 2), base)
    val q = e.filter(col("vec_id") === 0)
    val lsh = pairs(AnnIndexes.probeLsh(AnnIndexes.readLsh(spark, base), e, q, 5, 0L))
    assert(lsh === Seq((387L, 3311L), (73L, 2954L), (320L, 2879L),
      (483L, 2567L), (257L, 2481L)), s"lsh $lsh")
    val ivf = pairs(AnnIndexes.probeIvf(AnnIndexes.readIvf(spark, base), e, q, 4, 5, 0L))
    assert(ivf === Seq((365L, 3700L), (387L, 3311L), (423L, 2969L),
      (73L, 2954L), (190L, 2818L)), s"ivf $ivf")
  }
}
