package graft.operators

import graft.{Session, Tables}
import graft.functions.Ivf
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.ByteType
import org.scalatest.funsuite.AnyFunSuite

/** Int8-quantized IVF (l36): the quantization must be l24's exact rule,
  * the shortlist approximation must only ever NARROW (refine-covers-all
  * ≡ the fp64 probe), and the persisted index must genuinely store
  * int8. */
class QuantizedAnnSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  private def e = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("quantizeInt8 is l24's rule: driver recompute matches qv, scale " +
      "and norm on sample vectors") {
    val rows = AnnIndexes.quantizeInt8(e).orderBy("vec_id").limit(5)
      .select("vec_id", "v", "qv", "scale", "norm").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val v = r.getSeq[Double](1)
      val qv = r.getSeq[Byte](2)
      val m = v.map(math.abs).max
      val scale = if (m == 0d) 1.0 else 127.0 / m
      val expectQ = v.map(x =>
        (math.signum(x).toLong * math.round(math.abs(x) * scale)).toByte)
      assert(qv === expectQ, s"vec ${r.getLong(0)} qv")
      assert(math.abs(r.getDouble(3) - scale) < 1e-12, "scale")
      assert(math.abs(r.getDouble(4) - math.sqrt(v.map(x => x * x).sum)) < 1e-9,
        "norm")
    }
  }

  test("a refine window covering every candidate makes the int8 probe " +
      "EQUAL the fp64 probe — the approximation only narrows") {
    val n = e.count()
    val k = Ivf.cellCount(n)
    val nprobe = math.max(4, (k + 3) / 4)
    val idx8 = AnnIndexes.buildIvfInt8(e, k, iters = 2, n)
    val query = e.filter(col("vec_id") === 0)
    val int8All = AnnIndexes.probeIvfInt8(idx8, e, query,
      nprobe = nprobe, topK = 5, refine = n.toInt, excludeId = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val fp64 = AnnIndexes.probeIvf(
      AnnIndexes.IvfIndex(idx8.centroids, idx8.lists.select("vec_id", "cid")),
      e, query, nprobe = nprobe, topK = 5, excludeId = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(int8All === fp64)
    assert(int8All.size === 5)
  }

  test("write → read → probe ≡ the composed probe, and the persisted " +
      "lists store qv as array<tinyint>") {
    val n = e.count()
    val k = Ivf.cellCount(n)
    val nprobe = math.max(4, (k + 3) / 4)
    val idx8 = AnnIndexes.buildIvfInt8(e, k, iters = 2, n)
    val base = java.nio.file.Files
      .createTempDirectory("graft_ivf8_").toString
    AnnIndexes.writeIvfInt8(idx8, base)
    val back = AnnIndexes.readIvfInt8(spark, base)
    val qvField = back.lists.schema("qv").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType]
    assert(qvField.elementType === ByteType,
      s"persisted qv must be int8, got ${qvField.elementType}")
    val query = e.filter(col("vec_id") === 0)
    val fromDisk = AnnIndexes.probeIvfInt8(back, e, query,
      nprobe = nprobe, topK = 5, refine = 4, excludeId = 0L)
      .collect().map(_.toSeq).toSeq
    val composed = AnnIndexes.probeIvfInt8(idx8, e, query,
      nprobe = nprobe, topK = 5, refine = 4, excludeId = 0L)
      .collect().map(_.toSeq).toSeq
    assert(fromDisk === composed)
  }

  test("a batch of one equals the single int8 probe row-for-row, and a " +
      "3-query batch returns topK per qid") {
    val n = e.count()
    val k = Ivf.cellCount(n)
    val nprobe = math.max(4, (k + 3) / 4)
    val idx8 = AnnIndexes.buildIvfInt8(e, k, iters = 2, n)
    val single = AnnIndexes.probeIvfInt8(idx8, e,
      e.filter(col("vec_id") === 0), nprobe, topK = 5, refine = 4,
      excludeId = 0L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val batch1 = AnnIndexes.probeIvfInt8Batch(idx8, e,
      e.filter(col("vec_id") === 0).select(col("vec_id").as("qid"), col("v")),
      nprobe, topK = 5, refine = 4)
      .collect().map(r => (r.getLong(1), r.getLong(2))).toSeq
    assert(batch1 === single)
    val batch3 = AnnIndexes.probeIvfInt8Batch(idx8, e,
      e.filter(col("vec_id") < 3).select(col("vec_id").as("qid"), col("v")),
      nprobe, topK = 5, refine = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(batch3.map(_._1).distinct.sorted === Seq(0L, 1L, 2L))
    assert(batch3.groupBy(_._1).forall(_._2.size == 5), batch3.mkString(","))
  }

  test("l36 DQ: default-refine probe keeps recall — both in-plan overlap " +
      "counters are non-degenerate") {
    val rows = LlmQueries.l36.fn(spark, sf).collect()
    assert(rows.size === 5, s"topK rows: ${rows.size}")
    val exactOverlap = rows.head.getAs[Long]("n_exact_top5_overlap")
    val fp64Overlap = rows.head.getAs[Long]("n_vs_fp64_overlap")
    // int8 shortlist at refine=4 must broadly agree with both oracles
    assert(exactOverlap >= 3L, s"exact-top5 overlap $exactOverlap")
    assert(fp64Overlap >= 3L, s"fp64-probe overlap $fp64Overlap")
  }

  test("retractIvfInt8: removing vectors equals a quantize-and-assign " +
      "rebuild over the complement under the same frozen centroids, a " +
      "full takedown leaves a readable empty index, and the combined " +
      "AnnIndexes.retract covers the int8 artifact too") {
    import java.nio.file.Files
    val evens = e.filter(col("vec_id") % 2 === 0)
    val odds = e.filter(col("vec_id") % 2 =!= 0)
    val n = e.count()
    val base = Files.createTempDirectory("graft_q8_retr_").toString
    val idx = AnnIndexes.buildIvfInt8(e, 8, iters = 2, n)
    AnnIndexes.writeIvfInt8(idx, base)
    def lists() = AnnIndexes.readIvfInt8(spark, base).lists
      .selectExpr("vec_id", "CAST(cid AS INT) AS cid", "scale", "norm")
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
      .sorted.toSeq
    AnnIndexes.retractIvfInt8(spark, odds.select("vec_id"), base)
    val rebuilt = AnnIndexes.buildIvfInt8From(idx.centroids, evens).lists
      .selectExpr("vec_id", "CAST(cid AS INT) AS cid", "scale", "norm")
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getDouble(2), r.getDouble(3)))
      .sorted.toSeq
    assert(lists() === rebuilt,
      "int8 retract must equal the complement rebuild under frozen centroids")
    // probes see only survivors
    val q = e.filter(col("vec_id") === 0)
    val got = AnnIndexes.probeIvfInt8(AnnIndexes.readIvfInt8(spark, base),
        evens, q, nprobe = 8, topK = 5, excludeId = 0L)
      .select("vec_id").collect().map(_.getLong(0))
    assert(got.nonEmpty && got.forall(_ % 2 == 0),
      s"post-retract probe must only see survivors: ${got.toSeq}")
    // the combined retract covers ivf8_lists (full takedown → readable
    // empty sentinel with the schema intact)
    AnnIndexes.retract(spark, evens.select("vec_id"), base)
    val emptied = AnnIndexes.readIvfInt8(spark, base).lists
    assert(emptied.count() === 0L)
    assert(Seq("vec_id", "qv", "scale", "norm", "cid")
      .forall(emptied.columns.contains), emptied.columns.mkString(","))
    // takedown → re-ingest: the sentinel clears and the partitioned
    // append rebuilds the layout (appendIvf's contract on the int8 twin)
    AnnIndexes.appendIvfInt8(spark, odds, base)
    assert(AnnIndexes.readIvfInt8(spark, base).lists
        .select("vec_id").collect().map(_.getLong(0)).toSet ===
      odds.select("vec_id").collect().map(_.getLong(0)).toSet,
      "post-takedown int8 append must land exactly the new batch")
  }

  test("appendIvfInt8: assign+quantize under the frozen persisted " +
      "centroids equals the full rebuild row-for-row") {
    import java.nio.file.Files
    val evens = e.filter(col("vec_id") % 2 === 0)
    val odds = e.filter(col("vec_id") % 2 =!= 0)
    val base = Files.createTempDirectory("graft_q8_app_").toString
    val idxHalf = AnnIndexes.buildIvfInt8(evens, 8, iters = 2, evens.count())
    AnnIndexes.writeIvfInt8(idxHalf, base)
    AnnIndexes.appendIvfInt8(spark, odds, base)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .selectExpr("vec_id", "CAST(cid AS INT) AS cid", "qv", "scale", "norm")
      .collect().map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Byte](2).toSeq, r.getDouble(3), r.getDouble(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(rows(AnnIndexes.readIvfInt8(spark, base).lists) ===
      rows(AnnIndexes.buildIvfInt8From(idxHalf.centroids, e).lists),
      "append-then-read must equal a rebuild over the union corpus")
  }
}
