package graft.operators

import graft.{Session, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Materialized training order: reading the written shard files in
  * shard order replays the exact permutation the l55/l60 DQs
  * fingerprint — order_fp recomputed from FILE ROW ORDER equals the
  * DQs' windowed order_fp, shard by shard. */
class EpochShardsSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, sf)

  /** Σ (position+1)·doc_id over the frame's PHYSICAL row order — no
    * sort, no window: exactly what a training reader consumes. */
  private def fileOrderFp(df: org.apache.spark.sql.DataFrame): Long =
    df.select("doc_id").collect().map(_.getLong(0))
      .zipWithIndex.map { case (id, i) => (i + 1).toLong * id }.sum

  test("epoch shards replay l55's permutation: per (epoch, shard), " +
      "order_fp from file row order equals the DQ's windowed order_fp") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_epoch_shards_").toString
    EpochShards.writeShards(docs, 0, base)
    EpochShards.writeShards(docs, 1, base)
    val dq = SamplingQueries.l55.fn(spark, sf).collect()
      .map(r => (r.getAs[Int]("epoch"), r.getAs[Long]("shard")) ->
        (r.getAs[Long]("order_fp"), r.getAs[Long]("n_docs"))).toMap
    assert(dq.nonEmpty)
    dq.foreach { case ((epoch, shard), (fp, n)) =>
      val sh = EpochShards.readShard(spark, base, epoch, shard)
      assert(sh.count() === n, s"epoch=$epoch shard=$shard row count")
      assert(fileOrderFp(sh) === fp,
        s"epoch=$epoch shard=$shard: file order must replay the DQ order")
    }
    // one file per shard directory — the single-writer-per-shard
    // contract that makes physical order the permutation
    val dir = new java.io.File(s"$base/epoch=0")
    dir.listFiles.filter(_.getName.startsWith("shard=")).foreach { d =>
      assert(d.listFiles.count(_.getName.endsWith(".parquet")) === 1,
        s"${d.getName} must hold exactly one file")
    }
  }

  test("curriculum shards replay l60's permutation per (phase, shard), " +
      "and the ord column rides along sorted") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_curr_shards_").toString
    EpochShards.writeCurriculumShards(docs, base)
    val dq = SamplingQueries.l60.fn(spark, sf).collect()
      .map(r => (r.getAs[Int]("phase"), r.getAs[Long]("shard")) ->
        r.getAs[Long]("order_fp")).toMap
    assert(dq.keys.map(_._1).toSet === Set(0, 1), "both phases present")
    dq.foreach { case ((phase, shard), fp) =>
      val sh = EpochShards.readCurriculumShard(spark, base, phase, shard)
      assert(fileOrderFp(sh) === fp,
        s"phase=$phase shard=$shard: file order must replay the DQ order")
      val ords = sh.select("ord").collect().map(_.getString(0)).toSeq
      assert(ords === ords.sorted, s"phase=$phase shard=$shard ord sorted")
    }
  }

  test("curriculum retract equals re-running writeCurriculumShards on " +
      "the complement — phase-major replay order included") {
    val base = java.nio.file.Files
      .createTempDirectory("graft_curr_retr_").toString
    val rebuilt = java.nio.file.Files
      .createTempDirectory("graft_curr_retr_rb_").toString
    val d = docs.filter(col("text").isNotNull).select("doc_id", "text")
    EpochShards.writeCurriculumShards(d, base)
    val ids = d.filter(col("doc_id") % 5 === 2).select("doc_id")
    EpochShards.retractCurriculumShards(spark, ids, base)
    EpochShards.writeCurriculumShards(
      d.filter(col("doc_id") % 5 =!= 2), rebuilt)
    // the LIVE file set, not a directory walk: after a scoped retract
    // the surviving shards' files stay in their original tree and the
    // rewritten ones live in the new tree's manifest
    def phaseShards(b: String): Seq[(Int, Long)] =
      Compaction.liveFilesRelative(spark, s"$b/curriculum")
        .flatMap { r =>
          val segs = r.split('/')
          for {
            p <- segs.find(_.startsWith("phase="))
              .map(_.stripPrefix("phase=").toInt)
            s <- segs.find(_.startsWith("shard="))
              .map(_.stripPrefix("shard=").toLong)
          } yield (p, s)
        }.distinct.sorted
    assert(phaseShards(base) === phaseShards(rebuilt),
      "retained (phase, shard) set must equal the complement rebuild's")
    phaseShards(rebuilt).foreach { case (p, sh) =>
      val got = EpochShards.readCurriculumShard(spark, base, p, sh)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      val want = EpochShards.readCurriculumShard(spark, rebuilt, p, sh)
        .select("doc_id").collect().map(_.getLong(0)).toSeq
      assert(got === want,
        s"phase=$p shard=$sh replay order must survive the refresh")
    }
  }
}
