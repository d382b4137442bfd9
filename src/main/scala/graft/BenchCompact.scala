package graft

import org.apache.spark.sql.functions._

import graft.operators.{Compaction, SubstringIndex}

/** Compaction benchmark — prices what an append chain costs a
  * gram-keyed probe and what [[operators.Compaction]] buys back: the
  * substring index (the family's largest artifact) is built, then
  * appended N times (each append lands its own range-clustered file
  * set, so footer min/max selectivity decays N-fold), and the SAME
  * probe is timed fragmented vs compacted, with file counts recorded.
  * CompactionSpec pins row-multiset identity; this records the cost.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.BenchCompact
  * (SPARK_GRAFT_COMPACT_APPENDS overrides the chain length, default 10)
  */
object BenchCompact {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val appends = sys.env.getOrElse("SPARK_GRAFT_COMPACT_APPENDS", "10")
      .toInt.max(1)
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = Session.get()
    val base = java.nio.file.Files
      .createTempDirectory("graft_compact_bench_").toString

    val all = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select("lang", "doc_id", "text")
    val corpus = all.filter(col("doc_id") % 5 =!= 0)
    val held = all.filter(col("doc_id") % 5 === 0)
    val off = all.agg(coalesce(max("doc_id"), lit(-1L)) + 1L)
      .collect()(0).getLong(0)
    SubstringIndex.write(corpus, base)
    // N appends — each its own slice of the held docs, re-idd. Held
    // ids are all ≡0 (mod 5), so slice on doc_id/5 — a plain
    // doc_id % appends would leave most slices empty (only residues
    // 0 and 5 occur for appends=10) and the chain would not build the
    // N-file-set fragmentation this bench exists to price.
    for (k <- 1 to appends) {
      SubstringIndex.append(
        held.filter(expr(s"(doc_id div 5) % $appends") === (k - 1))
          .select(col("lang"), (col("doc_id") + lit(k * off)).as("doc_id"),
            col("text")),
        base)
    }
    val probeShard = held
      .select(col("lang"),
        (col("doc_id") + lit((appends + 1) * off)).as("doc_id"), col("text"))
      .localCheckpoint()

    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def probe(): Unit =
      SubstringIndex.spansAgainst(probeShard, SubstringIndex.read(spark, base))
        .write.format("noop").mode("overwrite").save()
    def minOf(f: => Unit): Double = (1 to runs).map(_ => secs(f)).min

    val dir = s"$base/span_grams"
    probe() // warm
    val fragFiles = Compaction.fileCount(spark, dir)
    val tFrag = minOf(probe())
    val tCompact = secs { SubstringIndex.compact(spark, base) }
    val compFiles = Compaction.fileCount(spark, dir)
    probe() // warm the compacted layout
    val tComp = minOf(probe())

    def r3(x: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    println(s"""{"metric":"compaction","unit":"sec","appends":$appends,""" +
      s""""probe_fragmented":${r3(tFrag)},"probe_compacted":${r3(tComp)},""" +
      s""""compact_cost":${r3(tCompact)},"files_before":$fragFiles,""" +
      s""""files_after":$compFiles,"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
