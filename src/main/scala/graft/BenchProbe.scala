package graft

import org.apache.spark.sql.functions._

import graft.operators.{AnnIndexes, LlmQueries}

/** ANN index build-vs-probe benchmark — prices the [[operators.AnnIndexes]]
  * build-once/probe-many split beside the composed l12/l16 plans on the
  * same data: `build_*` is train/sign + parquet write (once per corpus
  * refresh), `probe_*` is read-index → candidates → exact re-rank (every
  * query), `composed_*` is the catalog query that does both. Prints ONE
  * JSON line (same noop-sink + min-of-runs discipline as [[Bench]]).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.BenchProbe
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = Session.get()
    val e = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val base = java.nio.file.Files.createTempDirectory("graft_ann_probe_").toString

    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def minOf(f: => Unit): Double = (1 to runs).map(_ => secs(f)).min

    // warm codegen/JVM paths once so build numbers aren't class loading
    try noop(LlmQueries.l12.fn(spark, sfDir)) catch { case _: Throwable => () }
    try noop(LlmQueries.l16.fn(spark, sfDir)) catch { case _: Throwable => () }

    val q = e.filter(col("vec_id") === 0)
    // same index geometry as the composed l16 plan (shared cellCount
    // selector + the k/4 nprobe rule) so probe-vs-composed prices the
    // SAME index, not two different ones
    val k = graft.functions.Ivf.cellCount(e.count())
    val nprobe = math.max(4, (k + 3) / 4)
    val buildLsh = secs(AnnIndexes.writeLsh(AnnIndexes.lshBands(e), base))
    val buildIvf = secs(AnnIndexes.writeIvf(AnnIndexes.buildIvf(e, k, 2), base))
    val probeLsh = minOf(noop(AnnIndexes.probeLsh(
      AnnIndexes.readLsh(spark, base), e, q, topK = 5, excludeId = 0L)))
    val probeIvf = minOf(noop(AnnIndexes.probeIvf(
      AnnIndexes.readIvf(spark, base), e, q, nprobe = nprobe, topK = 5,
      excludeId = 0L)))
    val composedLsh = minOf(noop(LlmQueries.l12.fn(spark, sfDir)))
    val composedIvf = minOf(noop(LlmQueries.l16.fn(spark, sfDir)))

    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"ann_probe","unit":"sec","build_lsh":${r3(buildLsh)},""" +
      s""""build_ivf":${r3(buildIvf)},"probe_lsh":${r3(probeLsh)},""" +
      s""""probe_ivf":${r3(probeIvf)},"composed_l12":${r3(composedLsh)},""" +
      s""""composed_l16":${r3(composedIvf)},"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
