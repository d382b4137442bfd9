package graft

import org.apache.spark.sql.functions._

import graft.operators.{AuditQueries, LlmQueries}

/** Winnow-key cost split — prices l74's per-gram md5 chain against the
  * surrounding array machinery on the real corpus, so a kernel-level
  * change to the md5 arm is justified by a number, not a hunch:
  * `grams_only` (tokenize + zero-copy gram views), `md5_chain` (+ the
  * md5 → hex → conv(16,10) → bigint packing — the current oracle-
  * replayed keysExpr), `window_min` (+ the w-window array_min
  * selection), `l74_full` (the catalog row). Prints ONE JSON line
  * (noop sink, min-of-runs, same discipline as [[Bench]]).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.BenchMd5
  */
object BenchMd5 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "5").toInt.max(1)
    val spark = Session.get()
    graft.functions.NativeTextExprs.ensureRegistered(spark)
    val k = 5 // AuditQueries.WinnowK (private)
    val w = 4 // AuditQueries.WinnowW (private)

    val corpus = LlmQueries.plantedFull(Tables.documents(spark, sfDir))
      .filter(col("text").isNotNull)
      .select("lang", "doc_id", "text")

    def base = corpus
      .withColumn("ta", split(lower(col("text")), "\\s+"))
      .filter(size(col("ta")) >= k + w - 1)

    val gramsOnly = base
      .select(col("doc_id"), size(call_function("graft_grams",
        col("ta"), lit(k))).as("n"))
    val md5Chain = base
      .withColumn("keys", expr(
        s"transform(graft_grams(ta, $k), (g, i) -> " +
          "cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint) " +
          "* 1048576L + (1048575L - i))"))
      .select(col("doc_id"), size(col("keys")).as("n"),
        element_at(col("keys"), 1).as("k0"))
    val windowMin = base
      .withColumn("keys", expr(
        s"transform(graft_grams(ta, $k), (g, i) -> " +
          "cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint) " +
          "* 1048576L + (1048575L - i))"))
      .select(col("doc_id"), expr(
        s"transform(sequence(0, size(keys) - $w), s -> " +
          s"array_min(slice(keys, s + 1, $w)))").as("minkeys"))
      .select(col("doc_id"), size(col("minkeys")).as("n"),
        element_at(col("minkeys"), 1).as("k0"))

    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def minOf(f: => Unit): Double = (1 to runs).map(_ => secs(f)).min

    noop(windowMin) // warm codegen / classloading
    noop(AuditQueries.l74.fn(spark, sfDir))

    val sc = spark.sparkContext
    sc.setJobDescription("md5probe: grams_only")
    val tGrams = minOf(noop(gramsOnly))
    sc.setJobDescription("md5probe: md5_chain")
    val tMd5 = minOf(noop(md5Chain))
    sc.setJobDescription("md5probe: window_min")
    val tWin = minOf(noop(windowMin))
    sc.setJobDescription("md5probe: l74_full")
    val tFull = minOf(noop(AuditQueries.l74.fn(spark, sfDir)))
    sc.setJobDescription(null)

    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"md5_split","unit":"sec","grams_only":${r3(tGrams)},""" +
      s""""md5_chain":${r3(tMd5)},"window_min":${r3(tWin)},""" +
      s""""l74_full":${r3(tFull)},"runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
