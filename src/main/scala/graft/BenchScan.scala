package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scan-parallelism probe — prices the single-file, single-row-group
  * input layout (every sf table is one unsplittable parquet file, so
  * every scan stage is ONE task regardless of core count) against an
  * explicit post-scan repartition to the session's parallelism, on the
  * two representative hot shapes:
  *
  *  - `tok`: the tokenize→explode→aggregate shape every gram-family
  *    operator opens with (l33/l64/l65/l71/l74/l79 and the release
  *    gates' screen arms) — heavy per-row compute, tiny input bytes;
  *  - `agg`: the lineitem partial-agg shape (a1/a2-class) — cheap
  *    per-row compute, the catalog's widest table.
  *
  * The question it answers (guide §2.5 "one huge unsplittable file →
  * repartition immediately after the read"): is the serial map stage
  * the wall at 32 cores, and does the extra exchange pay for itself?
  * Prints ONE JSON line, same min-of-runs discipline as [[Bench]].
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.BenchScan
  */
object BenchScan {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = Session.get()
    val par = spark.sparkContext.defaultParallelism

    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def minOf(f: => Unit): Double =
      (1 to runs).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }.min

    val docs = Tables.documents(spark, sfDir).filter(col("text").isNotNull)
    def tok(d: DataFrame): DataFrame = d
      .select(col("doc_id"), explode(split(lower(col("text")), "\\s+")).as("t"))
      .groupBy("t").agg(count(lit(1)).as("n"), sum("doc_id").as("s"))
      .agg(count(lit(1)).as("n_terms"), sum("n").as("n_tok"), sum("s").as("cs"))

    val li = Tables.lineitem(spark, sfDir)
    def agg(d: DataFrame): DataFrame = d
      .groupBy("l_orderkey")
      .agg(sum(col("l_quantity")).as("q"), avg("l_discount").as("d"))
      .agg(count(lit(1)).as("n"), sum("q").as("sq"))

    // warm
    noop(tok(docs)); noop(agg(li))

    // gate-pin pre-computation cost, the three layers separately
    import graft.operators.{LlmQueries => LQ}
    def pinned(d: DataFrame) = d
      .withColumn(LQ.PreTokens, split(lower(col("text")), "\\s+"))
    val gp0 = minOf(noop(pinned(docs)))
    val gp1 = minOf(noop(LQ.withSketchPre(pinned(docs))))
    val gp2 = minOf(noop(LQ.withGatePre(pinned(docs))))
    println(f"[scan] tokens=${gp0}%.3f sketch=${gp1}%.3f gatepre=${gp2}%.3f")

    val tokSerial = minOf(noop(tok(docs)))
    val tokPar    = minOf(noop(tok(docs.repartition(par))))
    val aggSerial = minOf(noop(agg(li)))
    val aggPar    = minOf(noop(agg(li.repartition(par))))

    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"scan_par","unit":"sec","par":$par,""" +
      s""""tok_serial":${r3(tokSerial)},"tok_repart":${r3(tokPar)},""" +
      s""""agg_serial":${r3(aggSerial)},"agg_repart":${r3(aggPar)},""" +
      s""""runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
