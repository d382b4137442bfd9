package graft

import org.apache.spark.sql.functions._

import graft.operators.{SubstringIndex, WinnowIndex}

/** Winnow-tier benchmark — prices the two-tier verbatim probe the way
  * [[BenchDecontam]] prices key width: [[operators.SubstringIndex
  * .spansAgainst]] (every shard doc pays the 15-gram explode and the
  * big-index probe) vs [[operators.SubstringIndex.spansAgainstTiered]]
  * (only winnow-flagged docs do) on the same corpus/shard split, with
  * the tier's SELECTIVITY — the flagged fraction — and the two
  * artifacts' row counts recorded beside the timings, so the
  * 2/(w+1)-sized-index / flagged-only-exact-work argument carries a
  * number instead of a scaladoc claim.
  *
  * Shard shape: the held-out 20% of documents, one in ten carrying a
  * 16-token verbatim lift from an indexed doc — a realistic re-crawl
  * hit rate where the quiet majority should stop at tier 1. Both probe
  * forms are spec-pinned row-identical (SubstringIndexSpec); this
  * records what the identity COSTS.
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.BenchWinnow
  */
object BenchWinnow {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = Session.get()
    val base = java.nio.file.Files.createTempDirectory("graft_winnow_bench_").toString

    // SPARK_GRAFT_WINNOW_REPLICAS scales the SHARD (the tier's saving
    // is shard-side work skipped, so the crossover appears as the
    // shard grows relative to the fixed index): each replica is the
    // held-out slice re-idd into its own range, same 10% lift rate.
    val replicas = sys.env.getOrElse("SPARK_GRAFT_WINNOW_REPLICAS", "1")
      .toInt.max(1)
    val all = Tables.documents(spark, sfDir)
      .filter(col("text").isNotNull)
      .select("lang", "doc_id", "text")
    val corpus = all.filter(col("doc_id") % 5 =!= 0)
    val off = all.agg((coalesce(max(col("doc_id")), lit(-1L)) + 1L).as("_off"))
    // one indexed doc's first 16 lowercase tokens = the planted lift
    val quote = corpus
      .withColumn("ta", split(lower(col("text")), "\\s+"))
      .filter(size(col("ta")) >= 16)
      .orderBy("doc_id").limit(1)
      .select(concat_ws(" ", slice(col("ta"), 1, 16)).as("_q"))
    val held = all.filter(col("doc_id") % 5 === 0)
    val shard = (1 to replicas).map { r =>
        held.crossJoin(broadcast(off)).crossJoin(broadcast(quote))
          .select(col("lang"),
            (col("doc_id") + col("_off") * r).as("doc_id"),
            when(col("doc_id") % 50 === 0,
              concat(col("text"), lit(" "), col("_q")))
              .otherwise(col("text")).as("text"))
      }.reduce(_ unionByName _)
      .localCheckpoint() // the shard is the workload, not part of the cost

    SubstringIndex.write(corpus, base)
    WinnowIndex.write(corpus, base)
    val index = SubstringIndex.read(spark, base)
    val winnow = WinnowIndex.read(spark, base)

    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def minOf(f: => Unit): Double = (1 to runs).map(_ => secs(f)).min

    // warm both paths once (class loading / codegen)
    noop(SubstringIndex.spansAgainst(shard, index))
    noop(SubstringIndex.spansAgainstTiered(shard, winnow, index))

    val exact = minOf(noop(SubstringIndex.spansAgainst(shard, index)))
    val tiered = minOf(noop(SubstringIndex.spansAgainstTiered(shard, winnow, index)))
    val nShard = shard.count()
    val nFlag = WinnowIndex.screenAgainst(shard, winnow)
      .select("doc_id").distinct().count()
    val idxRows = index.count()
    val winRows = winnow.count()

    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"winnow_tier","unit":"sec","exact":${r3(exact)},""" +
      s""""tiered":${r3(tiered)},"flagged_frac_milli":${
        if (nShard == 0) 0 else Math.round(nFlag * 1000.0 / nShard)},""" +
      s""""shard_docs":$nShard,"span_index_rows":$idxRows,""" +
      s""""winnow_index_rows":$winRows,"replicas":$replicas,""" +
      s""""runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
