package graft

import graft.operators.SamplingQueries

/** Decontamination key-width benchmark — prices [[operators
  * .SamplingQueries.decontaminate]]'s two join-key forms on the same
  * data: `string_gram` is the oracle-portable gate form (the 5-gram
  * string is the shuffle key), `hashed_gram` is the 100 TB form
  * (xxhash64 → 8-byte key on the wire). Same plan shape either way —
  * the delta is pure key-width serialization/comparison cost, which is
  * what grows with corpus size. Prints ONE JSON line (same noop-sink +
  * min-of-runs discipline as [[Bench]]).
  *
  * Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.BenchDecontam
  */
object BenchDecontam {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt.max(1)
    val spark = Session.get()

    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def minOf(f: => Unit): Double = (1 to runs).map(_ => secs(f)).min

    def run(hashed: Boolean): Double = minOf(noop(
      SamplingQueries.decontaminate(
        SamplingQueries.splitLabeled(spark, sfDir), hashedGrams = hashed)))

    // warm codegen/JVM paths once PER FORM so neither pays first-run
    // class loading in its timed pass (the two plans codegen different
    // join keys)
    run(hashed = false)
    run(hashed = true)
    val stringGram = run(hashed = false)
    val hashedGram = run(hashed = true)

    def r3(v: Double): String =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    println(s"""{"metric":"decontam_key","unit":"sec",""" +
      s""""string_gram":${r3(stringGram)},"hashed_gram":${r3(hashedGram)},""" +
      s""""runs":$runs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
