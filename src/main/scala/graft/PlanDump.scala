package graft

/** Dump `explain("formatted")` for catalog queries to files — the
  * optimization rounds' plan-evidence tool (plans/rNN/<query>_{before,
  * after}.txt). Construction-only: the physical plan of each query's
  * RETURNED frame is written without executing it through a sink
  * (lifecycle gates still run their side-effecting phases at
  * construction, exactly as Verify/Bench do).
  *
  * Usage: runMain graft.PlanDump <outDir> <suffix> [q1,q2,…]
  *   outDir  e.g. plans/r18    suffix  e.g. before
  *   queries default to the whole catalog.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("plans/r18")
    val suffix = args.lift(1).getOrElse("before")
    val names = args.lift(2).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(SparkEntry.queries.keys.toSeq.sorted)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val t0 = System.nanoTime()
      val plan =
        try SparkEntry.queries(n)(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        catch { case e: Throwable => s"PLAN FAILED: $e" }
      // construction+planning milliseconds: for non-gate queries this is
      // the driver-side share a bench shot pays BEFORE any task runs —
      // the number that separates "slow plan" from "slow execution"
      val ms = (System.nanoTime() - t0) / 1e6
      java.nio.file.Files.write(
        java.nio.file.Paths.get(outDir, s"${n}_$suffix.txt"),
        plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      println(f"[plandump] $n -> $outDir/${n}_$suffix.txt (${ms}%.0f ms)")
    }
    spark.stop()
  }
}
