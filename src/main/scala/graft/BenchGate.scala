package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Job-level profiler for ONE catalog query — the lifecycle gates
  * (r1–r4, c1/c2, m1) are compositions of many small Spark jobs
  * (artifact writes, checkpoints, discovery scans), so their cost
  * breakdown is a JOB timeline, not a single plan. This main runs one
  * query through the bench's exact noop-sink protocol with a listener
  * that attributes every job to its call site, then prints the jobs
  * sorted by duration — the "which of the 40 jobs is the wall clock"
  * view the optimization guide's §1 measure-first step needs for
  * multi-job operators (the SQL-tab equivalent, with the UI disabled).
  *
  * Usage: SPARK_GRAFT_SF_DIR=… runMain graft.BenchGate <query> [runs]
  * Output: one line per job of the LAST run (warm JVM), tab-separated
  * (seconds, callsite), slowest first, then the total.
  */
object BenchGate {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("r1_release_roundtrip")
    val runs = args.lift(1).map(_.toInt).getOrElse(2).max(1)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Session.get()
    val fn = SparkEntry.queries(name)

    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Double, String)]()
    // stage attribution: wall alone cannot separate "32 cores computing"
    // from "a queued stage round waiting on the scheduler" — per-job
    // executor-run totals and task counts make the distinction visible
    val jobStages = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Int]]()
    val stageRun = new java.util.concurrent.ConcurrentHashMap[Int, (Double, Int)]()
    // SQL-execution id → the action's callsite description: Spark 4
    // runs SQL commands on a captured thread, so the job's OWN
    // callsite reads "withThreadLocalCaptured at …" — the
    // SQLExecutionStart event carries the real one.
    val sqlDesc = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    val listener = new SparkListener {
      override def onOtherEvent(
          e: org.apache.spark.scheduler.SparkListenerEvent): Unit = e match {
        case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
          sqlDesc.put(s.executionId, s.description); ()
        case _ => ()
      }
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        stageRun.put(si.stageId,
          (si.taskMetrics.executorRunTime / 1e3, si.numTasks)); ()
      }
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val fromSql = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.sql.execution.id")))
          .flatMap(id => Option(sqlDesc.get(id.toLong)))
        val fromStack = js.stageInfos.lastOption.flatMap { si =>
          si.details.split('\n')
            .find(l => l.contains("graft.") && !l.contains("BenchGate"))
            .map(_.trim.replaceAll("^at ", ""))
        }
        val site = fromSql.orElse(fromStack)
          .orElse(js.stageInfos.lastOption.map(_.name)).getOrElse("?")
        jobStages.put(js.jobId, js.stageIds.map(_.toInt))
        starts.put(js.jobId, (System.nanoTime(), site)); ()
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(starts.remove(je.jobId)).foreach { case (t0, site) =>
          val (run, tasks) = Option(jobStages.get(je.jobId)).getOrElse(Nil)
            .flatMap(s => Option(stageRun.get(s)))
            .foldLeft((0.0, 0)) { case ((r, n), (r2, n2)) => (r + r2, n + n2) }
          rows.add(((System.nanoTime() - t0) / 1e9,
            f"run=$run%6.2fs tasks=$tasks%4d  $site"))
        }; ()
      }
    }

    var total = 0.0
    (1 to runs).foreach { i =>
      rows.clear(); starts.clear()
      if (i == runs) spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      total = (System.nanoTime() - t0) / 1e9
    }
    // listener events are queued — give the bus a beat to drain
    Thread.sleep(1000)
    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toSeq
    println(f"== $name: ${all.size} jobs, wall ${total}%.3f s (last of $runs runs)")
    all.sortBy(-_._1).foreach { case (s, site) => println(f"$s%8.3f  $site") }
    println(f"sum-of-jobs ${all.map(_._1).sum}%.3f s (overlap => sum > wall)")
    spark.stop()
  }
}
