package graft

/** Single-query CLI — run one catalog query by name against a table
  * directory and print a bounded result table. The "just show me the
  * answer" entry point beside [[Verify]] (full dump for the oracle
  * gate) and [[Bench]] (timings): a library user exploring the catalog
  * runs `graft.Query l23_mix_manifest --sf /data/sf0.01`.
  *
  * Usage: runMain graft.Query <name> [--sf DIR] [--limit N] [--explain]
  * `--explain` additionally prints the formatted physical plan. Unknown
  * names exit 2 listing the catalog; the printed row count is capped by
  * `--limit` (default 50) so a fact-sized result can't flood a driver.
  */
object Query {

  final case class Args(name: String = "", sf: String = "/root/testdata/sf0.001",
      limit: Int = 50, explain: Boolean = false)

  @annotation.tailrec
  private[graft] def parse(argv: List[String], acc: Args = Args()): Args = argv match {
    case Nil                    => acc
    case "--sf" :: v :: rest    => parse(rest, acc.copy(sf = v))
    // toLongOption also rejects digit strings past Long range; the
    // bounds check rejects 0 and Int overflow — the error message
    // promises a POSITIVE integer, so 0 must not silently show(0)
    case "--limit" :: v :: rest if v.nonEmpty && v.forall(_.isDigit) &&
        v.toLongOption.exists(n => n > 0 && n <= Int.MaxValue) =>
      parse(rest, acc.copy(limit = v.toInt))
    case "--limit" :: v :: _ =>
      throw new IllegalArgumentException(s"--limit expects a positive integer, got: $v")
    case "--explain" :: rest    => parse(rest, acc.copy(explain = true))
    case name :: rest if !name.startsWith("--") && acc.name.isEmpty =>
      parse(rest, acc.copy(name = name))
    case other :: _ =>
      throw new IllegalArgumentException(s"unknown argument: $other")
  }

  private def usageExit(): Nothing = {
    System.err.println(
      s"""usage: graft.Query <name> [--sf DIR] [--limit N] [--explain]
         |catalog: ${SparkEntry.queries.keys.toSeq.sorted.mkString(", ")}""".stripMargin)
    sys.exit(2)
  }

  def main(args: Array[String]): Unit = {
    val a = try parse(args.toList) catch {
      case e: IllegalArgumentException =>
        System.err.println(e.getMessage); usageExit()
    }
    if (a.name.isEmpty || !SparkEntry.queries.contains(a.name)) usageExit()
    val spark = Session.get()
    try {
      val df = SparkEntry.queries(a.name)(spark, a.sf)
      if (a.explain) println(df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
      // truncate=false: catalog outputs are numeric/short-string columns
      df.show(a.limit, truncate = false)
    } finally spark.stop()
  }
}
