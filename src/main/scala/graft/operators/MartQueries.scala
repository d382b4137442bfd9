package graft.operators

import graft.{DQ, Marts}
import org.apache.spark.sql.functions._

/** Marts-layer gate query — SURVEY.md §2 marts materialization (the
  * reference's empty dbt skeleton, see [[graft.Marts]]).
  *
  * m1 routes the monthly-revenue KPI through the FULL mart lifecycle —
  * full refresh, then an incremental refresh of the latest month on top
  * of the existing buckets, then a mart read — and returns the mart's
  * contents. Its DuckDB oracle is a2's: the gate therefore hash-checks
  * that materialize→upsert→read is lossless against the direct query, not
  * merely that it produces rows.
  */
object MartQueries {

  /** Scratch mart base for the gate run, unique per (JVM, source dir)
    * — the per-JVM nonce ([[ReleaseQueries.nonce]]) keeps concurrent
    * driver invocations from cross-wiping; wiped at the start of every
    * invocation so the query is idempotent. */
  private def gateBase(d: String): String =
    s"${sys.props("java.io.tmpdir")}/graft_mart_gate_${ReleaseQueries.nonce}_" +
      d.replaceAll("[^A-Za-z0-9.]", "_")

  val m1 = DQ(
    "m1_mart_roundtrip",
    (s, d) => {
      val base = gateBase(d)
      val p = new org.apache.hadoop.fs.Path(base)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      if (fs.exists(p)) fs.delete(p, true)
      // Full build, then the steady-state path: re-derive only the latest
      // month (grouping-key predicate pushes below the aggregate) and
      // upsert it over the live buckets with a newer version.
      Marts.refresh(s, d, base, Marts.revenueTrend, version = 1L)
      // Latest group key from the mart just built (80-row bounded read),
      // not a recompute of the full a2 aggregate — the mart after a full
      // refresh holds exactly a2's rows, so max(month) is identical.
      val lastMonth = Marts.read(s, base, Marts.revenueTrend).get
        .agg(max(col("month"))).collect()(0).getString(0)
      Marts.refresh(s, d, base, Marts.revenueTrend, version = 2L,
        where = Some(col("month") === lastMonth))
      Marts.read(s, base, Marts.revenueTrend).get
        .select("month", "n_orders", "revenue_cents", "avg_price_cents")
        .orderBy("month")
    },
    RelationalQueries.a2.oracle)

  val all: Seq[DQ] = Seq(m1)
}
