package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.PartitionedUpsert

/** Marts layer — persisted dashboard aggregates with incremental refresh.
  *
  * The reference declares a staging→marts modeling layer but never fills
  * it in: `sql/dbt/dbt_project.yaml` is 0 bytes, `models/staging/` and
  * `models/marts/` hold only `.gitkeep`s, and the warehouse namespaces
  * exist as empty schemas (`sql/init/01_create_schemas.sql:13-16`). This
  * is that layer, Spark-shaped: each mart materializes one cataloged
  * dashboard query ([[graft.operators.RelationalQueries]] a2 / j3's
  * staging aggregate / a4), keyed by the query's grouping column, into
  * the hash-bucketed [[PartitionedUpsert]] layout the normalized sink
  * already uses.
  *
  * Incremental model: a refresh may carry a predicate on the mart's
  * group key (e.g. only the months whose orders changed). That is sound
  * for these marts because each output row is an aggregate of exactly
  * the input rows sharing its group key — Catalyst pushes a grouping-key
  * predicate below the Aggregate, so an incremental refresh reads only
  * the affected groups' input — and the upsert then rewrites ONLY the
  * buckets those group keys hash into. At 100 TB the full dashboard
  * recompute happens once; steady state pays O(changed groups), the same
  * contract as a dbt incremental model on a partitioned warehouse table.
  *
  * Latest-wins across refreshes is tie-broken by a caller-supplied
  * monotone `version` (wall clock at the CLI; pinned values in specs so
  * merges are reproducible). The bookkeeping column never leaves
  * [[read]].
  */
object Marts {

  /** One mart: a cataloged query materialized under `marts/<name>`,
    * upsert-keyed by `pk` (the query's grouping column). */
  final case class Mart(name: String, pk: String,
      query: (SparkSession, String) => DataFrame, nBuckets: Int = 8)

  /** Monthly revenue KPI (cataloged a2), keyed by month. */
  val revenueTrend: Mart =
    Mart("revenue_trend", "month", operators.RelationalQueries.a2.fn)

  /** Per-brand quantity staging aggregate (j3 minus its top-10 view),
    * keyed by brand — see [[operators.RelationalQueries.brandQty]] for
    * why the mart persists every brand. */
  val brandQty: Mart =
    Mart("brand_qty", "p_brand", operators.RelationalQueries.brandQty)

  /** Data-quality rates (cataloged a4), keyed by event type. */
  val qualityRates: Mart =
    Mart("quality_rates", "event_type", operators.RelationalQueries.a4.fn)

  val all: Seq[Mart] = Seq(revenueTrend, brandQty, qualityRates)

  def path(base: String, m: Mart): String = s"$base/marts/${m.name}"

  /** Refresh `m` from the tables under `sfDir` into the mart at `base`.
    * `where` = None → full refresh; Some(predicate on the group key) →
    * incremental (only matching groups recomputed and upserted). Returns
    * the bucket ids the upsert rewrote — untouched buckets are never
    * opened, which is the incremental claim, and it's testable. */
  def refresh(spark: SparkSession, sfDir: String, base: String, m: Mart,
      version: Long, where: Option[Column] = None): Seq[Int] = {
    val full = m.query(spark, sfDir)
    val rows = where.fold(full)(full.filter)
      .withColumn("_mart_version", lit(version))
    PartitionedUpsert.upsert(spark, path(base, m), rows, m.pk,
      Seq("_mart_version"), m.nBuckets)
  }

  /** The mart's current contents (bookkeeping dropped), or None when it
    * has never been refreshed. Served straight from the bucket files —
    * no recompute of the underlying query. */
  def read(spark: SparkSession, base: String, m: Mart): Option[DataFrame] =
    PartitionedUpsert.readAll(spark, path(base, m), m.nBuckets)
      .map(_.drop("_mart_version"))

  /** Refresh every mart (the CLI's full-build path). */
  def refreshAll(spark: SparkSession, sfDir: String, base: String,
      version: Long): Map[String, Seq[Int]] =
    all.map(m => m.name -> refresh(spark, sfDir, base, m, version)).toMap

  def main(args: Array[String]): Unit = {
    var sf = "/root/testdata/sf0.001"
    var base: Option[String] = None
    @annotation.tailrec
    def parse(argv: List[String]): Unit = argv match {
      case Nil                   => ()
      case "--sf" :: v :: rest   => sf = v; parse(rest)
      case "--base" :: v :: rest => base = Some(v); parse(rest)
      case other :: _ =>
        throw new IllegalArgumentException(s"unknown argument: $other")
    }
    parse(args.toList)
    val out = base.getOrElse(s"${Settings.fromEnv().sinkBase}")
    val spark = Session.get()
    val touched =
      try refreshAll(spark, sf, out, System.currentTimeMillis())
      finally spark.stop()
    val body = touched.toSeq.sortBy(_._1)
      .map { case (n, bs) => s""""$n":${bs.mkString("[", ",", "]")}""" }
      .mkString("{", ",", "}")
    println(s"""{"marts_base":"$out","touched_buckets":$body}""")
  }
}
