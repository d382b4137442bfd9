package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the driver's parquet tables (the `sf` directories under
  * /root/testdata — sf0.001, sf0.01, sf0.1).
  *
  * All readers are plain `spark.read.parquet` scans — column pruning and
  * predicate pushdown reach the parquet footer (verify with
  * `.explain("formatted")`: `PushedFilters`, `ReadSchema`). No caching at
  * this layer: at 100 TB a table does not fit in memory and every query
  * should prune its own columns.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** Events stream table. The driver writes `ts` as parquet
    * TIMESTAMP(NANOS), which Spark's reader rejects outright
    * (PARQUET_TYPE_ILLEGAL). With `spark.sql.legacy.parquet.nanosAsLong`
    * the column arrives as raw nanoseconds; we expose:
    *   - `ts_us` — microseconds since epoch (bigint; integer division so
    *     it truncates exactly like DuckDB's ns→us read does)
    *   - `ts` — TimestampType at microsecond precision, for
    *     window/session operators.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    // Runtime-settable conf: make the reader work even when the caller's
    // session was not built by Session.builder (round-2 advice).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read
      .parquet(s"$dir/events.parquet")
      .withColumn("ts_us", expr("ts div 1000"))
      .withColumn("ts", timestamp_micros(col("ts_us")))
  }

  def region(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = table(spark, dir, "lineitem")
  def documents(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
