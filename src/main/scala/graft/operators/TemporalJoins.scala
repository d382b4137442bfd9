package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Generic temporal join operators — the reusable library form behind
  * the j9/j10 catalog queries (see [[TemporalJoinQueries]] for the
  * cataloged, oracle-checked instantiations and the scale rationale).
  *
  * Spark has no built-in batch as-of or range join; these are the two
  * standard distributed constructions:
  *  - [[asOfJoin]] — tagged union + ONE key shuffle + per-partition
  *    running `last(ignoreNulls)` per carried column. O(probe+build)
  *    at any scale; candidate pairs are never materialized.
  *  - [[rangeJoin]] — bucketed band join: each left interval replicates
  *    into its ≤2 fixed-width time buckets and the join is an equi-join
  *    on (key, bucket) with the exact range predicate evaluated only
  *    inside a bucket.
  */
object TemporalJoins {

  /** For each probe row, append the carried build columns of the LATEST
    * build row with the same key and `buildTime` at-or-before
    * `probeTime` (a build row at the exact probe time matches). Carried
    * columns are null when no build row precedes — a real cutoff.
    *
    * All carried columns come from the SAME build row: they travel as
    * one struct through a single `last(_, ignoreNulls)` — a legitimately
    * NULL value in one carried column of the latest build row stays
    * null rather than falling back to an older row's value.
    *
    * `tieBreak` orders build rows at equal times deterministically (use
    * a unique build id). Probe and build column names must be disjoint;
    * every name in `carried` (plus `buildTime`/`tieBreak`) must be a
    * build column.
    */
  def asOfJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String,
      probeTime: String, buildTime: String, tieBreak: String,
      carried: Seq[String]): DataFrame = {
    val overlap = probe.columns.toSet.intersect(build.columns.toSet)
    require(overlap.isEmpty,
      s"asOfJoin: probe and build column names must be disjoint, both have: " +
        overlap.toSeq.sorted.mkString(", "))
    val reserved = Set("_k", "_t", "_side", "_c")
      .intersect(probe.columns.toSet ++ build.columns.toSet)
    require(reserved.isEmpty,
      s"asOfJoin: ${reserved.toSeq.sorted.mkString(", ")} are reserved column names")
    val carry = (Seq(buildTime, tieBreak) ++ carried).distinct
    val carryType = StructType(carry.map(n => build.schema(n)))
    def nulls(df: DataFrame, names: Seq[String]): Seq[Column] =
      names.map(n => lit(null).cast(df.schema(n).dataType).as(n))
    val probeCols = probe.columns.toSeq
    val bSide = build.select(
      Seq(col(buildKey).as("_k"), col(buildTime).as("_t"), lit(0).as("_side"),
        struct(carry.map(col): _*).as("_c")) ++ nulls(probe, probeCols): _*)
    val pSide = probe.select(
      Seq(col(probeKey).as("_k"), col(probeTime).as("_t"), lit(1).as("_side"),
        lit(null).cast(carryType).as("_c")) ++ probeCols.map(col): _*)
    val win = Window.partitionBy("_k")
      .orderBy(col("_t"), col("_side"), col("_c").getField(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    bSide.unionByName(pSide)
      .select(Seq(col("_side")) ++ probeCols.map(col) :+
        last(col("_c"), ignoreNulls = true).over(win).as("_c"): _*)
      .filter(col("_side") === 1)
      .select(probeCols.map(col) ++ carry.map(c => col("_c").getField(c).as(c)): _*)
  }

  /** Exact floor-division bucket index: `floor(t / w)` in pure integer
    * arithmetic. SQL `div` truncates TOWARD ZERO, which mis-buckets
    * negative epoch times (pre-1970 timestamps, signed deltas);
    * subtracting the always-non-negative `pmod` first makes the
    * numerator an exact multiple of `w`, so `div` equals floor for any
    * sign — with no double-precision round-trip at any epoch scale. */
  private def floorBucket(t: String, w: Long): String =
    s"(($t) - pmod(($t), ${w}L)) div ${w}L"

  /** All (left, right) pairs with `leftKey == rightKey` and `rightTime`
    * inside `[leftTime, leftTime + windowUs)`. Time columns are epoch
    * microseconds of ANY sign (bucketing is floor-division, so negative
    * epochs bucket correctly); output carries every column of both
    * inputs (names must be disjoint). A pair can only meet in the
    * single bucket holding the right row, and the left row's ≤2 replica
    * buckets are distinct, so no pair is emitted twice.
    */
  def rangeJoin(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTime: String, rightTime: String, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"rangeJoin: windowUs must be positive, got $windowUs")
    val overlap = left.columns.toSet.intersect(right.columns.toSet)
    require(overlap.isEmpty,
      s"rangeJoin: left and right column names must be disjoint, both have: " +
        overlap.toSeq.sorted.mkString(", "))
    val l = left.withColumn("_lb", explode(array_distinct(array(
      expr(floorBucket(leftTime, windowUs)),
      expr(floorBucket(s"$leftTime + ${windowUs}L - 1", windowUs))))))
    val r = right.withColumn("_rb", expr(floorBucket(rightTime, windowUs)))
    l.join(r,
        col(leftKey) === col(rightKey) && col("_lb") === col("_rb") &&
          col(rightTime) >= col(leftTime) &&
          col(rightTime) < col(leftTime) + lit(windowUs))
      .drop("_lb", "_rb")
  }
}
