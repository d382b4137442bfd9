package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    val reserved = Set("_k", "_t", "_side")
      .intersect(probe.columns.toSet ++ build.columns.toSet)
    require(reserved.isEmpty,
      s"asOfJoin: ${reserved.toSeq.sorted.mkString(", ")} are reserved column names")
    val carry = (Seq(buildTime, tieBreak) ++ carried).distinct
    def nulls(df: DataFrame, names: Seq[String]): Seq[Column] =
      names.map(n => lit(null).cast(df.schema(n).dataType).as(n))
    val probeCols = probe.columns.toSeq
    val bSide = build.select(
      Seq(col(buildKey).as("_k"), col(buildTime).as("_t"), lit(0).as("_side")) ++
        carry.map(col) ++ nulls(probe, probeCols): _*)
    val pSide = probe.select(
      Seq(col(probeKey).as("_k"), col(probeTime).as("_t"), lit(1).as("_side")) ++
        nulls(build, carry) ++ probeCols.map(col): _*)
    val win = Window.partitionBy("_k").orderBy(col("_t"), col("_side"), col(tieBreak))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carriedLast = carry.map(c => last(col(c), ignoreNulls = true).over(win).as(c))
    bSide.unionByName(pSide)
      .select(Seq(col("_side")) ++ probeCols.map(col) ++ carriedLast: _*)
      .filter(col("_side") === 1)
      .select(probeCols.map(col) ++ carry.map(col): _*)
  }

  /** All (left, right) pairs with `leftKey == rightKey` and `rightTime`
    * inside `[leftTime, leftTime + windowUs)`. Both time columns are
    * non-negative epoch microseconds; output carries every column of
    * both inputs (names must be disjoint). A pair can only meet in the
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
      expr(s"$leftTime div ${windowUs}L"),
      expr(s"($leftTime + ${windowUs}L - 1) div ${windowUs}L")))))
    val r = right.withColumn("_rb", expr(s"$rightTime div ${windowUs}L"))
    l.join(r,
        col(leftKey) === col(rightKey) && col("_lb") === col("_rb") &&
          col(rightTime) >= col(leftTime) &&
          col(rightTime) < col(leftTime) + lit(windowUs))
      .drop("_lb", "_rb")
  }
}
