package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting (SURVEY.md "salting for skew").
  *
  * A single hot key turns one reducer into the whole job's critical path.
  * Salted two-phase aggregation splits each key into `nSalts` synthetic
  * subkeys (phase 1 aggregates `(key, salt)` — hot keys fan out across
  * reducers), then re-aggregates by the bare key (phase 2 input is at
  * most `nSalts` rows per key). For algebraic aggregates
  * (sum/count/min/max) the two-phase result is exact.
  *
  * AQE's skew-join splitting covers the join case at runtime; explicit
  * salting remains the tool for skewed AGGREGATIONS and for engines
  * where the optimizer can't see the skew (e.g. a first-pass shuffle on
  * a power-law key like user_id at 100 TB).
  */
object Salting {

  /** Exact salted sum/count per key: phase-1 partial agg on
    * (key, salt), phase-2 merge on key. The salt must be (near-)unique
    * PER ROW — deriving it from the data would collapse to a handful of
    * salts exactly in the canonical skew case (a hot key whose values
    * are constant or low-cardinality), reinstating the single-reducer
    * critical path. `monotonically_increasing_id` gives a row-unique,
    * RNG-free source; the final result is exact under ANY salt
    * assignment, so its partition-layout dependence is harmless. */
  def saltedSumCount(df: DataFrame, key: String, valueCol: Column,
      nSalts: Int): DataFrame =
    df.withColumn("_salt", pmod(monotonically_increasing_id(), lit(nSalts.toLong)))
      .groupBy(col(key), col("_salt"))
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum("_psum").as("total"), sum("_pcnt").as("n"))
}
