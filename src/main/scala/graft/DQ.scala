package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A declared query: the Spark implementation plus (when SQL-expressible)
  * the equivalent DuckDB oracle SQL the driver runs for the correctness
  * gate. `oracle == None` → driver records a weaker rows-only check.
  */
final case class DQ(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** Determinism helpers shared by every declared query.
  *
  * The correctness gate hash-compares Spark output against DuckDB. A
  * double SUM is not reproducible across engines (summation order), so
  * money/quantity aggregates follow the integer-cents pattern: round each
  * row to integer cents (per-row IEEE double ops are bit-identical in
  * Spark and DuckDB, and integer rounding of a double agrees between
  * Spark's HALF_UP and DuckDB's half-away-from-zero — ties only occur at
  * exactly-representable .5), then SUM the longs exactly.
  */
object Det {
  /** Money column → integer cents. Mirror in SQL:
    * `CAST(ROUND(x*100) AS BIGINT)`. */
  def cents(c: Column): Column = round(c * lit(100)).cast("long")

  /** Double → nearest integer as long. SQL: `CAST(ROUND(x) AS BIGINT)`. */
  def asLong(c: Column): Column = round(c).cast("long")
}
