package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Normalization projections for the ingest plane → analytics plane
  * boundary (SURVEY.md §3.2 step 2).
  *
  * The reference lands the Kafka order payload's nested `items` list
  * (`schemas.py:69`) as a child table `analytics.order_items` with a
  * stored generated column `line_total = quantity * unit_price`
  * (`02_create_tables.sql:93-109`). Spark-side that is a `posexplode`
  * plus a computed projection — per-row, no shuffle, and the child rows
  * inherit the parent's partitioning so a later orders⋈order_items join
  * stays co-partitioned if both land bucketed by order_id.
  */
object Normalize {

  /** The analytics-plane money type — `DECIMAL(10,2)`, mirroring the
    * reference's at-rest DDL (`02_create_tables.sql:56,80,98-99`). The
    * ingest plane carries doubles (the JSON payload type); the cast to
    * decimal happens ONCE at this boundary, so every at-rest sum is
    * exact (no IEEE reordering drift) and overflow past 10^8 currency
    * units throws under ANSI instead of silently losing cents. */
  val Money: DecimalType = DecimalType(10, 2)

  /** Cast the declared money columns of a frame to [[Money]] — the
    * at-rest projection applied at the normalized-sink boundary. Pure
    * per-row, no shuffle; double → DECIMAL(10,2) is exact for 2-decimal
    * payloads (doubles hold 15-17 significant digits, so every 10-digit
    * money value round-trips bit-exactly). */
  def atRest(df: DataFrame, moneyCols: Seq[String]): DataFrame =
    moneyCols.foldLeft(df)((acc, c) => acc.withColumn(c, col(c).cast(Money)))

  /** Explode nested order items into child rows with 1-based line
    * numbers and the generated `line_total` column. Money lands as
    * [[Money]] decimals: `quantity × DECIMAL(10,2)` is exact integer
    * decimal arithmetic — the Postgres generated-column semantics
    * (`02_create_tables.sql:93-109`), not double rounding. */
  def orderItems(orders: DataFrame): DataFrame =
    orders
      .select(col("order_id"),
        posexplode(col("items")).as(Seq("line_idx", "it")))
      .select(
        col("order_id"),
        (col("line_idx") + 1).as("line_number"),
        col("it.product_id").as("product_id"),
        col("it.quantity").as("quantity"),
        col("it.unit_price").cast(Money).as("unit_price"),
        (col("it.quantity") * col("it.unit_price").cast(Money))
          .cast(Money).as("line_total"))
}
