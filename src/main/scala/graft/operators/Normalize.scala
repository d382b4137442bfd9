package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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

  /** Explode nested order items into child rows with 1-based line
    * numbers and the generated `line_total` column (money rounded to
    * cents at rest, HALF_UP like the Postgres DECIMAL cast). */
  def orderItems(orders: DataFrame): DataFrame =
    orders
      .select(col("order_id"),
        posexplode(col("items")).as(Seq("line_idx", "it")))
      .select(
        col("order_id"),
        (col("line_idx") + 1).as("line_number"),
        col("it.product_id").as("product_id"),
        col("it.quantity").as("quantity"),
        col("it.unit_price").as("unit_price"),
        round(col("it.quantity") * col("it.unit_price"), 2).as("line_total"))
}
