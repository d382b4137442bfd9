package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** S2 — probabilistic corruption injector, the columnar analog of the
  * reference's in-place record mutators (`corruptions.py:49-122`, type
  * lists `corruptions.py:31-45`, per-entity probabilities
  * `settings.py:63-67`).
  *
  * Each row draws `(should_corrupt, which_type)` as pure functions of
  * `(seed, key column, tag)` — same determinism model as Generator, so
  * corrupt(corrupt(df)) is idempotent-by-value and any row's corruption
  * is reproducible in isolation. Dropped-field corruptions (the
  * reference's `del record[field]`, `corruptions.py:85,100`) are modeled
  * as nulls per SURVEY.md §7.3 risk 3 — the validator treats null enums
  * as invalid, matching the consumer-side outcome.
  */
object Corruptions {

  private def pick(seed: Long, key: Column, p: Double, nTypes: Int): (Column, Column) = {
    val hit   = Generator.u(seed, key, "corrupt_p") < p
    val ctype = floor(Generator.u(seed, key, "corrupt_t") * nTypes).cast("int")
    (hit, ctype)
  }

  private def corruptWhen(hit: Column, ctype: Column, idx: Int, corrupted: Column,
      original: Column): Column =
    when(hit && ctype === idx, corrupted).otherwise(original)

  /** Product corruptions (`corruptions.py:52-61`): null name, negative
    * price, negative stock. */
  def products(df: DataFrame, p: Double, seed: Long): DataFrame = {
    val (hit, t) = pick(seed, col("product_id"), p, 3)
    df.withColumn("name", corruptWhen(hit, t, 0, lit(null), col("name")))
      .withColumn("price", corruptWhen(hit, t, 1, -abs(col("price")), col("price")))
      .withColumn("stock_quantity",
        corruptWhen(hit, t, 2, lit(-10), col("stock_quantity")))
  }

  /** Customer corruptions (`corruptions.py:67-73`): invalid email, null
    * email, null name. */
  def customers(df: DataFrame, p: Double, seed: Long): DataFrame = {
    val (hit, t) = pick(seed, col("customer_id"), p, 3)
    df.withColumn("email",
        corruptWhen(hit, t, 0, lit("not-an-email"),
          corruptWhen(hit, t, 1, lit(null), col("email"))))
      .withColumn("name", corruptWhen(hit, t, 2, lit(null), col("name")))
  }

  /** Order corruptions (`corruptions.py:79-91`): null customer_id, empty
    * items, invalid status, negative total, dropped status (→ null). */
  def orders(df: DataFrame, p: Double, seed: Long): DataFrame = {
    val (hit, t) = pick(seed, col("order_id"), p, 5)
    df.withColumn("customer_id", corruptWhen(hit, t, 0, lit(null), col("customer_id")))
      .withColumn("items",
        corruptWhen(hit, t, 1, expr("array()").cast(df.schema("items").dataType),
          col("items")))
      .withColumn("status",
        corruptWhen(hit, t, 2, lit("unknown_status"),
          corruptWhen(hit, t, 4, lit(null), col("status"))))
      .withColumn("total", corruptWhen(hit, t, 3, -abs(col("total")), col("total")))
  }

  /** Event corruptions (`corruptions.py:96-101`): null customer_id,
    * invalid event type, dropped event type (→ null). */
  def events(df: DataFrame, p: Double, seed: Long): DataFrame = {
    val (hit, t) = pick(seed, col("event_id"), p, 3)
    df.withColumn("customer_id", corruptWhen(hit, t, 0, lit(null), col("customer_id")))
      .withColumn("event_type",
        corruptWhen(hit, t, 1, lit("bad_type"),
          corruptWhen(hit, t, 2, lit(null), col("event_type"))))
  }
}
