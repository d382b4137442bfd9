package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S1 — deterministic synthetic entity generator, the columnar analog of
  * the reference's seeded batch generator (`utils.py:311-335` with
  * per-entity builders `utils.py:142-295`).
  *
  * Determinism model (SURVEY.md §7.3 risk 6): the reference relies on a
  * global single-threaded RNG; that cannot be reproduced distributed.
  * Instead every random draw is a pure function of `(seed, row id, field
  * name)` via `xxhash64` — per-row determinism independent of
  * partitioning, task order, and cluster size, which is the property that
  * matters at 100 TB (`spark.range(n)` parallelizes perfectly and any
  * row can be regenerated in isolation).
  *
  * Referential integrity mirrors `utils.py:326-328`: orders/events draw
  * customer/product indices in `[0, nCustomers)` and re-derive the same
  * deterministic ids the customer/product generators produce.
  */
object Generator {

  val Categories: Seq[String]    = Seq("electronics", "books", "clothing", "home", "sports")
  val OrderStatuses: Seq[String] = Seq("pending", "processing", "shipped", "delivered", "cancelled")
  val EventTypes: Seq[String]    = Seq("page_view", "add_to_cart", "purchase", "signup", "search")
  val FirstNames: Seq[String]    = Seq("Alice", "Bob", "Carol", "Dave", "Erin", "Frank", "Grace", "Heidi")
  val LastNames: Seq[String]     = Seq("Smith", "Jones", "Lee", "Patel", "Garcia", "Kim", "Chen", "Brown")

  /** 2026-01-01T00:00:00Z in epoch microseconds — generation time base. */
  private val BaseUs = 1767225600000000L

  /** Uniform [0,1) as a pure function of (seed, id column, field tag):
    * top 53 bits of xxhash64 scaled — exactly representable in a double. */
  def u(seed: Long, id: Column, field: String): Column =
    shiftrightunsigned(xxhash64(lit(seed), id, lit(field)), 11).cast("double") /
      lit(9007199254740992.0) // 2^53

  /** Seeded choice from a fixed list (analog of `random.choice`,
    * `utils.py:156,212,264`). */
  def choice(seed: Long, id: Column, field: String, xs: Seq[String]): Column =
    element_at(array(xs.map(lit): _*), (floor(u(seed, id, field) * xs.size) + 1).cast("int"))

  /** Deterministic uuid-shaped id (8-4-4-4-12 hex) from an entity kind +
    * index — the distributed stand-in for `uuid4()` defaults
    * (`schemas.py:15,36,67,97`) that keeps FK references derivable. */
  def entityId(kind: String, idx: Column): Column = {
    val h = md5(concat(lit(kind), lit(":"), idx.cast("long").cast("string")))
    concat_ws("-", substring(h, 1, 8), substring(h, 9, 4), substring(h, 13, 4),
      substring(h, 17, 4), substring(h, 21, 12))
  }

  private def tsIn(seed: Long, id: Column, field: String, spanDays: Int): Column =
    timestamp_micros(lit(BaseUs) +
      (u(seed, id, field) * lit(spanDays.toDouble * 86400000000.0)).cast("long"))

  /** Products (`utils.py:142-170` analog): id, two-word name, category,
    * uniform price in [5, 500) rounded to cents, stock in [0, 1000). */
  def products(spark: SparkSession, n: Long, seed: Long): DataFrame = {
    val id = col("id")
    spark.range(n).select(
      entityId("product", id).as("product_id"),
      concat_ws(" ",
        choice(seed, id, "pn1", FirstNames),
        choice(seed, id, "pn2", Categories)).as("name"),
      choice(seed, id, "cat", Categories).as("category"),
      round(u(seed, id, "price") * 495.0 + 5.0, 2).as("price"),
      floor(u(seed, id, "stock") * 1000).cast("int").as("stock_quantity"),
      tsIn(seed, id, "created", 365).as("created_at"))
  }

  /** Customers (`utils.py:172-205` analog): name from fixed name pools,
    * email derived exactly like `_random_email` (`utils.py:85-128`). */
  def customers(spark: SparkSession, n: Long, seed: Long): DataFrame = {
    val id = col("id")
    val name = concat_ws(" ",
      choice(seed, id, "fn", FirstNames), choice(seed, id, "ln", LastNames))
    spark.range(n).select(
      entityId("customer", id).as("customer_id"),
      name.as("name"),
      concat(lower(regexp_replace(name, " ", ".")), lit("."), id.cast("string"),
        lit("@example.com")).as("email"),
      tsIn(seed, id, "created", 365).as("created_at"))
  }

  /** Orders with a nested `items` array (`schemas.py:69`; builder
    * `utils.py:207-260`): FK-valid customer/product references, 1–4
    * items with quantity in [1,5] and unit price in [5,500), and
    * `total = round(Σ qty·price, 2)` computed like
    * `Order.compute_total` (`schemas.py:79-82`) with HALF_EVEN `bround`
    * for Python-round parity. */
  def orders(spark: SparkSession, n: Long, nCustomers: Long, nProducts: Long,
      seed: Long): DataFrame = {
    val id = col("id")
    val custIdx = floor(u(seed, id, "cust") * nCustomers)
    // Per-item draws fold the item ordinal `i` into the hash so each line
    // is independently deterministic; built as one SQL lambda because the
    // item count and every per-item value depend on the lambda variable.
    val itemsCol = {
      val qtyU   = s"cast(shiftrightunsigned(xxhash64($seed, id, 'item_qty', i), 11) as double) / 9007199254740992.0"
      val priceU = s"cast(shiftrightunsigned(xxhash64($seed, id, 'item_price', i), 11) as double) / 9007199254740992.0"
      val prodU  = s"cast(shiftrightunsigned(xxhash64($seed, id, 'item_prod', i), 11) as double) / 9007199254740992.0"
      val prodIdx = s"cast(floor($prodU * ${nProducts}L) as bigint)"
      val prodHash = s"md5(concat('product', ':', cast($prodIdx as string)))"
      val prodId = s"concat_ws('-', substring($prodHash, 1, 8), substring($prodHash, 9, 4), " +
        s"substring($prodHash, 13, 4), substring($prodHash, 17, 4), substring($prodHash, 21, 12))"
      expr(
        s"""transform(sequence(1, cast(floor(
              cast(shiftrightunsigned(xxhash64($seed, id, 'n_items'), 11) as double)
                / 9007199254740992.0 * 4) + 1 as int)),
            i -> named_struct(
              'product_id', $prodId,
              'quantity', cast(floor($qtyU * 5) + 1 as int),
              'unit_price', round($priceU * 495.0 + 5.0, 2)))""")
    }
    spark.range(n)
      .select(
        entityId("order", id).as("order_id"),
        entityId("customer", custIdx).as("customer_id"),
        choice(seed, id, "status", OrderStatuses).as("status"),
        itemsCol.as("items"),
        tsIn(seed, id, "created", 365).as("created_at"))
      .withColumn("updated_at",
        timestamp_micros(unix_micros(col("created_at")) +
          (u(seed, col("order_id"), "upd") * lit(86400000000.0)).cast("long")))
      .withColumn("total",
        bround(aggregate(col("items"), lit(0.0),
          (acc, x) => acc + x.getField("quantity") * x.getField("unit_price")), 2))
  }

  /** Events (`utils.py:262-295` analog): FK-valid customer reference,
    * enum event type, JSON props payload. */
  def events(spark: SparkSession, n: Long, nCustomers: Long, seed: Long): DataFrame = {
    val id = col("id")
    val custIdx = floor(u(seed, id, "cust") * nCustomers)
    spark.range(n).select(
      entityId("event", id).as("event_id"),
      entityId("customer", custIdx).as("customer_id"),
      choice(seed, id, "type", EventTypes).as("event_type"),
      tsIn(seed, id, "ts", 30).as("timestamp"),
      to_json(map(lit("k"), floor(u(seed, id, "k") * 100).cast("int"))).as("props"))
  }
}
