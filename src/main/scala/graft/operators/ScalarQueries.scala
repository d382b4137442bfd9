package graft.operators

import graft.{DQ, Det, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Scalar-function families — SURVEY.md §2.7. Everything is a built-in
  * Catalyst expression (whole-stage-codegen'd); no UDFs.
  *
  * F2/F3 mirror the reference's email construction + validity
  * (`utils.py:85-128`, `corruptions.py:70-71`); F7 the per-period KPI
  * truncation; F10/F11 the nested order-items payload
  * (`schemas.py:69,79-82`) via array/map higher-order functions.
  */
object ScalarQueries {

  import Det._

  /** F2 — string build/normalize: derive emails like
    * `utils.py:_random_email` (lower + replace + concat). */
  val f2 = DQ(
    "f2_string_email",
    (s, d) =>
      Tables.customer(s, d)
        .select(concat(lower(regexp_replace(col("c_name"), " ", ".")),
          lit("@example.com")).as("email"))
        .agg(countDistinct(col("email")).as("n_distinct"), count(lit(1)).as("n")),
    Some("""SELECT CAST(COUNT(DISTINCT email) AS BIGINT) AS n_distinct,
            CAST(COUNT(*) AS BIGINT) AS n FROM
            (SELECT LOWER(REPLACE(c_name, ' ', '.')) || '@example.com' AS email
             FROM customer)"""))

  /** F3 — email-validity regex (corruption `"not-an-email"`,
    * `corruptions.py:70-71`; UNIQUE email `02:68`). */
  val f3 = DQ(
    "f3_email_regex",
    (s, d) =>
      Tables.customer(s, d)
        .select(concat(lower(regexp_replace(col("c_name"), " ", ".")),
          lit("@example.com")).as("email"))
        .agg(
          sum(when(col("email").rlike("^[^@]+@[^@]+\\.[^@]+$"), 1L).otherwise(0L)).as("n_valid"),
          count(lit(1)).as("n")),
    Some("""SELECT CAST(SUM(CASE WHEN regexp_matches(email, '^[^@]+@[^@]+\.[^@]+$')
              THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
            CAST(COUNT(*) AS BIGINT) AS n FROM
            (SELECT LOWER(REPLACE(c_name, ' ', '.')) || '@example.com' AS email
             FROM customer)"""))

  /** F7 — date/time truncation + formatting (per-period KPI `README.md:15`). */
  val f7 = DQ(
    "f7_date_format",
    (s, d) =>
      Tables.orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(count(lit(1)).as("n"))
        .orderBy("month"),
    Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
            CAST(COUNT(*) AS BIGINT) AS n
            FROM orders GROUP BY 1 ORDER BY month"""))

  /** F10 — array/nested ops over the order payload (`items` list,
    * `schemas.py:69`): build per-order arrays, then size() + aggregate()
    * higher-order functions. Result is order-insensitive so the
    * collect_list ordering doesn't matter. */
  val f10 = DQ(
    "f10_array_hof",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy("l_orderkey")
        .agg(collect_list(struct(col("l_linenumber"), col("l_quantity"))).as("items"))
        .select(
          col("l_orderkey"),
          size(col("items")).cast("long").as("n_items"),
          aggregate(col("items"), lit(0L),
            (acc, x) => acc + round(x.getField("l_quantity")).cast("long")).as("sum_qty"))
        .orderBy("l_orderkey"),
    Some("""SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_items,
            CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
            FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"""))

  /** F11 — map/props access (JSONB GIN queries `03:83-93`): parse props
    * as a map and aggregate a key's value by event type. */
  val f11 = DQ(
    "f11_map_access",
    (s, d) =>
      Tables.events(s, d)
        .withColumn("k", element_at(
          from_json(col("props"), MapType(StringType, IntegerType)), "k").cast("long"))
        .groupBy("event_type")
        .agg(sum(col("k")).as("sum_k"), count(col("k")).as("n_k"))
        .withColumn("avg_k_x100",
          round(col("sum_k") / col("n_k") * lit(100.0)).cast("long"))
        .orderBy("event_type"),
    Some("""SELECT event_type,
            CAST(SUM(k) AS BIGINT) AS sum_k, CAST(COUNT(k) AS BIGINT) AS n_k,
            CAST(ROUND(CAST(SUM(k) AS BIGINT) / CAST(COUNT(k) AS BIGINT) * 100.0) AS BIGINT)
              AS avg_k_x100
            FROM (SELECT event_type,
                    CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
                  FROM events)
            GROUP BY event_type ORDER BY event_type"""))

  val all: Seq[DQ] = Seq(f2, f3, f7, f10, f11)
}
