package graft.operators

import graft.{DQ, Det, Tables}
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Declared queries for the validation surface (SURVEY.md §2.8) plus the
  * tumbling-window KPI in batch form (§2.9 T2), all expressed over the
  * driver's tables so the DuckDB oracle can hash-check them. The
  * streaming forms and the (valid, rejects) splitters live in
  * graft.streaming / [[Validation]]; these DQs pin the rule *arithmetic*.
  *
  * Scale: every query is a scan + conditional-sum hash agg (validation
  * reporting never shuffles more than its rule counters); v5 joins on
  * the natural keys with partial aggregation on both sides.
  */
object ValidationQueries {

  import Det._

  private def cnt(pred: Column): Column = sum(when(pred, 1L).otherwise(0L))

  /** V1 — product validation counters (CHECKs `02_create_tables.sql:54-58`
    * re-expressed over `part`). */
  val v1 = DQ(
    "v1_validate_products",
    (s, d) =>
      Tables.part(s, d).agg(
        count(lit(1)).as("n_rows"),
        cnt(col("p_name").isNull).as("n_name_missing"),
        cnt(col("p_retailprice").isNull || col("p_retailprice") < 0).as("n_price_invalid"),
        cnt(col("p_size").isNull || col("p_size") <= 0).as("n_size_invalid"),
        cnt(col("p_name").isNotNull &&
          col("p_retailprice").isNotNull && col("p_retailprice") >= 0 &&
          col("p_size").isNotNull && col("p_size") > 0).as("n_valid")),
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(SUM(CASE WHEN p_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_name_missing,
            CAST(SUM(CASE WHEN p_retailprice IS NULL OR p_retailprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_price_invalid,
            CAST(SUM(CASE WHEN p_size IS NULL OR p_size <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_size_invalid,
            CAST(SUM(CASE WHEN p_name IS NOT NULL AND p_retailprice IS NOT NULL
              AND p_retailprice >= 0 AND p_size IS NOT NULL AND p_size > 0
              THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
            FROM part"""))

  /** V2 — customer validation counters (email shape from the F2
    * construction; UNIQUE email `02:68` as a distinct-count check). */
  val v2 = DQ(
    "v2_validate_customers",
    (s, d) =>
      Tables.customer(s, d)
        .withColumn("email",
          concat(lower(regexp_replace(col("c_name"), " ", ".")), lit("@example.com")))
        .agg(
          count(lit(1)).as("n_rows"),
          cnt(col("c_name").isNull).as("n_name_missing"),
          cnt(!col("email").rlike("^[^@]+@[^@]+\\.[^@]+$")).as("n_email_invalid"),
          countDistinct(col("email")).as("n_email_distinct")),
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(SUM(CASE WHEN c_name IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_name_missing,
            CAST(SUM(CASE WHEN NOT regexp_matches(email, '^[^@]+@[^@]+\.[^@]+$')
              THEN 1 ELSE 0 END) AS BIGINT) AS n_email_invalid,
            CAST(COUNT(DISTINCT email) AS BIGINT) AS n_email_distinct
            FROM (SELECT c_name, LOWER(REPLACE(c_name, ' ', '.')) || '@example.com' AS email
                  FROM customer)"""))

  /** V3 — order validation counters (CHECKs `02:80-82`: status enum,
    * total ≥ 0, customer present). */
  val v3 = DQ(
    "v3_validate_orders",
    (s, d) =>
      Tables.orders(s, d).agg(
        count(lit(1)).as("n_rows"),
        cnt(col("o_custkey").isNull).as("n_customer_missing"),
        cnt(col("o_orderstatus").isNull ||
          !col("o_orderstatus").isin("O", "F", "P")).as("n_status_invalid"),
        cnt(col("o_totalprice").isNull || col("o_totalprice") < 0).as("n_total_invalid"),
        cnt(col("o_custkey").isNotNull &&
          col("o_orderstatus").isin("O", "F", "P") &&
          col("o_totalprice") >= 0).as("n_valid")),
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_customer_missing,
            CAST(SUM(CASE WHEN o_orderstatus IS NULL OR o_orderstatus NOT IN ('O','F','P')
              THEN 1 ELSE 0 END) AS BIGINT) AS n_status_invalid,
            CAST(SUM(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_total_invalid,
            CAST(SUM(CASE WHEN o_custkey IS NOT NULL AND o_orderstatus IN ('O','F','P')
              AND o_totalprice >= 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_valid
            FROM orders"""))

  /** V4 — event validation counters (CHECK `02:113-114`: enum membership,
    * user present). */
  val v4 = DQ(
    "v4_validate_events",
    (s, d) =>
      Tables.events(s, d).agg(
        count(lit(1)).as("n_rows"),
        cnt(col("user_id").isNull).as("n_user_missing"),
        cnt(col("event_type").isNull || !col("event_type").isin(
          "page_view", "add_to_cart", "purchase", "signup", "search")).as("n_type_invalid"),
        cnt(col("value").isNull).as("n_value_missing")),
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
            CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_user_missing,
            CAST(SUM(CASE WHEN event_type IS NULL OR event_type NOT IN
              ('page_view','add_to_cart','purchase','signup','search')
              THEN 1 ELSE 0 END) AS BIGINT) AS n_type_invalid,
            CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_value_missing
            FROM events"""))

  /** V5 — cross-entity consistency: FK existence (orders→customer,
    * `02:89-90`) and recomputed-total agreement (`schemas.py:79-82`
    * analog: o_totalprice vs Σ extendedprice·(1−discount)·(1+tax) in
    * integer cents, within one cent). */
  val v5 = DQ(
    "v5_cross_entity",
    (s, d) => {
      val recomp = Tables.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")) *
          (lit(1) + col("l_tax")))).as("recomp_cents"))
      val cust = Tables.customer(s, d).select(col("c_custkey"))
      Tables.orders(s, d)
        .join(recomp, col("o_orderkey") === col("l_orderkey"), "left")
        .join(cust, col("o_custkey") === col("c_custkey"), "left")
        .agg(
          count(lit(1)).as("n_orders"),
          cnt(col("recomp_cents").isNull).as("n_without_items"),
          cnt(abs(cents(col("o_totalprice")) - col("recomp_cents")) <= 1).as("n_total_match"),
          cnt(col("c_custkey").isNull).as("n_fk_orphans"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
            CAST(SUM(CASE WHEN r.recomp_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_without_items,
            CAST(SUM(CASE WHEN ABS(CAST(ROUND(o_totalprice*100) AS BIGINT) - r.recomp_cents) <= 1
              THEN 1 ELSE 0 END) AS BIGINT) AS n_total_match,
            CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_fk_orphans
            FROM orders o
            LEFT JOIN (SELECT l_orderkey,
                         CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*(1+l_tax)*100) AS BIGINT)) AS BIGINT)
                           AS recomp_cents
                       FROM lineitem GROUP BY l_orderkey) r ON o.o_orderkey = r.l_orderkey
            LEFT JOIN customer c ON o.o_custkey = c.c_custkey"""))

  /** T2 — tumbling-window KPI in batch form (`README.md:15` orders per
    * period): epoch-aligned 1-hour `window()` over event time; the
    * streaming form (watermarked) lives in graft.streaming.WindowedKpis.
    * Window start is exported as epoch micros so the hash compare is
    * timezone-proof. */
  val t2 = DQ(
    "t2_tumbling_window",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(window(col("ts"), "1 hour").as("w"))
        .agg(count(lit(1)).as("n"), sum(asLong(col("value"))).as("sum_value"))
        .select(unix_micros(col("w.start")).as("win_start_us"), col("n"), col("sum_value"))
        .orderBy("win_start_us"),
    Some("""SELECT win_start_us, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(CAST(ROUND(value) AS BIGINT)) AS BIGINT) AS sum_value
            FROM (SELECT epoch_us(ts) - epoch_us(ts) % 3600000000 AS win_start_us, value
                  FROM events)
            GROUP BY win_start_us ORDER BY win_start_us"""))

  val all: Seq[DQ] = Seq(v1, v2, v3, v4, v5, t2)
}
