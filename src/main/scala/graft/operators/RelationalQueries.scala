package graft.operators

import graft.{DQ, Det, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Projection / filter / join / aggregation catalog — SURVEY.md §2.2–§2.4.
  *
  * Semantics derive from the reference's DDL-declared access patterns
  * (`sql/init/03_create_indexes.sql:27-93`), FK joins
  * (`02_create_tables.sql:89-121`) and README KPIs (`README.md:15`);
  * each query is expressed against the driver's TPC-H-ish tables.
  *
  * Scale notes (100 TB):
  *  - dimension joins (region/nation/customer/part) are broadcast-eligible;
  *    AQE promotes them, and `broadcast()` is pinned where the dim side is
  *    known-small by construction.
  *  - every aggregate is partial-aggregable (sum/count of longs), so the
  *    map side combines before the shuffle.
  *  - filters/projections sit directly over the scan → parquet pushdown.
  */
object RelationalQueries {

  import Det._

  private def li(s: SparkSession, d: String)   = Tables.lineitem(s, d)
  private def ord(s: SparkSession, d: String)  = Tables.orders(s, d)
  private def cust(s: SparkSession, d: String) = Tables.customer(s, d)
  private def nat(s: SparkSession, d: String)  = Tables.nation(s, d)
  private def reg(s: SparkSession, d: String)  = Tables.region(s, d)
  private def prt(s: SparkSession, d: String)  = Tables.part(s, d)
  private def sup(s: SparkSession, d: String)  = Tables.supplier(s, d)
  private def ev(s: SparkSession, d: String)   = Tables.events(s, d)

  // ---------------------------------------------------------------- P: projection / filter

  /** P1 — projection + per-row arithmetic (reference: payload field
    * extraction, `schemas.py:26-27`). Per-row doubles are bit-exact in
    * both engines (single IEEE op chain, no reordering). */
  val p1 = DQ(
    "p1_project",
    (s, d) =>
      li(s, d).select(
        col("l_orderkey"),
        col("l_linenumber"),
        (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net"))
        .orderBy("l_orderkey", "l_linenumber"),
    Some("""SELECT l_orderkey, l_linenumber,
            l_extendedprice*(1-l_discount) AS net
            FROM lineitem ORDER BY l_orderkey, l_linenumber"""))

  /** P2 — equality + range filter (index patterns `03_create_indexes.sql:27-47`). */
  val p2 = DQ(
    "p2_filter_range",
    (s, d) =>
      prt(s, d)
        .filter(col("p_size").between(10, 30) && col("p_brand") === "Brand#1")
        .agg(count(lit(1)).as("n"), sum(cents(col("p_retailprice"))).as("retail_cents")),
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(CAST(ROUND(p_retailprice*100) AS BIGINT)) AS BIGINT) AS retail_cents
            FROM part WHERE p_size BETWEEN 10 AND 30 AND p_brand = 'Brand#1'"""))

  /** P3 — composite IN-predicate ("active orders" partial index `03:75-77`). */
  val p3 = DQ(
    "p3_filter_in",
    (s, d) =>
      ord(s, d)
        .filter(col("o_orderstatus").isin("O", "P"))
        .groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"))
        .orderBy("o_orderstatus"),
    Some("""SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n
            FROM orders WHERE o_orderstatus IN ('O','P')
            GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** P4 — enum-membership CHECK predicate (`02_create_tables.sql:113-114`). */
  val p4 = DQ(
    "p4_enum_check",
    (s, d) =>
      ev(s, d)
        .filter(col("event_type").isin("purchase", "signup"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("event_type"),
    Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
            FROM events WHERE event_type IN ('purchase','signup')
            GROUP BY event_type ORDER BY event_type"""))

  /** P5 — null/validity predicates (CHECK constraints `02:54-58,97-98`). */
  val p5 = DQ(
    "p5_validity",
    (s, d) =>
      li(s, d)
        .filter(col("l_quantity") > 0 && col("l_extendedprice") >= 0)
        .agg(count(lit(1)).as("n")),
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n FROM lineitem
            WHERE l_quantity > 0 AND l_extendedprice >= 0"""))

  // ---------------------------------------------------------------- J: joins

  /** J1 — star join orders⋈customer⋈nation⋈region (FK chain
    * `02:89-90`). nation/region are tiny → pinned broadcast; customer is
    * broadcast at test SF and AQE decides at scale. */
  val j1 = DQ(
    "j1_star_join",
    (s, d) =>
      ord(s, d)
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(sum(cents(col("o_totalprice"))).as("total_cents"), count(lit(1)).as("n"))
        .orderBy("r_name"),
    Some("""SELECT r_name,
            CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents,
            CAST(COUNT(*) AS BIGINT) AS n
            FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name"""))

  /** J2 — fact⋈fact equi join lineitem⋈orders (FK `02:103-104`);
    * sort-merge at scale (both sides large, same key domain). */
  val j2 = DQ(
    "j2_fact_join",
    (s, d) =>
      li(s, d)
        .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority,
            CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** Full per-brand quantity aggregate — the staging model under both
    * j3's top-10 view and the `brand_qty` mart ([[graft.Marts]]): the
    * mart must persist EVERY brand (a per-brand upsert can't maintain a
    * top-K whose membership shifts globally), and the dashboard derives
    * top-10 at read time. One definition so view and mart can't drift. */
  private[graft] def brandQty(s: SparkSession, d: String): DataFrame =
    li(s, d)
      .join(prt(s, d), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand")
      .agg(sum(asLong(col("l_quantity"))).as("qty"))

  /** J3 — top products KPI (`README.md:15`): lineitem⋈part, top 10 brands
    * by quantity. `part` is a dimension but NOT tiny at 100 TB (1/30 of
    * lineitem) — broadcast is left to AQE's runtime size estimate rather
    * than pinned, so the plan can demote to shuffle join at scale
    * (round-2 advice applied; pins stay only on nation/region). */
  val j3 = DQ(
    "j3_top_products",
    (s, d) =>
      brandQty(s, d)
        .orderBy(col("qty").desc, col("p_brand"))
        .limit(10),
    Some("""SELECT p_brand, CAST(SUM(CAST(ROUND(l_quantity) AS BIGINT)) AS BIGINT) AS qty
            FROM lineitem JOIN part ON l_partkey = p_partkey
            GROUP BY p_brand ORDER BY qty DESC, p_brand LIMIT 10"""))

  /** J4 — events⋈customers funnel join (FK `02:120-121`, indexes `03:62-73`). */
  val j4 = DQ(
    "j4_funnel_join",
    (s, d) =>
      ev(s, d)
        .join(cust(s, d), col("user_id") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .orderBy("c_mktsegment"),
    Some("""SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n
            FROM events JOIN customer ON user_id = c_custkey
            GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** J5 — left-anti FK-violation rejects (`corruptions.py:80-81` missing
    * customer): customer side filtered to even keys to synthesize orphans. */
  val j5 = DQ(
    "j5_anti_orphans",
    (s, d) => {
      val halfCust = cust(s, d).filter(col("c_custkey") % 2 === 0)
      ord(s, d)
        .join(halfCust, col("o_custkey") === col("c_custkey"), "left_anti")
        .agg(count(lit(1)).as("n_orphans"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_orphans FROM orders
            WHERE NOT EXISTS (SELECT 1 FROM customer
              WHERE c_custkey = o_custkey AND c_custkey % 2 = 0)"""))

  /** J6 — left-semi existence (customers with ≥1 order). */
  val j6 = DQ(
    "j6_semi_exists",
    (s, d) =>
      cust(s, d)
        .join(ord(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .agg(count(lit(1)).as("n_with_orders")),
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_with_orders FROM customer
            WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""))

  /** J7 — multi-way star join incl. the lineitem fact (marts pattern,
    * `01_create_schemas.sql:13-16`). */
  val j7 = DQ(
    "j7_multiway_star",
    (s, d) =>
      li(s, d)
        .join(ord(s, d), col("l_orderkey") === col("o_orderkey"))
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount")))).as("revenue_cents"))
        .orderBy("r_name", "n_name"),
    Some("""SELECT r_name, n_name,
            CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name, n_name ORDER BY r_name, n_name"""))

  /** J8 — supply-side revenue rollup (TPC-H q5/q9 shape over the
    * supplier axis; the reference's seller-dimension marts pattern,
    * `01_create_schemas.sql:13-16`): lineitem ⋈ supplier ⋈ nation,
    * revenue and account balance by the supplier's nation. supplier and
    * nation are small dimensions at any scale (suppliers grow with the
    * business, not the data) — AQE broadcasts them, so the fact table
    * never shuffles. */
  val j8 = DQ(
    "j8_supplier_nation",
    (s, d) =>
      li(s, d)
        .join(sup(s, d), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat(s, d)), col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(
          count(lit(1)).as("n_lines"),
          countDistinct(col("s_suppkey")).as("n_suppliers"),
          sum(cents(col("l_extendedprice") * (lit(1) - col("l_discount"))))
            .as("revenue_cents"))
        .orderBy("n_name"),
    Some("""SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_lines,
            CAST(COUNT(DISTINCT s_suppkey) AS BIGINT) AS n_suppliers,
            CAST(SUM(CAST(ROUND(l_extendedprice*(1-l_discount)*100) AS BIGINT)) AS BIGINT)
              AS revenue_cents
            FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            GROUP BY n_name ORDER BY n_name"""))

  // ---------------------------------------------------------------- A: aggregations

  /** A1 — per-order money rollup (`schemas.py:79-82` compute_total).
    * Integer-cents per row → exact distributed sum. */
  val a1 = DQ(
    "a1_per_order_total",
    (s, d) =>
      li(s, d)
        .groupBy("l_orderkey")
        .agg(sum(cents(col("l_quantity") * col("l_extendedprice"))).as("total_cents"))
        .orderBy("l_orderkey"),
    Some("""SELECT l_orderkey,
            CAST(SUM(CAST(ROUND(l_quantity*l_extendedprice*100) AS BIGINT)) AS BIGINT) AS total_cents
            FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"""))

  /** A2 — revenue-trend KPI (`README.md:15`): monthly count/sum/avg. */
  val a2 = DQ(
    "a2_revenue_trend",
    (s, d) =>
      ord(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(cents(col("o_totalprice"))).as("revenue_cents"))
        .withColumn("avg_price_cents",
          round(col("revenue_cents") / col("n_orders")).cast("long"))
        .orderBy("month"),
    Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
            CAST(COUNT(*) AS BIGINT) AS n_orders,
            CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
            CAST(ROUND(CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
              / CAST(COUNT(*) AS BIGINT)) AS BIGINT) AS avg_price_cents
            FROM orders GROUP BY 1 ORDER BY month"""))

  /** A4 — data-quality conditional aggregates (`README.md:15`,
    * `corruptions.py:31-45`). */
  val a4 = DQ(
    "a4_quality_rates",
    (s, d) =>
      ev(s, d)
        .groupBy("event_type")
        .agg(
          count(lit(1)).as("n"),
          sum(when(col("value") < 10, 1L).otherwise(0L)).as("n_low"),
          count(get_json_object(col("props"), "$.missing")).as("n_has_missing"))
        .withColumn("low_share_bp",
          round(col("n_low") * lit(10000.0) / col("n")).cast("long"))
        .orderBy("event_type"),
    Some("""SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(CASE WHEN value < 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
            CAST(COUNT(json_extract_string(props, '$.missing')) AS BIGINT) AS n_has_missing,
            CAST(ROUND(CAST(SUM(CASE WHEN value < 10 THEN 1 ELSE 0 END) AS BIGINT)
              * 10000.0 / CAST(COUNT(*) AS BIGINT)) AS BIGINT) AS low_share_bp
            FROM events GROUP BY event_type ORDER BY event_type"""))

  /** A5 — distinct count (unique-email analog `02:68`). */
  val a5 = DQ(
    "a5_distinct_count",
    (s, d) =>
      ord(s, d).agg(
        countDistinct(col("o_custkey")).as("n_cust"),
        count(lit(1)).as("n")),
    Some("""SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_cust,
            CAST(COUNT(*) AS BIGINT) AS n FROM orders"""))

  /** A5b — approximate distinct (HLL). Not hash-comparable by design →
    * no oracle; the spec asserts the HLL estimate is within 5% of exact,
    * and the relative error is an in-plan invariant column so the
    * driver's per-round record pins it numerically too. */
  val a5approx = DQ(
    "a5_approx_distinct",
    (s, d) => ord(s, d)
      .agg(
        approx_count_distinct(col("o_custkey")).as("n_approx"),
        countDistinct(col("o_custkey")).as("n_exact"))
      .withColumn("err_e4",
        round(abs(col("n_approx") - col("n_exact")) * lit(10000.0) / col("n_exact"))
          .cast("long")),
    None)

  /** A6 — multi-level rollup (dbt staging→marts skeleton `sql/dbt/`).
    * The rollup's Expand node duplicates the grouping attributes, which
    * trips the Dataset ambiguous-self-join analyzer even on pre-aliased
    * columns, so the rollup itself is expressed in SQL (pure name
    * resolution). The view name is unique per invocation and dropped
    * immediately — `sql()` analyzes eagerly, so the returned plan does
    * not depend on the view surviving (round-2 advice: no session-global
    * mutable name). */
  val a6 = DQ(
    "a6_rollup",
    (s, d) => {
      val view = "a6_base_" + java.util.UUID.randomUUID().toString.replace("-", "")
      ord(s, d)
        .join(cust(s, d), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(reg(s, d)), col("n_regionkey") === col("r_regionkey"))
        .select(col("r_name").as("rn"), col("n_name").as("nn"), col("o_totalprice"))
        .createOrReplaceTempView(view)
      try s.sql(
        s"""SELECT coalesce(rn, 'ALL') AS r_label,
                   coalesce(nn, 'ALL') AS n_label,
                   sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS total_cents,
                   count(1) AS n
            FROM $view
            GROUP BY ROLLUP(rn, nn)
            ORDER BY r_label, n_label""")
      finally s.catalog.dropTempView(view)
    },
    Some("""SELECT COALESCE(r_name,'ALL') AS r_label, COALESCE(n_name,'ALL') AS n_label,
            CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS total_cents,
            CAST(COUNT(*) AS BIGINT) AS n
            FROM orders JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY ROLLUP(r_name, n_name) ORDER BY r_label, n_label"""))

  /** A7 — running producer counters analog (`producer.py:41-51`):
    * row + byte accounting over the stream table. */
  val a7 = DQ(
    "a7_counters",
    (s, d) =>
      ev(s, d).agg(
        count(lit(1)).as("n"),
        sum(length(col("props")).cast("long")).as("props_bytes"),
        sum(length(col("event_type")).cast("long")).as("type_bytes")),
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(LENGTH(props)) AS BIGINT) AS props_bytes,
            CAST(SUM(LENGTH(event_type)) AS BIGINT) AS type_bytes
            FROM events"""))

  /** A9 — exact interpolated percentiles (order-value distribution by
    * priority — the p50/p90 latency-style KPI every dashboard carries).
    * Spark's `percentile` and DuckDB's `quantile_cont` both use linear
    * interpolation at rank (n-1)*p over the integer-cents values, so the
    * rounded result is engine-portable. Scale: percentile is a sort-based
    * agg per group — 5 bounded groups here; at 100 TB the same query
    * over high-cardinality groups would switch to approx_percentile
    * (t-digest, partial-aggregable), which a5approx already exercises
    * for the HLL analog. */
  val a9 = DQ(
    "a9_percentiles",
    (s, d) =>
      ord(s, d)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          // one sort-based percentile pass for both quantiles — the
          // two-call form buffers and sorts the group twice
          expr("percentile(CAST(ROUND(o_totalprice*100) AS BIGINT), array(0.5D, 0.9D))")
            .as("pcts"))
        .select(col("o_orderpriority"), col("n"),
          round(element_at(col("pcts"), 1)).cast("long").as("p50_cents"),
          round(element_at(col("pcts"), 2)).cast("long").as("p90_cents"))
        .orderBy("o_orderpriority"),
    Some("""SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
            CAST(ROUND(quantile_cont(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.5))
              AS BIGINT) AS p50_cents,
            CAST(ROUND(quantile_cont(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.9))
              AS BIGINT) AS p90_cents
            FROM orders GROUP BY 1 ORDER BY o_orderpriority"""))

  /** A9b — approximate percentile (t-digest-style quantile summary,
    * partial-aggregable: the 100 TB path a9's exact sort-based agg
    * hands off to at high group cardinality). Not hash-comparable by
    * design → no oracle; the relative error vs the exact quantile is an
    * in-plan invariant column (a5approx pattern) and the spec bounds it
    * at 1%. */
  val a9approx = DQ(
    "a9_approx_percentiles",
    (s, d) =>
      ord(s, d)
        .groupBy("o_orderpriority")
        .agg(
          count(lit(1)).as("n"),
          expr("percentile(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.5D)")
            .as("p50_exact"),
          expr("approx_percentile(CAST(ROUND(o_totalprice*100) AS BIGINT), 0.5D, 10000)")
            .as("p50_approx"))
        .select(
          col("o_orderpriority"), col("n"),
          round(col("p50_exact")).cast("long").as("p50_exact_cents"),
          col("p50_approx").cast("long").as("p50_approx_cents"),
          round(abs(col("p50_approx") - col("p50_exact")) * lit(10000.0) / col("p50_exact"))
            .cast("long").as("err_e4"))
        .orderBy("o_orderpriority"),
    None)

  val all: Seq[DQ] = Seq(p1, p2, p3, p4, p5, j1, j2, j3, j4, j5, j6, j7, j8,
    a1, a2, a4, a5, a5approx, a6, a7, a9, a9approx)
}
