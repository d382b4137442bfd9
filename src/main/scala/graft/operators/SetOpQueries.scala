package graft.operators

import graft.{DQ, Det, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Sorts / limits / top-K / set operations — SURVEY.md §2.6.
  *
  * O1/O2 compile to `TakeOrderedAndProject` (per-partition top-K, then a
  * single driver-side merge of K-row heaps — no global sort at any
  * scale). O3–O5 are shuffle-distinct operators; map-side partial
  * aggregation bounds the shuffle.
  */
object SetOpQueries {

  import Det._

  /** O1/O2 — ordered top-K (sort-supporting indexes `03:29-47`, top
    * products `README.md:15`). Ordering key uses integer cents so the
    * boundary row is the same in both engines. */
  val o1 = DQ(
    "o1_topk_sort",
    (s, d) =>
      Tables.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          cents(col("l_extendedprice")).as("price_cents"))
        .orderBy(col("price_cents").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(100),
    Some("""SELECT l_orderkey, l_linenumber,
            CAST(ROUND(l_extendedprice*100) AS BIGINT) AS price_cents
            FROM lineitem
            ORDER BY price_cents DESC, l_orderkey, l_linenumber LIMIT 100"""))

  /** O3 — union of entity streams (`producer.py:214-221`) + distinct. */
  val o3 = DQ(
    "o3_union_distinct",
    (s, d) =>
      Tables.orders(s, d).select(col("o_orderkey").as("id"))
        .unionByName(Tables.lineitem(s, d).select(col("l_orderkey").as("id")))
        .distinct()
        .agg(count(lit(1)).as("n_distinct_ids")),
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_ids FROM
            (SELECT o_orderkey AS id FROM orders
             UNION SELECT l_orderkey AS id FROM lineitem)"""))

  /** O4 — dedup on key after duplicated delivery; same semantics as the
    * raw-audit idempotent replay (`02:16`). Key duplication is made
    * explicit on both sides (min per key) so semantics stay aligned even
    * if a key ever recurs with a different value — `dropDuplicates` would
    * keep an arbitrary row. */
  val o4 = DQ(
    "o4_dedup",
    (s, d) => {
      val e = Tables.events(s, d).select("event_id", "value")
      e.unionByName(e)
        .groupBy("event_id")
        .agg(min(cents(col("value"))).as("v_cents"))
        .agg(count(lit(1)).as("n"), sum(col("v_cents")).as("value_cents"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(v_cents) AS BIGINT) AS value_cents
            FROM (SELECT event_id, MIN(CAST(ROUND(value*100) AS BIGINT)) AS v_cents
              FROM (SELECT event_id, value FROM events
               UNION ALL SELECT event_id, value FROM events)
              GROUP BY event_id)"""))

  /** O5 — except/intersect (replay diff / FK orphan checks, `02:16`). */
  val o5 = DQ(
    "o5_except_intersect",
    (s, d) => {
      val oc = Tables.orders(s, d).select(col("o_custkey").as("k"))
      val cc = Tables.customer(s, d).select(col("c_custkey").as("k"))
      val nOrphan = oc.except(cc).agg(count(lit(1)).as("n_orphan"))
      val nCommon = oc.intersect(cc).agg(count(lit(1)).as("n_common"))
      nOrphan.crossJoin(nCommon)
    },
    Some("""SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM
              (SELECT o_custkey AS k FROM orders EXCEPT SELECT c_custkey FROM customer)) AS n_orphan,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM
              (SELECT o_custkey AS k FROM orders INTERSECT SELECT c_custkey FROM customer)) AS n_common"""))

  val all: Seq[DQ] = Seq(o1, o3, o4, o5)
}
