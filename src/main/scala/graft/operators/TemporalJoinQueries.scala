package graft.operators

import graft.{DQ, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators — as-of join and range join over the event
  * stream, the two join shapes Spark has no built-in operator for.
  *
  * The semantics come from the reference's funnel-analysis surface (its
  * composite time indexes `sql/init/03_create_indexes.sql:69-73` exist
  * precisely to answer "which page view led to this purchase" /
  * "conversions within a window" lookups); here they are first-class
  * distributed operators instead of index-assisted point queries.
  *
  * Scale design (100 TB):
  *  - The as-of join is NOT an inequality join: both sides are tagged,
  *    unioned, and resolved with ONE shuffle on the join key plus a
  *    per-partition running `last(ignoreNulls)`. No candidate pairs are
  *    ever materialized, so cost is O(events) regardless of how many
  *    rows precede each probe — the standard distributed as-of shape
  *    (same trick as w4's partitioned rolling window). Skew bound = the
  *    heaviest single user's event count.
  *  - The range join replicates each interval into the (at most 2)
  *    fixed-width time buckets it overlaps and equi-joins on
  *    (user, bucket) before applying the exact range predicate — a
  *    bucketed band join. The shuffle is an equi-join Exchange (AQE can
  *    split skewed buckets); the exact predicate only ever evaluates
  *    within a bucket, never across the cartesian of the inputs.
  */
object TemporalJoinQueries {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  /** J9 — as-of join: for every purchase, the latest view of the same
    * user at-or-before the purchase (last-touch attribution).
    *
    * Instantiates the generic [[TemporalJoins.asOfJoin]] (tagged union,
    * one key shuffle, running last) with views as the build side
    * carrying (vid, vt) and purchases as the probe; view ties resolve
    * deterministically by event_id, and a view at the exact purchase
    * time attributes (at-or-before inclusive). Purchases with no prior
    * view yield -1 — a real cutoff, not a missing-key artifact.
    */
  val j9 = DQ(
    "j9_asof_join",
    (s, d) => {
      val e = ev(s, d)
      val views = e.filter(col("event_type") === "view")
        .select(col("user_id").as("vk"), col("ts_us").as("vt"),
          col("event_id").as("vid"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pk"), col("ts_us").as("pt"),
          col("event_id").as("pid"))
      TemporalJoins.asOfJoin(purchases, views,
          probeKey = "pk", buildKey = "vk",
          probeTime = "pt", buildTime = "vt", tieBreak = "vid",
          carried = Seq("vid", "vt"))
        .select(
          col("pid").as("purchase_id"),
          coalesce(col("vid"), lit(-1L)).as("view_id"),
          coalesce(expr("(pt - vt) div 1000000"), lit(-1L)).as("gap_sec"))
        .orderBy("purchase_id")
    },
    // The oracle runs the as-of DEFINITION (same tagged-union window) in
    // DuckDB — the two engines execute it independently.
    Some("""WITH u AS (
              SELECT user_id AS k, epoch_us(ts) AS t, 0 AS side, event_id AS vid,
                     epoch_us(ts) AS vt, NULL::BIGINT AS pid
              FROM events WHERE event_type = 'view'
              UNION ALL
              SELECT user_id, epoch_us(ts), 1, NULL::BIGINT, NULL::BIGINT, event_id
              FROM events WHERE event_type = 'purchase'
            ), w AS (
              SELECT *,
                LAST_VALUE(vid IGNORE NULLS) OVER win AS asof_view_id,
                LAST_VALUE(vt  IGNORE NULLS) OVER win AS asof_view_t
              FROM u
              WINDOW win AS (PARTITION BY k ORDER BY t, side, vid
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            )
            SELECT pid AS purchase_id, COALESCE(asof_view_id, -1) AS view_id,
              CAST(COALESCE((t - asof_view_t) // 1000000, -1) AS BIGINT) AS gap_sec
            FROM w WHERE side = 1 ORDER BY purchase_id"""))

  private val winUs = 4L * 3600 * 1000000 // 4-hour attribution window

  /** J10 — range join: all (view, purchase) pairs of the same user with
    * the purchase inside [view_ts, view_ts + 4h). Implemented as a
    * bucketed band join (see object scaladoc): intervals replicate into
    * their ≤2 overlapping 4-hour buckets, the join is an equi-join on
    * (user, bucket), and the exact range predicate prunes within the
    * bucket. A view and purchase can only match in the single bucket
    * holding the purchase, and the view's replicas carry distinct bucket
    * ids, so no pair is double-counted. The oracle is the plain
    * inequality join — DuckDB's IEJoin evaluates the same semantics via
    * a different algorithm.
    */
  val j10 = DQ(
    "j10_range_join",
    (s, d) => {
      val e = ev(s, d)
      val p = e.filter(col("event_type") === "purchase")
        .select(col("user_id").as("pk"), col("ts_us").as("pt"),
          col("event_id").as("pid"))
      val v = e.filter(col("event_type") === "view")
        .select(col("user_id").as("vk"), col("ts_us").as("vt"),
          col("event_id").as("vid"))
      TemporalJoins.rangeJoin(v, p,
          leftKey = "vk", rightKey = "pk",
          leftTime = "vt", rightTime = "pt", windowUs = winUs)
        .agg(
          count(lit(1)).as("n_pairs"),
          countDistinct(col("vid")).as("n_views"),
          countDistinct(col("pid")).as("n_purchases"),
          coalesce(sum(expr("(pt - vt) div 1000000")), lit(0L)).as("sum_lag_sec"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
              CAST(COUNT(DISTINCT v.event_id) AS BIGINT) AS n_views,
              CAST(COUNT(DISTINCT p.event_id) AS BIGINT) AS n_purchases,
              CAST(COALESCE(SUM((epoch_us(p.ts) - epoch_us(v.ts)) // 1000000), 0) AS BIGINT)
                AS sum_lag_sec
            FROM events v JOIN events p
              ON v.user_id = p.user_id
             AND v.event_type = 'view' AND p.event_type = 'purchase'
             AND epoch_us(p.ts) >= epoch_us(v.ts)
             AND epoch_us(p.ts) <  epoch_us(v.ts) + 14400000000"""))

  val all: Seq[DQ] = Seq(j9, j10)
}
