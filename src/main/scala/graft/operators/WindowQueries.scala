package graft.operators

import graft.{DQ, Det, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function catalog — SURVEY.md §2.5. The reference declares this
  * surface through its funnel-analysis composite indexes
  * (`03_create_indexes.sql:69-73`) and dashboard KPIs (`README.md:15`).
  *
  * All event-time arithmetic uses `ts_us` (bigint microseconds, see
  * Tables.events) so window results are integer-exact across engines.
  * Window ordering always carries `event_id` as tiebreak: (user_id, ts)
  * collisions would otherwise make row_number/lag nondeterministic.
  *
  * Scale: each window spec partitions by `user_id` — one shuffle by user,
  * then all five analyses are per-partition sorts. No global sort, no
  * driver collect; skewed users are bounded by the per-user event count.
  */
object WindowQueries {

  private def ev(s: SparkSession, d: String) = Tables.events(s, d)

  private val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")

  /** W1 — funnel step sequence: row_number per user ordered by event time. */
  val w1 = DQ(
    "w1_event_order",
    (s, d) =>
      ev(s, d)
        .withColumn("rn", row_number().over(byUser))
        .agg(
          sum(when(col("rn") === 1, 1L).otherwise(0L)).as("n_users"),
          max(col("rn")).cast("long").as("max_events_per_user")),
    Some("""SELECT CAST(SUM(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_users,
            CAST(MAX(rn) AS BIGINT) AS max_events_per_user
            FROM (SELECT ROW_NUMBER() OVER
                    (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS rn
                  FROM events)"""))

  /** W2 — time between consecutive events per user (lag). */
  val w2 = DQ(
    "w2_event_gaps",
    (s, d) =>
      ev(s, d)
        .withColumn("gap_us", col("ts_us") - lag("ts_us", 1).over(byUser))
        .filter(col("gap_us").isNotNull)
        .agg(
          sum(col("gap_us")).as("total_gap_us"),
          count(lit(1)).as("n_gaps"))
        .withColumn(
          "avg_gap_sec_x100",
          round(col("total_gap_us") / col("n_gaps") / lit(1000000.0) * lit(100.0)).cast("long")),
    Some("""SELECT CAST(SUM(gap_us) AS BIGINT) AS total_gap_us,
            CAST(COUNT(*) AS BIGINT) AS n_gaps,
            CAST(ROUND(CAST(SUM(gap_us) AS BIGINT) / CAST(COUNT(*) AS BIGINT)
                 / 1000000.0 * 100.0) AS BIGINT) AS avg_gap_sec_x100
            FROM (SELECT epoch_us(ts) - LAG(epoch_us(ts)) OVER
                    (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
                  FROM events)
            WHERE gap_us IS NOT NULL"""))

  /** W3 — ranking within group (top products per brand, `README.md:15`). */
  val w3 = DQ(
    "w3_rank_in_group",
    (s, d) => {
      val w = Window.partitionBy("p_brand").orderBy(col("p_retailprice").desc, col("p_partkey"))
      Tables.part(s, d)
        .withColumn("rnk", rank().over(w).cast("long"))
        .filter(col("rnk") <= 3)
        .select(col("p_brand"), col("rnk"), col("p_partkey"),
          Det.cents(col("p_retailprice")).as("retail_cents"))
        .orderBy("p_brand", "rnk", "p_partkey")
    },
    Some("""SELECT p_brand, CAST(rnk AS BIGINT) AS rnk, p_partkey,
            CAST(ROUND(p_retailprice*100) AS BIGINT) AS retail_cents
            FROM (SELECT *, RANK() OVER
                    (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey) AS rnk
                  FROM part)
            WHERE rnk <= 3 ORDER BY p_brand, rnk, p_partkey"""))

  /** W4 — rolling frame aggregate: 7-day revenue trend
    * (`README.md:15`; time indexes `03:31-37`). Range frame over integer
    * day numbers so the frame bounds are engine-portable.
    *
    * Scale shape: the input is already the per-day pre-aggregate
    * (bounded by calendar days), but a global `Window.orderBy` would
    * still plan a single-partition WindowExec. Instead the window is
    * PARTITIONED BY MONTH with boundary replication — each month's
    * partition additionally receives the previous month's last 6 days as
    * carry-in frame content (marked and dropped after the frame sum), so
    * every 7-day frame is complete inside its partition. This is the
    * standard distributed form of an unbounded rolling window: N
    * independent month partitions + O(6) replicated rows each, instead
    * of one partition holding the whole series. */
  val w4 = DQ(
    "w4_rolling_revenue",
    (s, d) => {
      val daily = Tables.orders(s, d)
        .groupBy(to_date(col("o_orderdate")).as("day"))
        .agg(sum(Det.cents(col("o_totalprice"))).as("daily_cents"))
        .withColumn("day_num", datediff(col("day"), lit("1970-01-01")))
      val own = daily
        .withColumn("m", trunc(col("day"), "month"))
        .withColumn("carry", lit(false))
      // A row also feeds the NEXT month's partition when it lies within
      // 6 days of that month's start (frames of the next month's first
      // days reach back into it).
      val carry = daily
        .withColumn("m", add_months(trunc(col("day"), "month"), 1))
        .filter(datediff(col("m"), col("day")) <= 6)
        .withColumn("carry", lit(true))
      val w = Window.partitionBy("m").orderBy("day_num").rangeBetween(-6, 0)
      own.unionByName(carry)
        .withColumn("rolling_7d_cents", sum("daily_cents").over(w))
        .filter(!col("carry"))
        .select("day", "daily_cents", "rolling_7d_cents")
        .orderBy("day")
    },
    Some("""SELECT day, daily_cents,
            CAST(SUM(daily_cents) OVER (ORDER BY day_num
              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS rolling_7d_cents
            FROM (SELECT CAST(o_orderdate AS DATE) AS day,
                    CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS daily_cents,
                    date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day_num
                  FROM orders GROUP BY 1, 3)
            ORDER BY day"""))

  /** W5 — gap-based sessionization (30-minute inactivity window), the
    * batch analog of `session_window` (streaming variant lives in
    * graft.streaming). */
  val w5 = DQ(
    "w5_sessionize",
    (s, d) => {
      val gapUs = 30L * 60 * 1000000
      val newSession = when(
        lag("ts_us", 1).over(byUser).isNull ||
          col("ts_us") - lag("ts_us", 1).over(byUser) > gapUs, 1L).otherwise(0L)
      ev(s, d)
        .withColumn("new_s", newSession)
        .withColumn("session_id",
          sum("new_s").over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_ev"))
        .agg(
          count(lit(1)).as("n_sessions"),
          sum(col("n_ev")).as("n_events"))
        .withColumn("events_per_session_x100",
          round(col("n_events") / col("n_sessions") * lit(100.0)).cast("long"))
    },
    Some("""SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
            CAST(SUM(n_ev) AS BIGINT) AS n_events,
            CAST(ROUND(CAST(SUM(n_ev) AS BIGINT) / CAST(COUNT(*) AS BIGINT) * 100.0) AS BIGINT)
              AS events_per_session_x100
            FROM (
              SELECT user_id, session_id, CAST(COUNT(*) AS BIGINT) AS n_ev
              FROM (
                SELECT user_id,
                  SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
                FROM (
                  SELECT user_id, epoch_us(ts) AS ts_us, event_id,
                    CASE WHEN LAG(epoch_us(ts)) OVER
                          (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) IS NULL
                         OR epoch_us(ts) - LAG(epoch_us(ts)) OVER
                          (PARTITION BY user_id ORDER BY epoch_us(ts), event_id) > 1800000000
                      THEN 1 ELSE 0 END AS new_s
                  FROM events))
              GROUP BY user_id, session_id)"""))

  val all: Seq[DQ] = Seq(w1, w2, w3, w4, w5)
}
