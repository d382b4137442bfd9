package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming KPI transforms (SURVEY.md §2.9) — pure
  * `DataFrame => DataFrame` so they compose onto either the batch or the
  * streaming (readStream) form of an entity frame.
  *
  * T1 — event time is the payload timestamp (`schemas.py:21-22,102`);
  * processing time is stamped at consumption (`consumed_at NOW()`,
  * `02_create_tables.sql:15`). T2 — tumbling windows (orders per
  * minute, `README.md:15`). T3 — the watermark bounds state and drops
  * late rows (retention analog of `docker-compose.yaml:28`). T6 —
  * running counters (`producer.py:41-51`) as an update-mode streaming
  * aggregation backed by the state store.
  */
object WindowedKpis {

  /** T1: processing-time stamp alongside the event-time column. */
  def withProcessingTime(df: DataFrame): DataFrame =
    df.withColumn("consumed_at", current_timestamp())

  /** T2+T3: tumbling per-period counters over event time with a
    * watermark. On a stream use `outputMode("append")` — windows seal
    * once the watermark passes; late rows beyond it are dropped into the
    * A4 quality metrics rather than corrupting sealed windows. */
  def tumblingKpi(df: DataFrame, eventTimeCol: String, window_ : String,
      watermark: String, valueCol: Column): DataFrame =
    df.withWatermark(eventTimeCol, watermark)
      .groupBy(window(col(eventTimeCol), window_).as("w"))
      .agg(count(lit(1)).as("n"), sum(valueCol).as("total"))
      .select(col("w.start").as("window_start"), col("w.end").as("window_end"),
        col("n"), col("total"))

  /** T6: running per-key counters (update mode; state store holds one
    * row per key — bounded by key cardinality, not stream length). */
  def runningCounters(df: DataFrame, keyCol: String): DataFrame =
    df.groupBy(col(keyCol)).agg(count(lit(1)).as("n_messages"))

  /** Gap sessionization, streaming form of the batch W5 query: native
    * `session_window` keeps per-user open-session state bounded by the
    * watermark. */
  def sessions(df: DataFrame, eventTimeCol: String, userCol: String,
      gap: String, watermark: String): DataFrame =
    df.withWatermark(eventTimeCol, watermark)
      .groupBy(session_window(col(eventTimeCol), gap).as("s"), col(userCol))
      .agg(count(lit(1)).as("n_events"))
      .select(col(userCol), col("s.start").as("session_start"),
        col("s.end").as("session_end"), col("n_events"))
}
