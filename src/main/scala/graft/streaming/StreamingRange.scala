package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming range join — the stream form of the batch bucketed band
  * join (operators/TemporalJoinQueries.scala j10): (view, purchase)
  * pairs of the same user with the purchase inside the attribution
  * window after the view.
  *
  * Where the as-of join needed custom keyed state ([[StreamingAsOf]] —
  * Spark has no stream-stream as-of), the range join is exactly what
  * Spark's built-in stream-stream inner join with a time-range
  * condition implements, so this operator is a thin declaration over
  * it: both sides watermarked, equi-key on user, range condition on
  * event time. The engine derives the state-retention bound FROM the
  * range condition (a view is dropped from state once the watermark
  * passes view_ts + window + delay; a purchase buffers only within its
  * own delay) — the same bounded-state argument the batch form gets
  * from bucket width, here enforced by watermarks.
  *
  * State is O(events inside the watermark horizon), not O(stream): at
  * 100 TB/day the horizon (window + lateness) is what sizes the state
  * store, and both are caller-set.
  */
object StreamingRange {

  /** Attribution pairs from watermarked view/purchase streams. Both
    * inputs carry (user_id, event_id, ts, ts_us); `delay` is the
    * lateness bound for BOTH sides, `windowUs` the attribution window.
    * Emits one row per (view, purchase) pair. */
  def pairs(views: DataFrame, purchases: DataFrame,
      delay: String, windowUs: Long): DataFrame = {
    require(windowUs > 0, s"StreamingRange: windowUs must be positive, got $windowUs")
    // the coarse state bound is in whole seconds — round UP so it is
    // always at-or-looser than the exact microsecond predicate below
    // (integer division would TIGHTEN a fractional-second window and
    // silently drop pairs; a sub-second window would drop everything)
    val boundSec = (windowUs + 999999L) / 1000000L
    val v = views.select(
      col("user_id").as("vk"), col("event_id").as("vid"),
      col("ts").as("vts"), col("ts_us").as("vt"))
      .withWatermark("vts", delay)
    val p = purchases.select(
      col("user_id").as("pk"), col("event_id").as("pid"),
      col("ts").as("pts"), col("ts_us").as("pt"))
      .withWatermark("pts", delay)
    v.join(p,
      col("vk") === col("pk") &&
        col("pts") >= col("vts") &&
        col("pts") < col("vts") + expr(s"INTERVAL $boundSec SECONDS"))
      // the exact-microsecond predicate on the integer event times;
      // the timestamp-typed condition above is what bounds state
      .filter(col("pt") >= col("vt") && col("pt") < col("vt") + lit(windowUs))
      .select(col("vid"), col("pid"),
        expr("(pt - vt) div 1000000").as("lag_sec"))
  }
}
