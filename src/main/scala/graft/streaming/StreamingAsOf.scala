package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming as-of enrichment — the stream analog of the batch as-of
  * join (operators/TemporalJoinQueries.scala j9): attribute each
  * purchase to the user's latest at-or-before view as events arrive.
  *
  * Spark has no stream-stream as-of join; the idiomatic shape is keyed
  * state holding ONLY the current as-of value per key (here: one
  * (view_id, view_ts) pair per user), consulted and updated in
  * event-time order as each microbatch folds. This is O(users) state —
  * not O(events) like a windowed stream-stream join buffer — and the
  * event-time TTL evicts idle users, so state is bounded by ACTIVE-user
  * cardinality at any corpus scale (same bounding argument as
  * [[Stateful]]'s open-cart state).
  *
  * Agreement contract with batch j9 (pinned by StreamingAsOfSpec): for
  * in-watermark arrivals with time-ordered batches, the streamed
  * attributions equal the batch query row-for-row — the fold applies
  * the SAME total order (ts, view-before-purchase, event_id) inside a
  * batch that j9's window uses globally. A view arriving later than the
  * watermark allows may attribute later purchases only — the inherent
  * streaming relaxation, bounded by the caller's watermark delay.
  */
object StreamingAsOf {

  final case class FunnelEvent(
      user_id: Long, event_type: String, event_id: Long,
      ts_us: Long, ts: Timestamp)

  /** One pair per user: the argmax-(ts_us, event_id) view so far. */
  final case class ViewState(vid: Long, vt_us: Long)

  final case class Attribution(purchase_id: Long, view_id: Long, gap_sec: Long)

  /** Fold one microbatch's events for a user in event-time order —
    * views sort before purchases at equal timestamps (at-or-before
    * inclusive, exactly j9's (t, side, vid) order) — emitting one
    * attribution per purchase against the state AT that point in the
    * order. Exposed for direct unit testing. */
  private[graft] def foldEmit(
      events: Seq[FunnelEvent],
      prior: Option[ViewState]): (Seq[Attribution], Option[ViewState]) = {
    val ordered = events.sortBy(e =>
      (e.ts_us, if (e.event_type == "view") 0 else 1, e.event_id))
    val out = Seq.newBuilder[Attribution]
    val end = ordered.foldLeft(prior) { (s, e) =>
      e.event_type match {
        case "view" =>
          // keep the max (ts_us, event_id) view — late in-watermark
          // arrivals must not regress the as-of pointer
          if (s.forall(v => v.vt_us < e.ts_us ||
              (v.vt_us == e.ts_us && v.vid < e.event_id)))
            Some(ViewState(e.event_id, e.ts_us))
          else s
        case "purchase" =>
          out += Attribution(
            e.event_id,
            s.map(_.vid).getOrElse(-1L),
            s.map(v => (e.ts_us - v.vt_us) / 1000000L).getOrElse(-1L))
          s
        case _ => s
      }
    }
    (out.result(), end)
  }

  private def update(ttlMs: Long)(
      key: Long, rows: Iterator[FunnelEvent],
      state: GroupState[ViewState]): Iterator[Attribution] =
    if (state.hasTimedOut) {
      state.remove() // idle-user eviction; a later purchase re-sees -1
      Iterator.empty
    } else {
      val events = rows.toSeq
      val (out, end) = foldEmit(events, state.getOption)
      end match {
        case Some(s) => state.update(s)
        case None    => if (state.exists) state.remove()
      }
      if (state.exists) {
        val lastSeenMs = events.map(_.ts_us / 1000L).max
        // clamp like Stateful: the deadline may already be behind the
        // watermark when a batch straddles it
        state.setTimeoutTimestamp(
          math.max(lastSeenMs + ttlMs, state.getCurrentWatermarkMs() + 1))
      }
      out.iterator
    }

  /** Attribution stream from a watermarked [[FunnelEvent]] stream (the
    * caller sets the watermark — it is also the TTL clock):
    * `events.withWatermark("ts", delay)`. */
  def attributions(events: Dataset[FunnelEvent], ttlMs: Long): Dataset[Attribution] =
    events
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        update(ttlMs))(Encoders.product[ViewState], Encoders.product[Attribution])
}
