package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom keyed streaming state via `flatMapGroupsWithState` — the
  * arbitrary-state tool the windowed operators can't express: a per-key
  * state machine with event-time timeouts.
  *
  * The operator is cart-abandonment detection, the canonical funnel gap
  * the reference's composite `(customer_id, timestamp)` /
  * `(event_type, timestamp)` indexes exist to answer
  * (`03_create_indexes.sql:69-73`; event types `utils.py:262-295`): a
  * customer who adds to cart and neither purchases nor returns within
  * the gap produces one abandonment record, emitted by the state
  * timeout when the WATERMARK passes the deadline — so output needs no
  * polling, state is bounded by active-customer cardinality (one small
  * row per open cart, removed on purchase or timeout), and replays are
  * deterministic because the clock is event time, not wall time.
  */
object Stateful {

  final case class CartEvent(customer_id: String, event_type: String, ts: Timestamp)
  final case class CartState(nAdds: Int, lastAddMs: Long)
  final case class Abandonment(customer_id: String, n_adds: Int, last_add: Timestamp)

  /** Fold one microbatch's events for a key (in event-time order; a
    * purchase clears any pending adds that precede it) and arm/disarm
    * the timeout. Exposed for direct unit testing. */
  private[graft] def fold(events: Seq[CartEvent], prior: Option[CartState]): Option[CartState] =
    events.sortBy(_.ts.getTime).foldLeft(prior) { (s, e) =>
      e.event_type match {
        case "add_to_cart" =>
          val cur = s.getOrElse(CartState(0, 0L))
          Some(CartState(cur.nAdds + 1, math.max(cur.lastAddMs, e.ts.getTime)))
        case "purchase" => None
        case _          => s
      }
    }

  private def update(gapMs: Long)(
      key: String, rows: Iterator[CartEvent],
      state: GroupState[CartState]): Iterator[Abandonment] =
    if (state.hasTimedOut) {
      val s = state.get
      state.remove()
      Iterator.single(Abandonment(key, s.nAdds, new Timestamp(s.lastAddMs)))
    } else {
      fold(rows.toSeq, state.getOption) match {
        case Some(s) =>
          state.update(s)
          // The deadline can already be BEHIND the event-time watermark:
          // a non-purchase event for an open cart arriving in the same
          // microbatch where the watermark first crosses the cart's
          // deadline would make setTimeoutTimestamp throw (timeouts must
          // be > watermark), crashing the query and poison-replaying the
          // batch. Clamp to watermark + 1 so the timeout fires on the
          // next watermark advance instead.
          state.setTimeoutTimestamp(
            math.max(s.lastAddMs + gapMs, state.getCurrentWatermarkMs() + 1))
        case None =>
          if (state.exists) state.remove()
      }
      Iterator.empty
    }

  /** Abandonment stream from a watermarked [[CartEvent]] stream. The
    * caller sets the watermark (it is also the timeout clock):
    * `events.withWatermark("ts", delay)`. */
  def abandonedCarts(events: Dataset[CartEvent], gapMs: Long): Dataset[Abandonment] =
    events
      .groupByKey(_.customer_id)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(
        update(gapMs))(Encoders.product[CartState], Encoders.product[Abandonment])
}
