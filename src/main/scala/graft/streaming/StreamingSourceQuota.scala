package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Ingest-time per-source admission quotas — the streaming form of
  * batch [[graft.operators.SamplingQueries.l40]]'s over-represented-
  * domain cap: a source (domain, feed, producer) may land at most `cap`
  * documents over the stream's lifetime; everything past the quota is
  * still EMITTED but labeled, so the caller keeps the full audit trail
  * (the same label-don't-drop contract as
  * [[AdmissionPipeline.decide]]).
  *
  * Shape: `flatMapGroupsWithState` keyed by source. The state is ONE
  * long per source — the admitted count — so state size is bounded by
  * source cardinality (domains, not documents; no timeout needed,
  * though a production deployment resetting quotas per window would
  * arm a processing-time timeout to clear counts). Within a microbatch
  * a source's rows are folded in (ts, doc_id) order, which makes the
  * admitted PREFIX deterministic under replay: a crashed-and-replayed
  * batch re-admits exactly the same documents, because neither arrival
  * order inside the batch nor wall clock participates in the decision.
  *
  * Contrast with batch l40, deliberately: the batch cap picks the
  * md5-draw-minimal survivors (a uniform sample of the source), while
  * the streaming gate necessarily admits FIRST-ARRIVED-FIRST — an
  * online algorithm cannot know the future draw order. The documented
  * deployment is therefore: the streaming quota bounds damage at
  * ingest (no source floods the corpus partition), and the batch l40
  * pass over the landed corpus re-caps uniformly — gate at ingest,
  * recap in batch, the same two-layer discipline as streaming dedup
  * vs batch L1. */
object StreamingSourceQuota {

  final case class QuotaDoc(doc_id: Long, source: String, ts: Timestamp)
  final case class QuotaState(admitted: Long)
  final case class QuotaDecision(doc_id: Long, source: String, ts: Timestamp,
      admitted: Boolean)

  /** Fold one microbatch's rows for a source over the prior admitted
    * count, in (ts, doc_id) order. Exposed for direct unit testing. */
  private[graft] def fold(cap: Long, prior: Long,
      rows: Seq[QuotaDoc]): (Long, Seq[QuotaDecision]) = {
    var n = prior
    val out = rows.sortBy(r => (r.ts.getTime, r.doc_id)).map { r =>
      val ok = n < cap
      if (ok) n += 1
      QuotaDecision(r.doc_id, r.source, r.ts, ok)
    }
    (n, out)
  }

  private def update(cap: Long)(key: String, rows: Iterator[QuotaDoc],
      state: GroupState[QuotaState]): Iterator[QuotaDecision] = {
    val (n, out) = fold(cap, state.getOption.map(_.admitted).getOrElse(0L),
      rows.toSeq)
    state.update(QuotaState(n))
    out.iterator
  }

  /** Label a streaming `(doc_id, source, ts, …)` frame with per-source
    * lifetime quotas: emits one row per input row with `admitted`
    * (extra columns are not carried — join the decision frame back on
    * doc_id if the payload is needed, keeping the STATE path narrow). */
  def label(docs: DataFrame, cap: Long): Dataset[QuotaDecision] = {
    implicit val de = Encoders.product[QuotaDoc]
    implicit val se = Encoders.product[QuotaState]
    implicit val oe = Encoders.product[QuotaDecision]
    docs.select(col("doc_id").cast("long"), col("source"), col("ts"))
      .as[QuotaDoc]
      .groupByKey(_.source)(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update(cap))
  }
}
