package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ingest-time content deduplication — the streaming form of L1's exact
  * dedup, for the "don't land the same document twice" guard a
  * training-data ingest needs when identical payloads arrive under
  * different offsets, topics, or producer retries (lineage-level replay
  * is already handled upstream by [[IngestPipeline]]'s offset
  * high-water mark; this layer dedups by CONTENT).
  *
  * Spark-first: both variants are the built-in streaming
  * `dropDuplicates*` operators over the canonical content hash
  * ([[graft.operators.LlmQueries.normHash]] — one shared definition, so
  * the batch and streaming layers can never disagree on what "same
  * document" means), not custom keyed state. The hash is computed
  * map-side; the state store keys on the 32-byte digest, never the
  * document body.
  *
  * Choosing a variant is a state-size decision, the same trade as any
  * 100 TB dedup:
  *
  *  - [[withinWatermark]] (`dropDuplicatesWithinWatermark`): state for
  *    a hash is evictable once the event-time watermark passes its
  *    last-seen timestamp plus the delay. Bounded state — the
  *    production setting, sized to the retry/replay horizon (duplicate
  *    arrivals minutes apart), NOT a forever guarantee: a copy arriving
  *    after eviction lands again, and the batch L1 pass over the landed
  *    corpus remains the historical backstop. The spec pins both sides
  *    of that contract.
  *  - [[unbounded]] (`dropDuplicates`): exact global dedup for the
  *    stream's lifetime, state grows with distinct corpus — only for
  *    bounded corpora or short-lived backfills.
  */
object StreamingDedup {

  // Namespaced so a caller's own `_h`-ish column can't be clobbered by
  // the withColumn + drop round-trip.
  private val H = "_graft_content_hash"

  private def hashed(docs: DataFrame): DataFrame =
    // a NULL text has no content to compare — it must pass through
    // un-deduped (dropDuplicates treats null keys as EQUAL, so a bare
    // null hash would silently swallow every malformed/page-dropped doc
    // after the first, each losing its decision row downstream). The
    // fallback key is per-doc unique and can never collide with a real
    // hash (sha2 emits hex only).
    docs.withColumn(H,
      coalesce(graft.operators.LlmQueries.normHash,
        concat(lit("_null_text:"), col("doc_id").cast("string"))))

  /** Watermark-bounded exact dedup on text content. `docs` must be
    * a streaming frame with event-time column `tsCol`; emits the first
    * arrival of each content hash, drops copies whose hash is still in
    * state, and bounds state by `delay`. */
  def withinWatermark(docs: DataFrame, tsCol: String, delay: String): DataFrame =
    hashed(docs)
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark(H)
      .drop(H)

  /** Unbounded exact dedup — state holds every distinct content hash
    * seen since the query started. */
  def unbounded(docs: DataFrame): DataFrame =
    hashed(docs).dropDuplicates(H).drop(H)
}
