package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.LlmQueries

/** Composed streaming ADMISSION pipeline — the ingest-side counterpart
  * of batch l29: every admission gate a training-data ingest runs at
  * the door, in one entry point, emitting a per-document DECISION
  * (`admit` / `near_duplicate` / `contaminated` / `low_quality`)
  * instead of four separate flag streams a caller must reconcile. The
  * reference's analog is its consumer → validator → dual-sink shape
  * (every message lands with a verdict); this is that shape for the
  * document corpus, with the LLM-pipeline gates as the validators.
  *
  * Architecture — where each kind of state lives:
  *
  *  - CROSS-BATCH semantics (exact-copy suppression within the
  *    retry/replay horizon) stay in the STREAM operator:
  *    [[StreamingDedup.withinWatermark]] is the only stateful stage,
  *    keyed on the 32-byte content hash. A duplicate payload never
  *    reaches the decision join at all — the same contract as L17, with
  *    batch L1 the historical backstop after state eviction.
  *  - The PER-DOC decision composes INSIDE `foreachBatch`, where the
  *    microbatch is a plain DataFrame: the near-dup and contamination
  *    screens are the gates' own STATELESS halves
  *    ([[StreamingNearDup.screenRaw]] / [[StreamingDecontam.screenRaw]]
  *    — identical joins, identical thresholds, so the composed decision
  *    cannot drift from the standalone gates), and the quality arm is
  *    the shared [[LlmQueries.qualityKeep]] rule (l6/l19/l29's gate).
  *    Each screen yields a bounded distinct-id frame joined back LEFT,
  *    so a doc flagged by several gates gets ONE reason by the same
  *    precedence as l19/l29: duplicate-family dominates quality.
  *
  * Scale shape: both screens are index equi-joins (eval-set-sized gram
  * index; banded corpus index), the reason join keys on doc_id within
  * the microbatch, and nothing aggregates stream-wide — per-batch cost
  * is O(batch × index-hit-rate), independent of corpus size.
  */
object AdmissionPipeline {

  /** Gate inputs: the persisted corpus band index (L18) and holdout
    * gram index (L30). */
  final case class Gates(neardup: StreamingNearDup.Index,
      holdoutGrams: DataFrame)

  /** The per-batch decision frame: `batch`'s columns plus `reason`.
    * Pure function of (batch, gates) — spec-tested directly and reused
    * by [[start]]'s foreachBatch. Precedence: near_duplicate >
    * contaminated > low_quality > admit (duplicate-family first,
    * mirroring l19/l29 so quality counts describe admissible docs). */
  def decide(batch: DataFrame, gates: Gates): DataFrame = {
    val near = StreamingNearDup.screenRaw(batch, gates.neardup, keep = Nil)
      .select("doc_id").distinct().withColumn("_nd", lit(true))
    val contam = StreamingDecontam.screenRaw(batch, gates.holdoutGrams)
      .select("doc_id").distinct().withColumn("_ct", lit(true))
    LlmQueries.withStopBp(batch)
      .join(near, Seq("doc_id"), "left")
      .join(contam, Seq("doc_id"), "left")
      .withColumn("reason",
        when(col("_nd"), "near_duplicate")
          .when(col("_ct"), "contaminated")
          // admit only on a POSITIVE quality verdict: a null text (a
          // malformed/permissive-parsed record) nulls the predicate,
          // and three-valued logic must land it in low_quality, not
          // fall through every gate into the curated corpus
          .when(LlmQueries.qualityKeep, "admit")
          .otherwise("low_quality"))
      .select(batch.columns.map(col) :+ col("reason"): _*)
  }

  /** Wire the full pipeline over a JSON document stream directory:
    * watermark-bounded exact dedup, then the per-batch decision, landed
    * to ONE parquet sink partitioned by (batch, reason) — "the admitted
    * corpus" is a partition-pruned read of `reason=admit` across batch
    * dirs, and every reject stays audit-readable with its reason (the
    * dual-sink contract in one table). The write keys on the BATCH ID
    * with dynamic partition overwrite, so a microbatch replayed after a
    * crash-between-commit-and-checkpoint overwrites its own partitions
    * instead of appending duplicate decision rows (the same
    * exactly-once discipline as [[IngestPipeline]]'s sinks, via
    * partition idempotence rather than an offset high-water mark).
    * `n_chars` is measured here if absent so the quality arm always
    * has its input. */
  def start(spark: SparkSession, stream: DataFrame, gates: Gates,
      outDir: String, tsCol: String, delay: String): StreamingQuery = {
    val deduped = StreamingDedup.withinWatermark(
      withNChars(stream), tsCol, delay)
    deduped.writeStream
      .option("checkpointLocation", s"$outDir/_checkpoint")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        decide(batch, gates)
          .withColumn("_batch_id", lit(batchId))
          .write.mode("overwrite")
          .option("partitionOverwriteMode", "dynamic")
          .partitionBy("_batch_id", "reason")
          .parquet(s"$outDir/decisions")
      }
      .start()
  }

  private def withNChars(df: DataFrame): DataFrame =
    if (df.columns.contains("n_chars")) df
    else df.withColumn("n_chars", length(col("text")).cast("long"))
}
