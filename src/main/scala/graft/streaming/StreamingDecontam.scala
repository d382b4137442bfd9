package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.SamplingQueries

/** Streaming decontamination screen — incoming TRAINING documents
  * checked against the holdout/eval corpus' 5-gram index BEFORE
  * admission, the ingest-side counterpart of batch L25 (exact-copy
  * screening is [[StreamingDedup]], re-crawl screening
  * [[StreamingNearDup]]; this closes the third admission gate a
  * training-data pipeline runs at the door: eval leakage). Screening
  * at ingest beats screening at mix time when the holdout is fixed and
  * the corpus streams in daily — a contaminated doc never lands in the
  * curated store at all, and the mix-time batch pass (l25) becomes the
  * audit rather than the firewall.
  *
  * Spark-first decomposition:
  *
  *  - The HOLDOUT index is one frame: the distinct xxhash64'd word
  *    5-grams of the eval corpus, built in batch by the SAME shared
  *    gram stage as l25 ([[SamplingQueries.docGrams]] — identical
  *    tokenization, identical distinct-per-doc rule by construction).
  *    The holdout is eval-set-sized (not corpus-sized), so the index is
  *    the small side of everything downstream; at 100 TB it persists as
  *    parquet sorted by gram and is rebuilt only when the holdout
  *    changes. Hashed keys are load-bearing here, not an option: the
  *    index rows and the stream-side join keys are 8 bytes each instead
  *    of ~40-byte gram strings (the same one-sided birthday-bounded
  *    collision analysis as [[SamplingQueries.decontaminate]] — a
  *    collision can only ADD a false flag, never admit a leak).
  *  - The STREAM side is stateless per row until the final dedup: each
  *    incoming doc explodes to its distinct hashed 5-grams map-side,
  *    then ONE stream-static LEFT SEMI join against the index keeps
  *    exactly the grams that would leak. No stream-side aggregation, no
  *    all-pairs step.
  *  - A doc overlapping the holdout in several grams emits several
  *    rows; the only stateful operator is `dropDuplicatesWithinWatermark`
  *    on the doc id — watermark-bounded state, same contract as
  *    [[StreamingDedup.withinWatermark]].
  *
  * Output: one row (doc_id, `tsCol`) per CONTAMINATED incoming doc; a
  * doc with no holdout overlap produces no row (it is admissible).
  * Docs under 5 tokens carry no 5-gram and are admissible by
  * construction, exactly as batch l25 skips them. Admission policy is
  * the caller's sink decision — typically `foreachBatch` anti-joining
  * the microbatch against the flagged ids before landing.
  */
object StreamingDecontam {

  /** Distinct hashed 5-grams of the holdout corpus (`text` column) —
    * one 8-byte gram key per row. */
  def buildIndex(holdout: DataFrame): DataFrame =
    SamplingQueries.docGrams(holdout, Nil, hashed = true)
      .select("gram").distinct()

  /** Persist the index sorted by gram so the stream-side equi-join
    * scans clustered row groups (min/max skipping per microbatch). */
  def writeIndex(index: DataFrame, base: String): Unit =
    index.sortWithinPartitions("gram")
      .write.mode("overwrite").parquet(s"$base/holdout_grams")

  /** Manifest-aware ([[graft.operators.Compaction.readLive]], like
    * every other gate index read): identical plan on the self-contained
    * tree [[writeIndex]] lands, and a holdout tree that has since been
    * Compaction-retracted (an eval item recalled) resolves to its live
    * file set instead of silently re-including superseded grams —
    * GateReadLiveSpec sweeps this across the gate family. */
  def readIndex(spark: SparkSession, base: String): DataFrame =
    graft.operators.Compaction.readLive(spark, s"$base/holdout_grams")

  /** Screen a streaming document frame (doc_id, text, `tsCol`) against
    * the holdout gram index. Emits (doc_id, `tsCol`) once per
    * contaminated doc. */
  def screen(stream: DataFrame, index: DataFrame, tsCol: String,
      delay: String): DataFrame =
    screenRaw(stream, index, Seq(tsCol))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("doc_id")

  /** The STATELESS part of [[screen]] (gram explode + semi-join, no
    * watermark) — runs on a batch frame as well as a stream; the
    * per-microbatch admission decision composes it inside
    * `foreachBatch`. A doc overlapping in several grams emits several
    * rows. */
  def screenRaw(df: DataFrame, index: DataFrame,
      keep: Seq[String] = Nil): DataFrame =
    SamplingQueries.docGrams(df, Seq("doc_id") ++ keep, hashed = true)
      .join(index, Seq("gram"), "left_semi") // stream-static semi join
      .select("doc_id", keep: _*)
}
