package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.SamplingQueries

/** Streaming verbatim-repeat screen — incoming documents checked for
  * any [[SamplingQueries.SpanK]]-token span already present VERBATIM in
  * the admitted corpus: the ingest-side counterpart of batch L33
  * (ExactSubstr), closing the dedup-gate ladder at its finest
  * granularity. The admission family now mirrors the batch family
  * one-for-one: L17↔l1 (exact copy), L18↔l9 (near-dup), this↔l33
  * (verbatim span), L30↔l25 (eval leakage), repetitive↔l27.
  *
  * Same Spark-first decomposition as [[StreamingDecontam]] — the two
  * screens are deliberately the same machinery at different widths and
  * index provenance:
  *
  *  - the INDEX is the distinct hashed 15-grams of the admitted corpus
  *    ([[SamplingQueries.docGramsK]] — identical tokenization to l33's
  *    positional grams by construction), 8-byte xxhash64 keys;
  *  - the STREAM side explodes each incoming doc to its distinct
  *    hashed 15-grams map-side and LEFT SEMI joins the index; one
  *    overlap row per shared gram, deduped by the caller or
  *    [[screen]]'s watermark-bounded state.
  *
  * SCALE CAVEAT, by design: unlike L30's eval-set-sized index, this
  * index is CORPUS-sized (≈ one 8-byte row per corpus token). At 100 TB
  * the gate screens against a bounded recency window (the last N days
  * of admitted docs — re-crawl loops and syndication repeats are
  * temporally local), with batch l33 as the full-corpus audit — the
  * same firewall/audit split as the other gates' staleness contracts.
  * Docs under 15 tokens carry no span gram and are admissible by
  * construction (they are also below l31's length bar).
  */
object StreamingSubstring {

  /** Distinct hashed SpanK-grams of the admitted corpus (`text`). */
  def buildIndex(corpus: DataFrame): DataFrame =
    SamplingQueries.docGramsK(corpus, Nil, SamplingQueries.SpanK, hashed = true)
      .select("gram").distinct()

  /** Persist sorted by gram for min/max row-group skipping. */
  def writeIndex(index: DataFrame, base: String): Unit =
    index.sortWithinPartitions("gram")
      .write.mode("overwrite").parquet(s"$base/corpus_spans")

  def readIndex(spark: SparkSession, base: String): DataFrame =
    spark.read.parquet(s"$base/corpus_spans")

  /** Screen a streaming document frame (doc_id, text, `tsCol`): emits
    * (doc_id, `tsCol`) once per verbatim-repeating doc. */
  def screen(stream: DataFrame, index: DataFrame, tsCol: String,
      delay: String): DataFrame =
    screenRaw(stream, index, Seq(tsCol))
      .withWatermark(tsCol, delay)
      .dropDuplicatesWithinWatermark("doc_id")

  /** The stateless half (gram explode + semi-join) — batch-callable;
    * the composed admission decision uses it inside `foreachBatch`.
    * A doc sharing several spans emits several rows. */
  def screenRaw(df: DataFrame, index: DataFrame,
      keep: Seq[String] = Nil): DataFrame =
    SamplingQueries.docGramsK(df, Seq("doc_id") ++ keep,
        SamplingQueries.SpanK, hashed = true)
      .join(index, Seq("gram"), "left_semi")
      .select("doc_id", keep: _*)
}
