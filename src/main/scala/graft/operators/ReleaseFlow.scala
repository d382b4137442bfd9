package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.StreamingNearDup

/** One corpus RELEASE, end-to-end, over the persisted index artifacts —
  * the composition the whole index family exists for, as a callable
  * instead of a runbook. A release pipeline holds three standing
  * artifacts per corpus version (each with its own build/probe/append
  * split, all spec-pinned append ≡ rebuild):
  *
  *  - the exact-dedup hash set ([[DedupIndex]] — l1/l46's probe side),
  *  - the MinHash band index ([[StreamingNearDup]]'s persisted form —
  *    l9/L18/l49's probe side),
  *  - the substring span-gram index ([[SubstringIndex]] — l33's probe
  *    side and the streaming verbatim gate's source).
  *
  * [[release]] screens an incoming shard against all three owners'
  * dedup layers in the canonical order (exact content hash first — the
  * strongest claim — then the sketch), labels every row
  * (`corpus_duplicate` / `near_duplicate` / `admit` — the same reason
  * vocabulary as the streaming [[graft.streaming.AdmissionPipeline]],
  * so ingest-time and release-time decisions read identically), appends
  * ONLY the admitted slice to every artifact, and returns the labeled
  * frame for the release audit. Releasing the same shard twice admits
  * nothing the second time: the first release's admissions are in the
  * hash index, so every formerly-admitted row re-labels
  * `corpus_duplicate` — idempotence by the artifacts' own semantics,
  * not by bookkeeping.
  *
  * Scale shape: every screen is the component's own probe half (hash
  * semi-join / band equi-join) — only the SHARD tokenizes, sketches,
  * and hashes; the corpus-sized sides are projection scans of the
  * persisted files. The appends are the components' append paths
  * (pure per-row functions of a document — no trained state), so
  * append-then-probe ≡ full rebuild holds for the composition exactly
  * as it does per component (ReleaseFlowSpec re-pins it end-to-end).
  *
  * Shard ids must be disjoint from indexed ids (every index's standing
  * contract — the caller's id authority).
  */
object ReleaseFlow {

  def dedupDir(base: String): String   = s"$base/dedup"
  def neardupDir(base: String): String = s"$base/neardup"
  def substrDir(base: String): String  = s"$base/substr"

  /** Initialize the artifact set from the first corpus version.
    * `corpus` must carry (lang, doc_id, text). */
  def init(corpus: DataFrame, base: String): Unit = {
    DedupIndex.write(corpus, dedupDir(base))
    StreamingNearDup.writeIndex(StreamingNearDup.buildIndex(corpus),
      neardupDir(base))
    SubstringIndex.write(corpus, substrDir(base))
  }

  /** Screen `shard` (lang, doc_id, text) against the persisted
    * artifacts, append the admitted slice to each, return the labeled
    * decision frame. EAGER — the decision frame is checkpointed before
    * the appends so the screens provably see pre-append state. */
  def release(spark: SparkSession, shard0: DataFrame, base: String): DataFrame = {
    // a null-text row can neither be screened (null hash, no sketch)
    // nor indexed (every artifact's build drops it) — admitting it
    // would break the idempotence contract, since a re-release could
    // not recognize it. Malformed rows are the ingest validators' job
    // (V-rows / the admission pipeline's low_quality arm); the release
    // screen drops them up front.
    val shard = shard0.filter(col("text").isNotNull)
    val exactIdx = DedupIndex.read(spark, dedupDir(base))
    val ndIdx = StreamingNearDup.readIndex(spark, neardupDir(base))
    val exactHit = shard
      .withColumn("_h", DedupIndex.contentHash)
      .join(exactIdx.select(col("h").as("_h")).distinct()
        .withColumn("_xd", lit(true)), Seq("_h"), "left")
      .drop("_h")
    val ndFlagged = StreamingNearDup.screenRaw(shard, ndIdx, keep = Nil)
      .select("doc_id").distinct().withColumn("_nd", lit(true))
    val decided = exactHit
      .join(ndFlagged, Seq("doc_id"), "left")
      .withColumn("decision",
        when(col("_xd"), "corpus_duplicate")
          .when(col("_nd"), "near_duplicate")
          .otherwise("admit"))
      .drop("_xd", "_nd")
      .localCheckpoint() // pin decisions BEFORE the appends mutate state
    val admitted = decided.filter(col("decision") === "admit").drop("decision")
    DedupIndex.append(admitted, dedupDir(base))
    StreamingNearDup.appendIndex(admitted, neardupDir(base))
    SubstringIndex.append(admitted, substrDir(base))
    decided
  }

  /** The release audit rollup — decisions per (lang, decision) with an
    * identity checksum, the accounting row a release report carries. */
  def audit(decided: DataFrame): DataFrame =
    decided.groupBy("lang", "decision")
      .agg(count(lit(1)).as("n_docs"), sum("doc_id").as("doc_id_sum"))
      .orderBy("lang", "decision")
}
