package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-provenance sidecar for the REBUILD-class artifacts — the
  * trained state whose statistics are GLOBAL functions of the corpus
  * ([[DsirIndex]]'s llr table, [[BpeIndex]]'s merge list), so a
  * takedown cannot be expressed as row removal the way the index
  * family's retracts are (anti-join ≡ rebuild holds only for pure
  * per-doc rows). The honest lifecycle is: retraction RECALLS the
  * indexes, and the rebuild-class artifacts are REBUILT from the
  * retracted corpus — but until round 15 that boundary lived only in
  * docs, and a caller scoring against a stale model had no way to
  * detect it. This sidecar makes staleness DETECTABLE:
  *
  *  - [[stamp]] at train time records an order-independent fingerprint
  *    of the training corpus's doc-id set (count, xor of ids, xor of
  *    two independently-keyed id hashes) beside the artifact and
  *    clears any retraction markers;
  *  - [[markRetraction]] (called by [[ReleaseFlow.retractAll]]) appends
  *    the retracted id-set's fingerprint — a cheap, monotone "the
  *    corpus moved under this model" flag;
  *  - [[isStale]] answers the weak question a scoring run asks before
  *    trusting the artifact: unstamped, or any retraction since the
  *    stamp → stale;
  *  - [[isStaleFor]] answers the strong one when the caller holds the
  *    corpus snapshot being scored: fingerprint mismatch → stale (this
  *    also catches appends, which [[isStale]] deliberately does not —
  *    append-grown corpora are the drift criterion's domain, e.g.
  *    [[AnnIndexes.ivfDrift]]).
  *
  * Scale shape: the fingerprint is one count/sum/sum aggregate over an
  * id projection — partial-aggregable, no shuffle wider than one row.
  * The sidecar is 1 row per train + 1 per retraction.
  */
object TrainMeta {

  private def metaDir(base: String) = s"$base/train_meta"
  private def retrDir(base: String) = s"$base/retractions_since_train"

  /** (n_docs, id_xor, id_hash_xor, id_hash2_xor) of an id-bearing
    * frame — the order-independent corpus fingerprint. XOR folds, not
    * sums: overflow-free under ANSI arithmetic at any corpus size, and
    * id sets here are distinct by construction (the pair-cancellation
    * caveat of xor folds needs duplicate rows to bite). Collision
    * model: two distinct equal-count id sets collide only if their
    * xors agree simultaneously under the identity map AND two
    * independently-keyed xxhash64 folds — for structured id sets
    * (where raw-id xors do collide, e.g. {a, b, a⊕b⊕c, c} vs a
    * permutation) the two keyed folds behave as independent ~2⁻⁶⁴
    * events, which is the same regime as any content-hash equality
    * check in the engine. The second fold is what makes a structured
    * raw-xor collision insufficient on its own. */
  private def fingerprint(ids: DataFrame, idCol: String): DataFrame =
    ids.select(col(idCol)).distinct().agg(
      count(lit(1)).as("n_docs"),
      coalesce(expr(s"bit_xor($idCol)"), lit(0L)).as("id_xor"),
      coalesce(expr(s"bit_xor(xxhash64($idCol))"), lit(0L)).as("id_hash_xor"),
      coalesce(expr(s"bit_xor(xxhash64('graft:tm2', $idCol))"), lit(0L))
        .as("id_hash2_xor"))

  /** Record the training corpus at train time (call right after the
    * artifact's own `write`): one fingerprint row, and any prior
    * retraction markers are cleared — a fresh train by definition
    * incorporates the post-retraction corpus. */
  def stamp(corpus: DataFrame, base: String, idCol: String = "doc_id"): Unit = {
    val spark = corpus.sparkSession
    fingerprint(corpus.select(idCol), idCol)
      .coalesce(1).write.mode("overwrite").parquet(metaDir(base))
    val p = new org.apache.hadoop.fs.Path(retrDir(base))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) fs.delete(p, true)
  }

  /** Append a retraction marker: the retracted id-set's fingerprint.
    * Idempotent in effect (any non-empty log means stale); markers
    * accumulate until the next [[stamp]] clears them. */
  def markRetraction(ids: DataFrame, base: String,
      idCol: String = "doc_id"): Unit =
    fingerprint(ids.select(idCol), idCol)
      .coalesce(1).write.mode("append").parquet(retrDir(base))

  /** Weak staleness: never stamped, or retractions logged since the
    * stamp. The check a scoring run makes with no corpus in hand. */
  def isStale(spark: SparkSession, base: String): Boolean = {
    val conf = spark.sparkContext.hadoopConfiguration
    def exists(d: String) = {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(conf).exists(p)
    }
    if (!exists(metaDir(base))) true
    else exists(retrDir(base)) &&
      !spark.read.parquet(retrDir(base)).isEmpty
  }

  /** Retraction markers logged since the last [[stamp]] (or against a
    * never-stamped artifact) — the explicit "the corpus moved under
    * this model" flag, WITHOUT treating an unstamped artifact as
    * stale: ad-hoc builds that never opted into provenance stamping
    * keep working, but a takedown's mark is never silently scorable
    * past.
    *
    * Memoized per (appId, base, marker-dir mtime, marker file count):
    * the un-memoized form pays a driver-side Spark job (`parquet.
    * isEmpty`) on EVERY scoring read, which a hot scoring loop calls
    * per artifact open. The FS metadata probe (one `getFileStatus` +
    * one `listStatus`) stays per-call, so any [[markRetraction]] —
    * which creates or appends into the marker dir, changing its mtime
    * and file count — invalidates the cached verdict and the next read
    * re-checks (TrainMetaSpec pins the stale flip surviving a warm
    * memo). Only the marker-dir CONTENT read is cached. */
  def hasRetractionsSinceTrain(spark: SparkSession, base: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(retrDir(base))
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return false
    val st = fs.getFileStatus(p)
    val key = s"${spark.sparkContext.applicationId}:$base:" +
      s"${st.getModificationTime}:${fs.listStatus(p).length}"
    retrMemo.computeIfAbsent(key,
      _ => !spark.read.parquet(retrDir(base)).isEmpty).booleanValue()
  }

  private val retrMemo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** The scoring-call-site gate ([[DsirIndex.read]] / [[BpeIndex.read]]
    * / [[VocabIndex.read]]): a retraction has marked this artifact
    * stale and the caller did not opt in — fail LOUDLY at the read,
    * where forgetting the rebuild actually happens, instead of leaving
    * [[isStale]] a caller obligation nothing enforces. */
  private[graft] def assertFresh(spark: SparkSession, base: String,
      allowStale: Boolean, what: String): Unit =
    if (!allowStale && hasRetractionsSinceTrain(spark, base))
      throw new IllegalStateException(
        s"$what at $base is STALE: retractions were logged since its " +
          "training stamp (ReleaseFlow.retractAll marked the corpus as " +
          "moved). Rebuild the artifact from the retracted corpus and " +
          "re-stamp it, or pass allowStale = true to score against the " +
          "stale model knowingly.")

  /** Strong staleness: the stamped fingerprint differs from `corpus`'s
    * — catches retraction AND append drift. */
  def isStaleFor(corpus: DataFrame, base: String,
      idCol: String = "doc_id"): Boolean = {
    val spark = corpus.sparkSession
    if (isStale(spark, base)) return true
    val want = fingerprint(corpus.select(idCol), idCol).head()
    val have = spark.read.parquet(metaDir(base)).head()
    // A stamp written under an OLDER sidecar layout (fewer fingerprint
    // columns — e.g. the pre-id_hash2_xor 3-column form) must yield a
    // staleness VERDICT, not a fieldIndex crash: a column the stored
    // row lacks counts as a mismatch, i.e. stale, and the caller's
    // rebuild re-stamps under the current layout (the migration path).
    val stored = have.schema.fieldNames.toSet
    Seq("n_docs", "id_xor", "id_hash_xor", "id_hash2_xor").exists(c =>
      !stored.contains(c) ||
        want.getAs[Long](want.fieldIndex(c)) != have.getAs[Long](have.fieldIndex(c)))
  }
}
