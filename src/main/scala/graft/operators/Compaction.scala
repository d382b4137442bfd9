package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Artifact COMPACTION — the maintenance half of the index family's
  * append contract. Every release appends new parquet files to the
  * persisted indexes ([[ReleaseFlow.release]] → four appends per
  * shard); append-≡-rebuild holds semantically at any append count,
  * but the PHYSICAL layout decays: after N releases each index is N
  * overlapping range-clustered file sets, so footer min/max spans
  * widen back toward the whole key domain and a key-ranged probe
  * stops skipping files (the selectivity the range clustering was
  * built for — see [[SubstringIndex.write]]'s layout argument). The
  * 100 TB story needs the maintenance op that restores the layout:
  * read → re-cluster → rewrite, each index by its own probe key.
  *
  * Contract (CompactionSpec pins it per artifact): compaction
  * preserves the ROW MULTISET exactly — no dedup, no filter — so
  * compact ≡ rebuild ≡ append-chain for every probe, trivially.
  * (Replayed appends' duplicate rows stay; they are screen-tolerated
  * by every consumer and belong to the append contract, not to
  * layout maintenance.)
  *
  * Concurrency: the swap (write staging → delete → rename) is NOT
  * atomic for concurrent readers — this is an OFFLINE maintenance op,
  * like any parquet compaction without a transactional table format.
  * A deployment running readers 24/7 would put the artifact under
  * such a format and express this same rewrite as its OPTIMIZE;
  * the clustering choice per index is the part that carries over.
  */
object Compaction {

  /** Read `dir`, re-cluster via `cluster`, write to a staging sibling,
    * swap. The staging write completes before the original is touched,
    * so a crash mid-compaction leaves either the original or a
    * complete staging copy — never a half-written artifact. */
  private[graft] def rewrite(spark: SparkSession, dir: String)(
      cluster: DataFrame => DataFrame): Unit =
    rewriteWith(spark, dir)((df, staging) =>
      cluster(df).write.mode("overwrite").parquet(staging))

  /** [[rewrite]] with a caller-supplied writer — for artifacts whose
    * layout is more than a cluster+sort (e.g. the IVF inverted lists'
    * `partitionBy(cid)` directory layout, which a plain parquet write
    * would flatten and so lose the path-level cell pruning probes rely
    * on). Same staged-swap crash-safety contract. */
  private[graft] def rewriteWith(spark: SparkSession, dir: String)(
      write: (DataFrame, String) => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(p), s"compact: no artifact at $dir")
    val staging = new org.apache.hadoop.fs.Path(dir + "_compacting")
    if (fs.exists(staging)) fs.delete(staging, true)
    write(spark.read.parquet(dir), staging.toString)
    fs.delete(p, true)
    if (!fs.rename(staging, p))
      sys.error(s"compact: rename $staging -> $p failed")
  }

  /** RETRACTION primitive — [[rewrite]] with a key anti-join: drop
    * every row of the artifact at `dir` whose `keyCol` (doc_id for the
    * document indexes, vec_id for the ANN ones) is in `ids`, restoring
    * the probe-keyed layout in the same pass. Because every
    * index row is a PURE per-doc function of a document (the append
    * contract's own premise), the anti-join equals a rebuild over the
    * complement corpus EXACTLY — retraction is the recall half of
    * append-≡-rebuild, and RetractSpec pins the multiset equality both
    * ways (vs the pristine pre-release artifact and vs a fresh
    * complement rebuild). `ids` is bounded by a release's admitted set
    * — shard-sized, never corpus-sized — hence the broadcast hint;
    * batch recalls should union their id lists first, since each call
    * prices as one compaction of the artifact. */
  private[graft] def retract(spark: SparkSession, dir: String,
      ids: DataFrame, keyCol: String = "doc_id")(
      cluster: DataFrame => DataFrame): Unit =
    retractWith(spark, dir, ids, keyCol)((df, staging) =>
      cluster(df).write.mode("overwrite").parquet(staging))

  /** [[retract]] with a caller-supplied writer ([[rewriteWith]]'s
    * variant, for directory-partitioned artifacts). */
  private[graft] def retractWith(spark: SparkSession, dir: String,
      ids: DataFrame, keyCol: String = "doc_id")(
      write: (DataFrame, String) => Unit): Unit =
    rewriteWith(spark, dir) { (df, staging) =>
      // a USING-column join reorders the key to the front — restore
      // the artifact's own column order so the rewritten schema is
      // stable
      val kept = df.join(
          org.apache.spark.sql.functions.broadcast(ids),
          Seq(keyCol), "left_anti")
        .select(df.columns.toIndexedSeq.map(
          org.apache.spark.sql.functions.col): _*)
      write(kept, staging)
    }

  /** Parquet file count of an artifact dir — the fragmentation gauge a
    * compaction schedule watches (CompactionSpec asserts it shrinks;
    * BENCH_NOTES prices the probe cost it buys back). */
  def fileCount(spark: SparkSession, dir: String): Long = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }
}
