package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, input_file_name}

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
  * == Reader-atomic swap (version pointer) ==
  *
  * A whole-artifact rewrite never mutates the tree a reader may have
  * resolved. The artifact dir is a VERSION CONTAINER:
  * {{{
  *   <dir>/_CURRENT   one line, e.g. "v3" — the live version
  *   <dir>/v1 … vN    immutable data trees (a rewrite writes vN+1)
  *   <dir>/<files>    the legacy FLAT layout ("v0") — what the
  *                    initial write/append chain produced before the
  *                    first rewrite ever versioned the artifact
  * }}}
  * [[rewriteWith]] writes the re-clustered tree COMPLETELY beside the
  * live one, then atomically replaces `_CURRENT` (`java.nio`
  * ATOMIC_MOVE on a local filesystem; on HDFS the same contract is
  * `FileContext.rename(OVERWRITE)`, on an object store a
  * put-if-match manifest). Readers resolve the pointer ONCE at plan
  * time ([[resolve]] — every index module's `read`/`append` goes
  * through it) and then touch only that immutable tree, so a reader
  * concurrent with a compaction sees the old rows or the new rows,
  * never a PATH_NOT_FOUND (CompactionSpec pins a reader across the
  * swap). The pointer file is `_`-prefixed so Spark's file listing
  * ignores it even on a raw directory read. GC of superseded trees is
  * [[pruneVersions]] — called after each flip with `keep = 2` (live +
  * one generation for in-flight readers), explicit beyond that.
  * Single-WRITER contract unchanged: rewrites are a scheduled
  * maintenance job, not concurrent mutators; a deployment needing
  * concurrent writers is the transactional-table-format regime, where
  * this same scheme is the format's snapshot pointer.
  */
object Compaction {

  private val Pointer = "_CURRENT"

  private def fsOf(spark: SparkSession, p: Path): FileSystem =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The artifact's live version, or None for the legacy flat layout
    * (no rewrite has versioned it yet). */
  def currentVersion(spark: SparkSession, dir: String): Option[Int] = {
    val p = new Path(dir, Pointer)
    val fs = fsOf(spark, p)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim.stripPrefix("v").toInt)
      finally in.close()
    }
  }

  /** Resolve an artifact dir to its LIVE data tree — `<dir>/vN` when a
    * pointer exists, the dir itself (flat layout) otherwise. Every
    * reader and appender of a compactable artifact resolves through
    * here, ONCE per plan; the returned tree is immutable until
    * [[pruneVersions]] retires it. */
  def resolve(spark: SparkSession, dir: String): String =
    currentVersion(spark, dir).map(v => s"$dir/v$v").getOrElse(dir)

  /** Atomically replace the pointer. Local filesystems get a true
    * POSIX atomic rename; any other scheme goes through FileContext's
    * OVERWRITE rename (atomic on HDFS). */
  private def flipPointer(spark: SparkSession, dir: String, v: Int): Unit = {
    val d = new Path(dir)
    val fs = fsOf(spark, d)
    val bytes = s"v$v\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)
    if (fs.getScheme == "file") {
      val local = java.nio.file.Paths.get(new Path(dir).toUri.getPath)
      val tmp = local.resolve(s".$Pointer.tmp")
      java.nio.file.Files.write(tmp, bytes)
      java.nio.file.Files.move(tmp, local.resolve(Pointer),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      val tmp = new Path(d, s".$Pointer.tmp")
      val out = fs.create(tmp, true)
      try out.write(bytes) finally out.close()
      org.apache.hadoop.fs.FileContext.getFileContext(d.toUri,
          spark.sparkContext.hadoopConfiguration)
        .rename(tmp, new Path(d, Pointer),
          org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  /** Is `name` part of the version machinery rather than flat data? */
  private def isVersionEntry(name: String): Boolean =
    name == Pointer || name.startsWith(".") || name.matches("v\\d+")

  /** GC superseded version trees: keep the newest `keep` generations
    * (the flat legacy layout counts as generation 0), delete the rest.
    * The default `keep = 2` retains the live tree plus one for
    * in-flight readers that resolved just before the last flip; a
    * rewrite calls this automatically, so disk stays bounded at two
    * copies without an external scheduler. No-op on unversioned
    * artifacts. */
  def pruneVersions(spark: SparkSession, dir: String, keep: Int = 2): Unit = {
    val cur = currentVersion(spark, dir).getOrElse(return)
    val k = keep.max(1)
    val d = new Path(dir)
    val fs = fsOf(spark, d)
    fs.listStatus(d).map(_.getPath.getName)
      .collect { case s if s.matches("v\\d+") => s.drop(1).toInt }
      .filter(v => v != cur && v <= cur - k)
      .foreach(v => fs.delete(new Path(d, s"v$v"), true))
    if (cur >= k) // the flat layout is ≥ keep generations old
      fs.listStatus(d).filterNot(s => isVersionEntry(s.getPath.getName))
        .foreach(s => fs.delete(s.getPath, true))
  }

  /** Read the live tree, re-cluster via `cluster`, write the next
    * version beside it, flip the pointer. The new tree completes
    * before the pointer moves, so a crash mid-compaction leaves the
    * old version live and a partial staging tree the next attempt
    * clears — never a half-written live artifact. */
  private[graft] def rewrite(spark: SparkSession, dir: String)(
      cluster: DataFrame => DataFrame): Unit =
    rewriteWith(spark, dir)((df, staging) =>
      cluster(df).write.mode("overwrite").parquet(staging))

  /** [[rewrite]] with a caller-supplied writer — for artifacts whose
    * layout is more than a cluster+sort (e.g. the IVF inverted lists'
    * `partitionBy(cid)` directory layout, which a plain parquet write
    * would flatten and so lose the path-level cell pruning probes rely
    * on). Same versioned-swap crash-safety and reader-atomicity
    * contract. */
  private[graft] def rewriteWith(spark: SparkSession, dir: String)(
      write: (DataFrame, String) => Unit): Unit = {
    val d = new Path(dir)
    val fs = fsOf(spark, d)
    require(fs.exists(d), s"compact: no artifact at $dir")
    val cur = currentVersion(spark, dir)
    val src = cur.map(v => s"$dir/v$v").getOrElse(dir)
    val next = cur.getOrElse(0) + 1
    val staging = new Path(d, s"v$next")
    if (fs.exists(staging)) fs.delete(staging, true) // crashed prior attempt
    write(spark.read.parquet(src), staging.toString)
    flipPointer(spark, dir, next)
    pruneVersions(spark, dir)
  }

  /** RETRACTION primitive — drop every row of the artifact at `dir`
    * whose `keyCol` (doc_id for the document indexes, vec_id for the
    * ANN ones) is in `ids`. Because every index row is a PURE per-doc
    * function of a document (the append contract's own premise), the
    * anti-join equals a rebuild over the complement corpus EXACTLY —
    * retraction is the recall half of append-≡-rebuild, and
    * RetractSpec pins the multiset equality both ways (vs the pristine
    * pre-release artifact and vs a fresh complement rebuild).
    *
    * SCOPED by default (the IndexIVF `remove_ids` cost model): one
    * column-pruned scan of (`keyCol`, file) finds the files holding
    * retracted keys, and ONLY those are rewritten — a 10-doc takedown
    * against a doc-clustered or cid-partitioned artifact moves a
    * handful of files, and untouched files keep their bytes and
    * mtimes (AnnIndexSpec pins it). When the id set touches EVERY
    * file (gram-keyed artifacts scatter each doc everywhere — the
    * span index's normal case), the scoped path falls back to the
    * whole-artifact [[rewriteWith]] rewrite, which also restores the
    * probe-keyed clustering and swaps reader-atomically. `ids` is
    * bounded by a release's admitted set — shard-sized, never
    * corpus-sized — hence the broadcast; batch recalls should union
    * their id lists first. Caller pins `ids` ([[ReleaseFlow.retract]]'s
    * discipline) — it is evaluated more than once here. */
  private[graft] def retract(spark: SparkSession, dir: String,
      ids: DataFrame, keyCol: String = "doc_id")(
      cluster: DataFrame => DataFrame): Unit =
    retractWith(spark, dir, ids, keyCol)((df, staging) =>
      cluster(df).write.mode("overwrite").parquet(staging))

  /** [[retract]] with a caller-supplied writer ([[rewriteWith]]'s
    * variant, for directory-partitioned artifacts). The writer
    * receives either the touched-file slice (scoped path) or the whole
    * surviving artifact (full fallback) — identical obligations. */
  private[graft] def retractWith(spark: SparkSession, dir: String,
      ids: DataFrame, keyCol: String = "doc_id")(
      write: (DataFrame, String) => Unit): Unit = {
    val data = resolve(spark, dir)
    val ds = new Path(data)
    val fs = fsOf(spark, ds)
    require(fs.exists(ds), s"retract: no artifact at $dir")
    val df = spark.read.parquet(data)
    val touched = df.withColumn("_f", input_file_name())
      .join(broadcast(ids), Seq(keyCol), "left_semi")
      .select("_f").distinct().collect().map(_.getString(0))
    if (touched.isEmpty) return // unknown ids: a no-op, not a rewrite
    if (touched.length >= fileCount(spark, dir)) {
      // every file holds retracted keys — the scoped rewrite would be
      // a full rewrite anyway; take the whole-artifact path, which
      // also restores clustering and flips the version pointer
      retractFull(spark, dir, ids, keyCol, df.columns.toIndexedSeq)(write)
      return
    }
    // basePath keeps directory-partition columns (the IVF cid) in the
    // touched-slice schema, so the writer's partitionBy still sees them
    val kept = spark.read.option("basePath", data).parquet(touched.toIndexedSeq: _*)
      .join(broadcast(ids), Seq(keyCol), "left_anti")
      .select(df.columns.toIndexedSeq.map(col): _*)
    val staging = new Path(ds, "_retract_staging")
    if (fs.exists(staging)) fs.delete(staging, true)
    write(kept, staging.toString)
    // swap, scoped to the touched files: remove them, graft the
    // rewritten part-files into the same relative locations. Offline
    // window = the touched files only; the reader-atomic path for a
    // 24/7 deployment is the full rewrite above (or the table format's
    // delete vectors — see [[ReleaseFlow.retract]]'s design note).
    val touchedPaths = touched.map(new Path(_))
    touchedPaths.foreach(f => fs.delete(f, false))
    val qStaging = fs.makeQualified(staging)
    moveTree(fs, qStaging, qStaging, fs.makeQualified(ds))
    fs.delete(staging, true)
    // a fully-retracted partition directory (e.g. an emptied IVF cell)
    // gets nothing moved back in — drop the empty dir
    val qDs = fs.makeQualified(ds)
    touchedPaths.map(p => fs.makeQualified(p).getParent).distinct
      .filter(p => p != qDs && fs.exists(p) && fs.listStatus(p).isEmpty)
      .foreach(p => fs.delete(p, false))
  }

  /** The whole-artifact retraction: anti-join everything, rewrite as
    * one versioned swap ([[rewriteWith]]). */
  private def retractFull(spark: SparkSession, dir: String, ids: DataFrame,
      keyCol: String, columns: Seq[String])(
      write: (DataFrame, String) => Unit): Unit =
    rewriteWith(spark, dir) { (df, staging) =>
      // a USING-column join reorders the key to the front — restore
      // the artifact's own column order so the rewritten schema is
      // stable
      val kept = df.join(broadcast(ids), Seq(keyCol), "left_anti")
        .select(columns.map(col): _*)
      write(kept, staging)
    }

  /** Move every data file under `src` to the same relative path under
    * `dst` (rename, not copy — same filesystem). Part-file names carry
    * task UUIDs, so grafting beside existing files cannot collide. */
  private def moveTree(fs: FileSystem, root: Path, src: Path, dst: Path): Unit =
    fs.listStatus(src).foreach { s =>
      val name = s.getPath.getName
      if (s.isDirectory) {
        if (name != "_temporary") moveTree(fs, root, s.getPath, dst)
      } else if (name.endsWith(".parquet")) {
        val rel = s.getPath.toString.stripPrefix(root.toString).stripPrefix("/")
        val target = new Path(dst, rel)
        fs.mkdirs(target.getParent)
        if (!fs.rename(s.getPath, target))
          sys.error(s"retract: rename ${s.getPath} -> $target failed")
      }
    }

  /** Parquet file count of the artifact's LIVE tree — the
    * fragmentation gauge a compaction schedule watches (CompactionSpec
    * asserts it shrinks; BENCH_NOTES prices the probe cost it buys
    * back). Superseded version trees are not counted. */
  def fileCount(spark: SparkSession, dir: String): Long = {
    val p = new Path(resolve(spark, dir))
    val fs = fsOf(spark, p)
    val it = fs.listFiles(p, true)
    var n = 0L
    while (it.hasNext) {
      val f = it.next()
      if (f.getPath.getName.endsWith(".parquet")) n += 1
    }
    n
  }
}
