package graft.operators

import graft.{Session, Tables}
import graft.streaming.StreamingNearDup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Compaction]]'s contract through a LIVE release chain: after N
  * appends, compaction (a) preserves every artifact's row multiset
  * exactly — so compact ≡ rebuild ≡ append-chain for every probe,
  * trivially — (b) reduces the parquet file count (the fragmentation
  * it exists to undo), and (c) leaves the NEXT release's decisions
  * byte-identical to an uncompacted twin's. */
class CompactionSpec extends AnyFunSuite {

  private lazy val spark = Session.get()
  private val sf = "/root/testdata/sf0.001"

  private def docsAll = Tables.documents(spark, sf)
    .filter(col("text").isNotNull)
    .select("lang", "doc_id", "text")

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def rowsOf(df: org.apache.spark.sql.DataFrame): Map[String, Int] =
    df.collect().map(_.toString).groupBy(identity).view.mapValues(_.length).toMap

  test("compact after a release chain: row multisets unchanged, file " +
      "counts shrink, and the next release decides identically to an " +
      "uncompacted twin") {
    val base = tmp("graft_compact")
    val twin = tmp("graft_compact_twin")
    val corpus = docsAll.filter(col("doc_id") % 3 === 0)
    ReleaseFlow.init(corpus, base)
    ReleaseFlow.init(corpus, twin)
    // a chain of releases fragments every artifact (each appends its
    // own file set); three disjoint NON-corpus slices (corpus holds
    // %3==0, i.e. %9 ∈ {0,3,6}; slice k takes %9 ∈ {3k−2, 3k−1}),
    // offset ids — and each must actually admit, or the chain pins
    // nothing
    val off = 1000000L
    for (k <- 1 to 3) {
      val shard = docsAll.filter(col("doc_id") % 9 === lit(3 * k - 2) ||
          col("doc_id") % 9 === lit(3 * k - 1))
        .select(col("lang"), (col("doc_id") + lit(k * off)).as("doc_id"),
          col("text"))
      val d = ReleaseFlow.release(spark, shard, base)
      assert(!d.filter(col("decision") === "admit").isEmpty,
        s"chain release $k must append rows for the contract to bite")
      ReleaseFlow.release(spark, shard, twin)
    }
    val dirs = Seq(
      s"${ReleaseFlow.dedupDir(base)}/content_hashes",
      s"${ReleaseFlow.substrDir(base)}/span_grams",
      s"${ReleaseFlow.neardupDir(base)}/sketch",
      s"${ReleaseFlow.neardupDir(base)}/bands")
    val beforeFiles = dirs.map(d => d -> Compaction.fileCount(spark, d)).toMap
    val beforeRows = Map(
      "dedup" -> rowsOf(DedupIndex.read(spark, ReleaseFlow.dedupDir(base))),
      "substr" -> rowsOf(SubstringIndex.read(spark, ReleaseFlow.substrDir(base))),
      "winnow" -> rowsOf(WinnowIndex.read(spark, ReleaseFlow.winnowDir(base))),
      "bands" -> rowsOf(StreamingNearDup
        .readIndex(spark, ReleaseFlow.neardupDir(base)).bands))

    ReleaseFlow.compact(spark, base)

    assert(rowsOf(DedupIndex.read(spark, ReleaseFlow.dedupDir(base))) ===
      beforeRows("dedup"), "dedup row multiset")
    assert(rowsOf(SubstringIndex.read(spark, ReleaseFlow.substrDir(base))) ===
      beforeRows("substr"), "substring row multiset")
    assert(rowsOf(WinnowIndex.read(spark, ReleaseFlow.winnowDir(base))) ===
      beforeRows("winnow"), "winnow row multiset")
    assert(rowsOf(StreamingNearDup
      .readIndex(spark, ReleaseFlow.neardupDir(base)).bands) ===
      beforeRows("bands"), "band row multiset")
    dirs.foreach { d =>
      assert(Compaction.fileCount(spark, d) < beforeFiles(d),
        s"$d: compaction must reduce the file count " +
          s"(${beforeFiles(d)} before)")
    }

    // the probe semantics are untouched: release the SAME final shard
    // against the compacted base and the untouched twin — decisions
    // must agree row-for-row (this also exercises the winnow tier's
    // compacted artifact)
    val shard4 = docsAll.filter(col("doc_id") % 3 === 1)
      .select(col("lang"), (col("doc_id") + lit(9 * off)).as("doc_id"),
        col("text"))
    def decisions(b: String) =
      ReleaseFlow.release(spark, shard4, b,
          ReleaseFlow.Screens(tieredVerbatim = true))
        .select("doc_id", "decision").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(decisions(base) === decisions(twin),
      "post-compaction decisions must equal the uncompacted twin's")
  }

  test("reader-atomic swap: a frame resolved BEFORE a compaction still " +
      "collects after it (old rows, no error), new reads resolve the " +
      "pointer, and superseded trees are GC'd one generation behind") {
    val base = tmp("graft_compact_reader")
    val corpus = docsAll.filter(col("doc_id") % 4 === 0)
    DedupIndex.write(corpus, base)
    DedupIndex.append(
      docsAll.filter(col("doc_id") % 4 === 1)
        .select(col("lang"), (col("doc_id") + lit(1000000L)).as("doc_id"),
          col("text")), base)
    val expected = rowsOf(DedupIndex.read(spark, base))

    // reader 1 resolves the FLAT layout, then the first compaction
    // versions the artifact (flat → v1) under it
    val inFlight1 = DedupIndex.read(spark, base)
    DedupIndex.compact(spark, base)
    assert(rowsOf(inFlight1) === expected,
      "a reader across the first swap must still see its resolved tree")
    assert(rowsOf(DedupIndex.read(spark, base)) === expected,
      "the pointer-resolved read sees the same multiset")
    val dir = s"$base/content_hashes"
    assert(Compaction.currentVersion(spark, dir).contains(1))

    // reader 2 resolves v1; the second compaction flips to v2 and GCs
    // the flat generation — v1 must survive for the in-flight reader
    val inFlight2 = DedupIndex.read(spark, base)
    DedupIndex.compact(spark, base)
    assert(rowsOf(inFlight2) === expected,
      "a reader across the second swap must still see v1")
    assert(rowsOf(DedupIndex.read(spark, base)) === expected)
    assert(Compaction.currentVersion(spark, dir).contains(2))
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val entries = fs.listStatus(new org.apache.hadoop.fs.Path(dir))
      .map(_.getPath.getName).toSet
    assert(!entries.exists(_.endsWith(".parquet")),
      s"the flat generation must be GC'd two flips in ($entries)")
    assert(entries.contains("v1") && entries.contains("v2"),
      s"live + one superseded tree must remain ($entries)")

    // appends land in the LIVE tree and the next compact folds them in
    DedupIndex.append(
      docsAll.filter(col("doc_id") % 4 === 2)
        .select(col("lang"), (col("doc_id") + lit(2000000L)).as("doc_id"),
          col("text")), base)
    val expected3 = rowsOf(DedupIndex.read(spark, base))
    assert(expected3.size > expected.size)
    DedupIndex.compact(spark, base)
    assert(rowsOf(DedupIndex.read(spark, base)) === expected3,
      "post-append compact keeps the appended rows")
    assert(Compaction.currentVersion(spark, dir).contains(3))
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v1")),
      "v1 is two generations old after the third flip — GC'd")
  }

  test("scoped retract inside a VERSIONED tree: after a compaction has " +
      "flipped the artifact to v1, a small retract rewrites only the " +
      "touched files of the live tree — pointer unmoved, untouched " +
      "files byte-identical, multiset = complement") {
    val base = tmp("graft_scoped_in_v")
    val corpus = docsAll.filter(col("doc_id") % 2 === 0)
    DedupIndex.write(corpus, base)
    DedupIndex.compact(spark, base) // flat → v1
    // appends land INSIDE the live v1 tree as their own file set —
    // the composition a release chain produces after a compaction
    val appended = docsAll.filter(col("doc_id") % 2 =!= 0)
      .select(col("lang"), (col("doc_id") + lit(1000000L)).as("doc_id"),
        col("text"))
    DedupIndex.append(appended, base)
    val corpusAll = corpus.unionByName(appended)
    val dir = s"$base/content_hashes"
    assert(Compaction.currentVersion(spark, dir).contains(1))
    val live = Compaction.resolve(spark, dir)
    def stamps(): Map[String, (Long, Long)] = {
      val p = new org.apache.hadoop.fs.Path(live)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val it = fs.listFiles(p, true)
      val b = Map.newBuilder[String, (Long, Long)]
      while (it.hasNext) {
        val f = it.next()
        if (f.getPath.getName.endsWith(".parquet"))
          b += f.getPath.toString -> ((f.getLen, f.getModificationTime))
      }
      b.result()
    }
    val before = stamps()
    assert(before.size > 1, s"fixture needs >1 file, got ${before.size}")
    // one doc's hash row lives in one file — the scoped path must move
    // only that file, inside v1, without a flip
    val victim = appended.select("doc_id").orderBy("doc_id").limit(1)
      .localCheckpoint()
    val expected = rowsOf(DedupIndex.build(
      corpusAll.join(victim, Seq("doc_id"), "left_anti")))
    DedupIndex.retract(spark, victim, base)
    assert(Compaction.currentVersion(spark, dir).contains(1),
      "a scoped retract must not flip the version pointer")
    assert(rowsOf(DedupIndex.read(spark, base)) === expected,
      "retract ≡ complement rebuild inside the versioned tree")
    val after = stamps()
    val untouched = before.count { case (p, s) => after.get(p).contains(s) }
    assert(untouched >= before.size - 1 && untouched < before.size,
      s"exactly the touched file moves ($untouched of ${before.size} kept)")
  }

  test("media lifecycle compaction: row multisets unchanged, file " +
      "counts shrink, decisions identical to an uncompacted twin") {
    val base = tmp("graft_compact_media")
    val twin = tmp("graft_compact_media_twin")
    val allm = docsAll
      .select(col("doc_id").cast("long").as("doc_id"),
        graft.functions.Multimodal.payloadCol(col("doc_id")).as("payload"))
    val corpus = allm.filter(col("doc_id") % 3 === 0)
    MediaReleaseFlow.init(corpus, base)
    MediaReleaseFlow.init(corpus, twin)
    val off = 1000000L
    for (k <- 1 to 3) {
      val shard = allm.filter(col("doc_id") % 3 === 1 &&
          col("doc_id") % 9 === lit(3 * (k - 1) + 1))
        .select((col("doc_id") + lit(k * off)).as("doc_id"), col("payload"))
      MediaReleaseFlow.release(spark, shard, base)
      MediaReleaseFlow.release(spark, shard, twin)
    }
    val bytesDir = s"${MediaReleaseFlow.bytehashDir(base)}/payload_hashes"
    val beforeFiles = Compaction.fileCount(spark, bytesDir)
    val beforeBytes = rowsOf(MediaReleaseFlow.readByteIndex(spark, base))

    MediaReleaseFlow.compact(spark, base)

    assert(rowsOf(MediaReleaseFlow.readByteIndex(spark, base)) === beforeBytes)
    assert(Compaction.fileCount(spark, bytesDir) < beforeFiles)
    val shard4 = allm.filter(col("doc_id") % 3 === 2)
      .select((col("doc_id") + lit(9 * off)).as("doc_id"), col("payload"))
    def decisions(b: String) =
      MediaReleaseFlow.release(spark, shard4, b)
        .select("doc_id", "decision").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(decisions(base) === decisions(twin))
  }
}
