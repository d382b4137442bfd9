package graft

import org.apache.spark.sql.functions._

import graft.operators.Compaction

/** Manifest-machinery benchmark at an artificially HIGH file count —
  * the measured answer to "does the flat `_MANIFEST` + driver-side
  * tree walk bend at 10⁵-file artifacts?" (VERDICT r17's design note:
  * Iceberg shards its manifests for exactly this regime). The rung
  * builds one artifact of `SPARK_GRAFT_MANIFEST_FILES` one-row parquet
  * files (default 50 000 — the ~100 TB-artifact file-count regime at
  * 2 GB files), then times every maintenance step that touches the
  * manifest or walks the tree:
  *
  *  - `scoped_retract`: [[Compaction.retract]] of ONE key — the
  *    touched-file discovery scan over every footer, the ~50k-line
  *    manifest write, the pointer flip;
  *  - `readlive_plan` / `readlive_count`: manifest parse + explicit
  *    file-list plan construction, then the actual read;
  *  - `append_into`: two full `listTree` walks around a 1-file append
  *    plus the atomic manifest extension;
  *  - `prune_versions`: retained-manifest reads + the orphan-GC walk.
  *
  * One JSON line; recorded in BENCH_NOTES beside the flat-vs-sharded
  * decision. Raise the count with the env var to probe the slope.
  */
object BenchManifest {
  def main(args: Array[String]): Unit = {
    val nFiles = sys.env.getOrElse("SPARK_GRAFT_MANIFEST_FILES", "50000")
      .toInt.max(2)
    val spark = Session.get()
    val base = java.nio.file.Files
      .createTempDirectory("graft_manifest_bench_").toString
    val dir = s"$base/wide_artifact"

    def secs(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // one row per file: repartition(nFiles) makes every task write its
    // own file — the smallest honest way to a 10⁵-file tree
    val tBuild = secs {
      spark.range(nFiles.toLong)
        .select(col("id").as("doc_id"), xxhash64(col("id")).as("h"))
        .repartition(nFiles)
        .write.mode("overwrite").parquet(dir)
    }
    val filesBefore = Compaction.fileCount(spark, dir)

    // scoped retract of ONE key → rewrites 1 file, manifests the rest
    import spark.implicits._
    val tRetract = secs {
      Compaction.retract(spark, dir, Seq(0L).toDF("doc_id"), "doc_id")(
        _.coalesce(1).sortWithinPartitions("doc_id"))
    }
    val filesAfter = Compaction.fileCount(spark, dir)

    var live: org.apache.spark.sql.DataFrame = null
    val tPlan = secs { live = Compaction.readLive(spark, dir) }
    var n = 0L
    val tCount = secs { n = live.count() }

    val tAppend = secs {
      Compaction.appendInto(spark, dir) { d =>
        spark.range(1).select((col("id") + nFiles).as("doc_id"),
            xxhash64(col("id")).as("h"))
          .coalesce(1).write.mode("append").parquet(d)
      }
    }

    // a second tiny retract rotates in another manifest generation so
    // pruneVersions has retained manifests to read and a superseded
    // tree to walk
    Compaction.retract(spark, dir, Seq(1L).toDF("doc_id"), "doc_id")(
      _.coalesce(1).sortWithinPartitions("doc_id"))
    val tPrune = secs { Compaction.pruneVersions(spark, dir) }

    def r3(x: Double) =
      String.format(java.util.Locale.ROOT, "%.3f", Double.box(x))
    println(s"""{"metric":"manifest_scale","unit":"sec","n_files":$nFiles,""" +
      s""""build":${r3(tBuild)},"scoped_retract":${r3(tRetract)},""" +
      s""""readlive_plan":${r3(tPlan)},"readlive_count":${r3(tCount)},""" +
      s""""append_into":${r3(tAppend)},"prune_versions":${r3(tPrune)},""" +
      s""""files_before":$filesBefore,"files_after":$filesAfter,""" +
      s""""rows_live":$n}""")
    spark.stop()
  }
}
