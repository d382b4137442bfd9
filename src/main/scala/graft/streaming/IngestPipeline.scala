package graft.streaming

import graft.operators.Validation
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** The reference's ingest contract (SURVEY.md §3.2), Spark-native:
  * Kafka-shaped stream → PERMISSIVE JSON decode → validation split →
  * `foreachBatch` dual-sink:
  *
  *  - raw audit append, idempotent on (partition, offset) — the
  *    `UNIQUE(topic_partition, topic_offset)` replay guard of
  *    `02_create_tables.sql:9-47` (T4 exactly-once without broker
  *    transactions);
  *  - normalized latest-wins upsert by primary key (S7/T5, compacted
  *    topic semantics; trigger-maintained `last_modified` analog of
  *    `02:143-163`: the audit timestamp survives when the existing row
  *    wins a replayed tie);
  *  - rejects append with rule tags;
  *  - per-batch processing stats (A8/S9, `02:134-141`).
  *
  * Sinks are plain parquet directories: at production scale the upsert
  * becomes a MERGE into a table format (Delta/Iceberg) or a compacted
  * partition overwrite — the dataflow (dedup → key-agg → write) is
  * identical, one shuffle on the primary key per microbatch.
  */
object IngestPipeline {

  final case class Sinks(raw: String, normalized: String, rejects: String,
      stats: String, checkpoint: String)

  /** Start one entity topic's ingest from runtime settings alone: reads
    * the producer CLI's topic directory (`<sinkBase>/topics/<topic>`)
    * and writes the standard per-topic sink layout — the configuration
    * path a deployment uses (env vars → `Settings.fromEnv` → here). */
  def start(spark: SparkSession, settings: graft.Settings,
      entity: graft.Schemas.EntityDesc): StreamingQuery =
    start(spark, s"${settings.sinkBase}/topics/${entity.topic}",
      settings.sinksFor(entity.topic), entity)

  /** Start the ingest stream for one entity topic from its descriptor
    * (schema + key + rules + at-rest money columns in one place,
    * `graft.Schemas`). */
  def start(spark: SparkSession, inputDir: String, sinks: Sinks,
      entity: graft.Schemas.EntityDesc): StreamingQuery =
    start(spark, inputDir, sinks, entity.schema, entity.pk, entity.versionCol,
      entity.rules, moneyCols = entity.moneyCols)

  /** Start the ingest stream for one entity topic. `Trigger.AvailableNow`
    * drains everything present then stops — the replayable batch form;
    * pass a processing-time trigger for continuous mode. */
  def start(spark: SparkSession, inputDir: String, sinks: Sinks,
      entitySchema: StructType, pk: String, versionCol: String,
      rules: Seq[(String, Column)],
      maxFilesPerTrigger: Option[Int] = None,
      moneyCols: Seq[String] = Nil,
      normalizedBuckets: Option[Int] = None): StreamingQuery =
    KafkaShaped.fileStream(spark, inputDir, maxFilesPerTrigger)
      // A8: batch-level row counters surfaced through the observe API.
      .observe("ingest", count(lit(1)).as("n_in"),
        count(col("value")).as("n_value_present"))
      .writeStream
      .option("checkpointLocation", sinks.checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, sinks, entitySchema, pk, versionCol, rules,
          moneyCols, normalizedBuckets)
      }
      .start()

  /** One microbatch of the dual-write. Exposed for direct batch-mode use
    * and tests. `normalizedBuckets = Some(n)` switches the normalized
    * sink from the whole-table swap to the hash-partitioned upsert
    * ([[PartitionedUpsert]]) — O(touched buckets) per batch instead of
    * O(table); read the result back with `PartitionedUpsert.readAll`. */
  def processBatch(batch: DataFrame, batchId: Long, sinks: Sinks,
      entitySchema: StructType, pk: String, versionCol: String,
      rules: Seq[(String, Column)],
      moneyCols: Seq[String] = Nil,
      normalizedBuckets: Option[Int] = None): Unit = {
    val spark = batch.sparkSession
    val t0 = System.nanoTime()

    // Idempotence is enforced PER SINK, not upstream of all of them: a
    // crash between the raw append and the downstream writes must not
    // cause the replayed batch to skip normalized/rejects (they each
    // tolerate re-processing on their own — anti-join for the appends,
    // tie-break ordering for the upsert).
    val inBatch = batch.dropDuplicates("partition", "offset").localCheckpoint(true)
    val nIn = inBatch.count()

    // ---- S6: raw audit append, idempotent on (partition, offset). The
    // guard is high-water-mark first: rows beyond the per-partition max
    // landed offset are fresh WITHOUT opening the audit table (at 100 TB
    // the audit table is the biggest table in the system — an O(table)
    // lineage scan per microbatch is unaffordable); only the replay
    // overlap (normally empty) anti-joins against landed lineage.
    val freshRaw = freshByHwm(spark, inBatch, sinks.raw)
      .localCheckpoint(true) // materialize before appending to what it reads
    freshRaw.withColumn("consumed_at", current_timestamp())
      .write.mode("append").parquet(sinks.raw)
    // Advance the watermark only AFTER the append committed: a crash in
    // between leaves the mark low, which degrades to the anti-join path
    // on replay — never to a skipped row.
    advanceHwm(spark, inBatch, sinks.raw)
    val nFresh = freshRaw.count() // cheap: counts materialized blocks

    // ---- S5: typed decode (PERMISSIVE + corrupt-record capture) over
    // the WHOLE deduped batch — downstream sinks do their own replay
    // guarding, so a row already in raw still flows to them.
    val parsed = inBatch
      .withColumn("r", from_json(col("value"), entitySchema,
        Map("mode" -> "PERMISSIVE",
          "timestampFormat" -> "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")))
      .select(col("partition"), col("offset"), col("r.*"))
      // ONE decode pass per batch: the rejects sink, the reject count,
      // and the normalized upsert below all consume this frame —
      // materialized, each reads blocks plus a cheap predicate instead
      // of re-running from_json per consumer (three passes before).
      .localCheckpoint(true)

    // ---- V1–V5: validation split.
    val Validation.Split(valid, rejects) = Validation.split(parsed, rules)

    // ---- Rejects append, idempotent on (partition, offset) like raw
    // (validation is deterministic, so a given offset is always valid or
    // always a reject — the rejects-only watermark can never skip a row
    // that belongs here).
    val freshRejects = freshByHwm(spark, rejects, sinks.rejects)
      .localCheckpoint(true)
    freshRejects.withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(sinks.rejects)
    advanceHwm(spark, rejects, sinks.rejects)
    // Batch-level reject count (replayed rows included) — a predicate
    // over the materialized decode, so no parse re-run and no lineage
    // re-scan.
    val nRejects = rejects.count()

    // ---- S7/T5: normalized latest-wins upsert. Winner per key by
    // (version, source offset, existing-first): a genuinely newer record
    // wins on version, a re-published record with an unchanged version
    // wins on its later per-partition offset (keys are partitioned by
    // hash, so offsets order per key — the compacted-topic rule), and an
    // exact replay ties on both and keeps the existing row, so replays
    // never touch last_modified (trigger semantics, `02:143-163`).
    val incoming = valid.withColumnRenamed("offset", "_src_offset").drop("partition")
      .withColumn("last_modified", current_timestamp())
    normalizedBuckets match {
      case Some(n) =>
        // Scale form: only the buckets this batch's keys hash into are
        // read and rewritten. Money is cast at-rest BEFORE the merge, so
        // per-bucket priors and incoming rows union decimal-to-decimal.
        PartitionedUpsert.upsert(spark, sinks.normalized,
          graft.operators.Normalize.atRest(incoming, moneyCols),
          pk, Seq(versionCol, "_src_offset"), n)
      case None =>
        val upserted = latestWins(existing(spark, sinks.normalized), incoming, pk,
          Seq(versionCol, "_src_offset"))
        // Money lands as DECIMAL(10,2) (the reference's at-rest DDL
        // type); the union above coerces prior decimals back to wire
        // doubles, which is lossless for 2-decimal money, and this
        // single cast restores the exact at-rest representation for
        // whatever key wins.
        swapWrite(spark, graft.operators.Normalize.atRest(upserted, moneyCols),
          sinks.normalized)
    }

    // ---- A8/S9: processing stats append (`02:134-141` analog). Counts
    // come from materialized frames or arithmetic — no plan re-runs.
    val durMs = (System.nanoTime() - t0) / 1000000
    spark.createDataFrame(Seq(
      (batchId, nIn, nFresh, nIn - nRejects, nRejects, durMs)))
      .toDF("batch_id", "n_in", "n_fresh", "n_valid", "n_rejects", "duration_ms")
      .withColumn("recorded_at", current_timestamp())
      .write.mode("append").parquet(sinks.stats)
  }

  /** Latest-wins merge of a batch into a prior table state: winner per
    * key by the tie-break columns (descending significance), with the
    * EXISTING row winning exact ties — so replays never touch a landed
    * row (the trigger semantics of `02:143-163`). Shared by the
    * whole-table swap sink here and the hash-partitioned upsert
    * ([[PartitionedUpsert]]). */
  private[streaming] def latestWins(prior: Option[DataFrame], incoming: DataFrame,
      pk: String, tieBreak: Seq[String]): DataFrame = {
    val inc = incoming.withColumn("_prio", lit(0))
    val merged = prior match {
      case Some(p) => p.withColumn("_prio", lit(1)).unionByName(inc)
      case None    => inc
    }
    val payloadNames = merged.columns.filter(c => c != pk && c != "_prio").toIndexedSeq
    merged
      .groupBy(col(pk))
      .agg(max_by(struct(payloadNames.map(col): _*),
        struct(tieBreak.map(col) :+ col("_prio"): _*)).as("w"))
      .select(col(pk) +: payloadNames.map(c => col(s"w.$c").as(c)): _*)
  }

  /** Keep only rows whose (partition, offset) lineage is absent from the
    * sink — the replay guard each append sink applies independently. */
  private def antiByOffset(df: DataFrame, sink: Option[DataFrame]): DataFrame =
    sink match {
      case Some(prior) =>
        df.join(prior.select("partition", "offset"),
          Seq("partition", "offset"), "left_anti")
      case None => df
    }

  private def hwmPath(sinkPath: String): String = sinkPath + "._hwm"

  /** High-water-mark replay guard: rows with `offset` beyond the
    * per-partition max landed offset are fresh by construction — the
    * audit table is NEVER opened for them; only the overlap (an exact or
    * partial replay, normally empty — checked with one tiny job over the
    * already-materialized batch) falls back to the lineage anti-join. No
    * watermark file (first batch, or a crash before it ever landed) —
    * full fallback. */
  private def freshByHwm(spark: SparkSession, df: DataFrame, sinkPath: String): DataFrame =
    existing(spark, hwmPath(sinkPath)) match {
      case None => antiByOffset(df, existing(spark, sinkPath))
      case Some(h) =>
        val tagged = df
          .join(broadcast(h), Seq("partition"), "left")
          .withColumn("_hwm", coalesce(col("max_offset"), lit(Long.MinValue)))
          .drop("max_offset")
        val fresh   = tagged.filter(col("offset") > col("_hwm")).drop("_hwm")
        val overlap = tagged.filter(col("offset") <= col("_hwm")).drop("_hwm")
        if (overlap.isEmpty) fresh
        else fresh.unionByName(antiByOffset(overlap, existing(spark, sinkPath)))
    }

  /** Advance the per-partition max-offset watermark with this batch's
    * lineage. Called strictly AFTER the append commits: a crash between
    * the two leaves the mark low (safe — replay degrades to the
    * anti-join), never high (which could skip rows). The mark itself is
    * a few rows, replaced via the same crash-safe rotation as the
    * normalized table. */
  private def advanceHwm(spark: SparkSession, batch: DataFrame, sinkPath: String): Unit = {
    if (batch.isEmpty) return
    val fresh = batch.groupBy("partition").agg(max("offset").as("max_offset"))
    val merged = existing(spark, hwmPath(sinkPath)) match {
      case Some(old) => old.unionByName(fresh)
        .groupBy("partition").agg(max("max_offset").as("max_offset"))
      case None => fresh
    }
    swapWrite(spark, merged, hwmPath(sinkPath))
  }

  /** Atomic-enough full-table replace without a table format: write the
    * new contents to `<path>.tmp` (reading the old contents is safe —
    * nothing touches `path` until the write committed), then rotate
    * old → `<path>.bak`, tmp → path, drop the backup. Directory renames
    * are single metadata operations, so every crash point leaves either
    * the old table at `path` or a complete new one, with the old state
    * recoverable from `.bak` in the one window where `path` is absent —
    * [[existing]] falls back to it. (A production deployment swaps this
    * for a Delta/Iceberg MERGE; the dataflow above is unchanged.) */
  private[streaming] def swapWrite(spark: SparkSession, df: DataFrame, path: String): Unit = {
    val hconf = spark.sparkContext.hadoopConfiguration
    val p   = new org.apache.hadoop.fs.Path(path)
    val fs  = p.getFileSystem(hconf)
    val tmp = new org.apache.hadoop.fs.Path(path + ".tmp")
    val bak = new org.apache.hadoop.fs.Path(path + ".bak")
    df.write.mode("overwrite").parquet(tmp.toString)
    // Rotate the backup ONLY while the live table exists: after a prior
    // mid-swap crash (path absent, state only in .bak) deleting the
    // backup before tmp lands would make a second crash lose both copies.
    // Here every crash point leaves at least one of {path, .bak} intact.
    if (fs.exists(p)) {
      if (fs.exists(bak)) fs.delete(bak, true)
      fs.rename(p, bak)
    }
    fs.rename(tmp, p)
    fs.delete(bak, true)
  }

  private[streaming] def existing(spark: SparkSession, path: String): Option[DataFrame] = {
    def readable(p: org.apache.hadoop.fs.Path,
        fs: org.apache.hadoop.fs.FileSystem): Boolean =
      fs.exists(p) && fs.listStatus(p).exists(_.getPath.getName.endsWith(".parquet"))
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (readable(p, fs)) Some(spark.read.parquet(path))
    else {
      // Crash window of swapWrite: the table is mid-rotation and the
      // pre-batch state lives in the backup.
      val bak = new org.apache.hadoop.fs.Path(path + ".bak")
      if (readable(bak, fs)) Some(spark.read.parquet(bak.toString)) else None
    }
  }
}
