package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Ivf, SimHash, VectorOps}

/** Persisted ANN indexes — the build-once / probe-many split behind the
  * l12 (hyperplane-LSH) and l16 (IVF) catalog queries.
  *
  * The catalog queries compose train + probe into one self-contained
  * plan so the driver's gate can replay them from nothing. That is the
  * right shape for a correctness gate and the WRONG shape for steady
  * state: at 100 TB the corpus is signed/clustered ONCE per refresh in
  * batch, the index lands on parquet, and every query afterwards only
  * probes. This object is that steady-state contract — the same
  * `writeIndex`/`readIndex` treatment the streaming near-dup corpus
  * index already gets ([[graft.streaming.StreamingNearDup.writeIndex]]),
  * extended to both ANN families. The reference encodes the identical
  * philosophy with its precomputed index set (`sql/init/
  * 03_create_indexes.sql` — build indexes once, point queries probe).
  *
  * Build and probe share the SAME code paths as the composed queries
  * ([[lshBands]] feeds l12; [[Ivf.train]]/[[Ivf.assign]] feed l16), so
  * a probe against a materialized index cannot drift from the composed
  * plan — pinned by AnnIndexSpec against the same sf0.01 goldens.
  *
  * Persisted layout (the 100 TB shape):
  *  - LSH bands cluster by (band_id, bval): a probe pushes its 4 band
  *    keys down as literal predicates, so row-group min/max stats on
  *    the clustered layout skip everything outside the query's 4 band
  *    values.
  *  - IVF inverted lists are DIRECTORY-partitioned by cell id: a probe
  *    touches `nprobe`/`k` of the index files by path pruning alone,
  *    before any row is read. Centroids are a k-row side file.
  *  - Neither index stores vectors. The probe re-ranks candidates
  *    against the embeddings table itself — the index stays tens of
  *    bytes per vector, and re-ranking reads only candidate rows.
  */
object AnnIndexes {

  // ------------------------------------------------------------- LSH

  /** Band rows (vec_id, band_id, bval) for a corpus (vec_id, v):
    * 16-plane sign signature → 4×4-bit bands, identical arithmetic to
    * the l12 composed plan (shared [[LlmQueries.hyperplaneSig]]). */
  def lshBands(e: DataFrame): DataFrame =
    LlmQueries.hyperplaneSig(e, LlmQueries.hyperplanes16)
      .select(col("vec_id"), explode(SimHash.bands(col("sig"), 4, 16)).as("b"))
      .select(col("vec_id"), col("b.band_id"), col("b.bval"))

  def writeLsh(bands: DataFrame, base: String): Unit =
    bands.repartition(col("band_id"))
      .sortWithinPartitions("band_id", "bval")
      .write.mode("overwrite").parquet(s"$base/lsh_bands")

  def readLsh(spark: SparkSession, base: String): DataFrame =
    Compaction.readLive(spark, s"$base/lsh_bands")

  /** Incremental append: band rows for `newVecs` land beside the
    * existing index files. The LSH signature is a PURE per-row function
    * of the vector — no trained state — so append-then-probe equals a
    * full rebuild EXACTLY (AnnIndexSpec pins row equality), and a daily
    * refresh only signs the new vectors. New files cluster by band key
    * like the original write; row-group skipping still applies per
    * file. */
  def appendLsh(newVecs: DataFrame, base: String): Unit =
    Compaction.appendInto(newVecs.sparkSession, s"$base/lsh_bands") { live =>
      lshBands(newVecs).repartition(col("band_id"))
        .sortWithinPartitions("band_id", "bval")
        .write.mode("append").parquet(live)
    }

  /** Retract vectors from BOTH persisted artifacts under `base` —
    * `lsh_bands` and/or `ivf_lists`, whichever exist — with ONE id set
    * pinned before any swap (exactly one materialization for the
    * combined path: the single-artifact retracts below delegate to the
    * same pre-pinned variants). This is the safe form whenever the id
    * list's lineage may read either artifact: a LAZY frame passed to
    * two separate calls would re-evaluate between swaps — the first
    * rewrite replaces the files the second call's pin then tries to
    * read (loud FileNotFound under a cached listing, silently-empty
    * after a refresh; AnnIndexSpec pins the safe path). */
  def retract(spark: SparkSession, ids: DataFrame, base: String): Unit =
    retractPinned(spark, ids.select("vec_id").distinct().localCheckpoint(),
      base)

  /** [[retract]] for an id frame the caller already materialized
    * ([[ReleaseFlow.retractAll]] pins one set across the whole
    * deployment footprint). */
  private[graft] def retractPinned(spark: SparkSession, pinned: DataFrame,
      base: String): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    def exists(d: String) = {
      val p = new org.apache.hadoop.fs.Path(d)
      p.getFileSystem(conf).exists(p)
    }
    // disjoint artifact dirs — concurrent swaps ([[Par]], guide §2.6)
    Par.run(Seq(
      ("lsh_bands", () => retractLshPinned(spark, pinned, base)),
      ("ivf_lists", () => retractIvfPinned(spark, pinned, base)),
      ("ivf8_lists", () => retractIvfInt8Pinned(spark, pinned, base)))
      .collect { case (d, t) if exists(s"$base/$d") => t })
  }

  /** Remove every band row of vectors in `ids` (a vec_id frame) —
    * [[Compaction.retract]]'s contract on this artifact (the vector
    * side of [[graft.operators.ReleaseFlow.retract]]'s recall story:
    * retracting a document whose embedding was indexed must recall the
    * embedding too). Band rows are pure per-vector functions, so the
    * anti-join equals a rebuild without those vectors exactly — and
    * the rewrite is FILE-scoped: a vec_id signs into 4 of the 16 band
    * partitions, so a small takedown touches at most 4·|ids| of the
    * clustered files and the rest keep their bytes (AnnIndexSpec pins
    * it). For an id list whose lineage might read EITHER vector
    * artifact, use [[retract]] (one pin across both swaps). */
  def retractLsh(spark: SparkSession, ids: DataFrame, base: String): Unit =
    // pin before the swap ([[ReleaseFlow.retract]]'s discipline): a
    // caller may derive ids from a frame whose lineage reads this very
    // artifact, and an unpinned plan re-evaluated after the swap would
    // silently retract nothing
    retractLshPinned(spark,
      ids.select("vec_id").distinct().localCheckpoint(), base)

  private def retractLshPinned(spark: SparkSession, pinned: DataFrame,
      base: String): Unit =
    Compaction.retract(spark, s"$base/lsh_bands", pinned, "vec_id")(
      _.repartition(col("band_id")).sortWithinPartitions("band_id", "bval"))

  /** Top-k by exact cosine among the vectors sharing ≥1 LSH band with
    * the query. `bands` may be the composed [[lshBands]] frame or a
    * [[readLsh]] read-back — same result by construction. `query` is a
    * 1-row frame with vector column `v`; its band keys are recomputed
    * from the vector (the signature is a pure function, so a corpus
    * query and a novel query probe identically). `excludeId` drops the
    * query's own corpus row from the candidates (-1 = keep all).
    *
    * The 4 band keys are collected driver-side (a BOUNDED action: one
    * query row → 4 keys, the same budget as m1's refresh key) and
    * pushed as LITERAL predicates, so the band-index scan row-group-
    * skips via parquet min/max stats — the point-lookup shape a
    * production probe uses. The join form would read the whole index:
    * a broadcast join filters AFTER the scan, it cannot push min/max
    * skipping into it. */
  def probeLsh(bands: DataFrame, e: DataFrame, query: DataFrame,
      topK: Int, excludeId: Long = -1L): DataFrame = {
    val qb = lshBands(query.select(lit(-1L).as("vec_id"), col("v")))
      .select("band_id", "bval").collect()
    require(qb.nonEmpty, "probeLsh: query frame produced no band keys")
    // one query row signs into exactly 4 band rows — more means a
    // multi-row query frame, whose band keys would blend into one
    // candidate set and rerank into a meaningless mixed top-k
    require(qb.length <= 4,
      s"probeLsh: query frame has ${qb.length / 4} rows — use probeLshBatch")
    val hit = qb.map(r => col("band_id") === r.getInt(0) && col("bval") === r.getLong(1))
      .reduce(_ || _)
    // Dedup candidates as bare ids BEFORE re-attaching vectors so the
    // distinct's shuffle never carries the 512-byte arrays (same
    // discipline as the composed l12 plan).
    val candidates = bands.filter(col("vec_id") =!= excludeId)
      .filter(hit)
      .select("vec_id").distinct()
    rerank(candidates, e, query, topK)
  }

  /** [[probeLsh]]'s fully-LAZY sibling: candidates come from a
    * broadcast equi-join of the query's 4-row band frame against the
    * index, so building the plan runs NO Spark job. Same rows as
    * [[probeLsh]] by construction (identical band arithmetic, identical
    * re-rank). Use this when the bands are an IN-PLAN frame (the
    * composed l12 catalog query): there the collect-and-push-literals
    * path costs an eager job at DataFrame-build time and buys nothing —
    * min/max row-group skipping only exists on a parquet-backed scan.
    * Reserve [[probeLsh]] for materialized indexes, where the pushed
    * literals are the point.
    *
    * Laziness trade ([[probeIvf]] has the same contract): an EMPTY
    * query frame yields an empty result, not [[probeLsh]]'s loud
    * `require` — validate the query exists upstream if that
    * distinction matters (the composed l12 gate pins rows = topK, so
    * a vanished query row surfaces as a failed row count there). */
  def probeLshJoin(bands: DataFrame, e: DataFrame, query: DataFrame,
      topK: Int, excludeId: Long = -1L): DataFrame = {
    val qb = lshBands(query.select(lit(-1L).as("vec_id"), col("v")))
      .select("band_id", "bval")
    val candidates = bands.filter(col("vec_id") =!= excludeId)
      .join(broadcast(qb), Seq("band_id", "bval"))
      .select("vec_id").distinct()
    rerank(candidates, e, query, topK)
  }

  /** Batch probe: top-k for a whole query FRAME (qid, v) in one plan —
    * the shape for re-ranking a day's queries or an evaluation set,
    * where [[probeLsh]]'s per-query driver collect would serialize into
    * N driver round-trips. Candidates come from ONE equi-join of the
    * index against the batch's band rows (4·|queries| rows, broadcast);
    * the per-query top-k is a rank window partitioned by qid — the
    * partition count is the query count, so the window never sees
    * corpus-sized partitions. `excludeSelf` (default) drops the
    * self-match when the query id appears in the corpus (`qid ===
    * vec_id`), mirroring probeLsh's excludeId — pass false when the
    * query ids are a namespace UNRELATED to corpus ids (a novel eval
    * set numbered from 0), where the coincidental-id drop would
    * silently exclude a genuine neighbor. Returns (qid, vec_id,
    * sim_e4); AnnIndexSpec pins a 3-query batch equal to 3 single
    * probes row-for-row. */
  def probeLshBatch(bands: DataFrame, e: DataFrame, queries: DataFrame,
      topK: Int, excludeSelf: Boolean = true): DataFrame = {
    val qb = lshBands(queries.select(col("qid").as("vec_id"), col("v")))
      .select(col("vec_id").as("qid"), col("band_id"), col("bval"))
    val candidates = bands
      .join(broadcast(qb), Seq("band_id", "bval"))
      .filter(if (excludeSelf) col("vec_id") =!= col("qid") else lit(true))
      .select("qid", "vec_id").distinct()
    rerankBatch(candidates, e, queries, topK)
  }

  /** Per-qid exact-cosine re-rank for BATCH probes: a (qid, vec_id)
    * candidate frame joins its vectors back, scores against the
    * broadcast query batch, and takes top-k per qid via a rank window
    * whose partitions are per-query candidate sets — never
    * corpus-sized. Shared by [[probeLshBatch]] and [[probeIvfBatch]]
    * (the batch siblings of [[rerank]]). */
  private[operators] def rerankBatch(candidates: DataFrame, e: DataFrame,
      queries: DataFrame, topK: Int): DataFrame = {
    val scored = candidates.join(e, "vec_id")
      .join(broadcast(queries.select(col("qid"), col("v").as("qv"))), "qid")
      .withColumn("sim_e4",
        round(lit(10000) * VectorOps.cosineNative(col("v"), col("qv"))).cast("long"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("sim_e4").desc, col("vec_id"))
    scored.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= topK)
      .select("qid", "vec_id", "sim_e4")
      .orderBy(col("qid"), col("sim_e4").desc, col("vec_id"))
  }

  // ------------------------------------------------------------- IVF

  /** Trained IVF index: `centroids` = (cid, cv) — k rows; `lists` =
    * (vec_id, cid) — the inverted file. */
  final case class IvfIndex(centroids: DataFrame, lists: DataFrame)

  /** Train k-means cells and assign every vector — the exact l16
    * composed build ([[Ivf.train]] + [[Ivf.assign]]). */
  def buildIvf(e: DataFrame, k: Int, iters: Int): IvfIndex = {
    // Deliberately NOT checkpointed: l16's single-plan compose already
    // collapses the duplicated train subtree through broadcast-exchange
    // reuse, and forcing a materialization boundary here measured
    // SLOWER (1.49 → 1.94 s at sf0.1) — the checkpoint pays a block
    // write + a fresh broadcast where ReusedExchange was free. The
    // self-JOIN case, where exchange reuse genuinely fails to collapse
    // the fold, checkpoints at its call site instead (l26).
    val c = Ivf.train(e, k, iters)
    IvfIndex(c, Ivf.assign(e, c))
  }

  /** THE production build: [[Ivf.trainSampled]] under the caller's
    * corpus count — past [[Ivf.cellCount]]'s 4096-cell cap the Lloyd
    * iterations train on a bounded deterministic sample instead of
    * re-scanning the full corpus per iteration, and below the budget
    * (`128·k ≥ n`, every corpus this repo tests) the sample predicate
    * keeps everything and the result is BIT-IDENTICAL to the
    * count-free overload (IvfSpec pins it; AnnIndexSpec pins this
    * overload against that one). `n` is a passed-in count so the build
    * stays a composed plan with no hidden action — every production
    * caller already holds it (l16's memoized [[graft.Tables.rowCount]],
    * the versioned builds' own sizing count). The full corpus still
    * pays exactly ONE assignment pass ([[Ivf.assign]]), as before. */
  def buildIvf(e: DataFrame, k: Int, iters: Int, n: Long): IvfIndex = {
    val c = Ivf.trainSampled(e, k, iters, n)
    IvfIndex(c, Ivf.assign(e, c))
  }

  /** OPT-IN past-the-cap production build: sampled-Lloyd training plus
    * the two-level coarse assignment ([[Ivf.assignCoarse]] — ~√k·3
    * dots per vector instead of k). The build for corpora where
    * [[Ivf.cellCount]] sits at its 4096 cap and the exact n·k
    * assignment is the dominant cost (BENCH_NOTES' steepest measured
    * rung slope); everything downstream — write layout, probes,
    * append, retract — is unchanged, because the inverted file's
    * SHAPE is identical and probe recall tolerates the coarse
    * assignment's mis-assigned tail exactly as it tolerates
    * nprobe < k. Exact-assignment consumers keep [[buildIvf]]. */
  def buildIvfCoarse(e: DataFrame, k: Int, iters: Int, n: Long,
      probeSuper: Int = 2): IvfIndex = {
    val c = Ivf.trainSampled(e, k, iters, n)
    IvfIndex(c, Ivf.assignCoarse(e, c, k, probeSuper))
  }

  /** [[buildIvf]] with k from the shared [[Ivf.cellCount]] selector.
    * The corpus count is a deliberate build-time action: k shapes the
    * training plan itself (seed limit, broadcast width), and an index
    * BUILD is a batch job that runs jobs by definition — unlike a probe,
    * where build-time eagerness is a defect ([[probeLshJoin]]). The
    * count then also bounds training via the sampled production path. */
  def buildIvf(e: DataFrame, iters: Int): IvfIndex = {
    val n = e.count()
    buildIvf(e, Ivf.cellCount(n), iters, n)
  }

  /** Inverted lists directory-partition by `cid`: probing nprobe of k
    * cells prunes to nprobe/k of the files by PATH, before reading a
    * row. The centroid side is k rows — one file. */
  def writeIvf(idx: IvfIndex, base: String): Unit = {
    idx.centroids.coalesce(1)
      .write.mode("overwrite").parquet(s"$base/ivf_centroids")
    idx.lists.repartition(col("cid"))
      .sortWithinPartitions("vec_id")
      .write.mode("overwrite").partitionBy("cid").parquet(s"$base/ivf_lists")
  }

  /** [[writeIvf]] plus the 1-row training-quality stats file the drift
    * criterion compares against: mean squared assignment distance and
    * count over the TRAINING corpus `e`. Write this form when the index
    * will be appended to; [[ivfDrift]] reads it back. */
  def writeIvfWithStats(idx: IvfIndex, e: DataFrame, base: String): Unit = {
    writeIvf(idx, base)
    Ivf.assignWithDist(e, idx.centroids)
      .agg(avg("d2").as("train_mean_d2"), count(lit(1)).as("n_train"))
      .coalesce(1).write.mode("overwrite").parquet(s"$base/ivf_stats")
  }

  def readIvf(spark: SparkSession, base: String): IvfIndex =
    IvfIndex(
      spark.read.parquet(s"$base/ivf_centroids"),
      Compaction.readLive(spark, s"$base/ivf_lists"))

  /** Incremental append: assign `newVecs` against the FROZEN persisted
    * centroids and append to the cid-partitioned inverted lists — the
    * IndexIVF `add` operation (Jégou 2011 separates train from add
    * exactly so ingestion never retrains). A probe then equals a probe
    * of assign-over-everything with the same centroids row-for-row
    * (AnnIndexSpec pins it); what append does NOT do is move the
    * centroids, so cell BALANCE degrades as the corpus drifts — that
    * staleness is what [[ivfDrift]] measures and a retrain fixes.
    * Caller contract: `newVecs` must be DISJOINT from already-indexed
    * vec_ids — append cannot dedup against the landed lists without
    * reading them, so a replayed overlapping batch lands duplicates
    * (the batch probe tolerates this via its candidate distinct; dedup
    * the ingest upstream, e.g. [[graft.streaming.StreamingDedup]]). */
  def appendIvf(spark: SparkSession, newVecs: DataFrame, base: String): Unit =
    Compaction.appendInto(spark, s"$base/ivf_lists") { lists =>
      clearTakedownSentinel(spark, lists)
      Ivf.assign(newVecs, spark.read.parquet(s"$base/ivf_centroids"))
        .repartition(col("cid")).sortWithinPartitions("vec_id")
        .write.mode("append").partitionBy("cid").parquet(lists)
    }

  /** A fully-retracted inverted file holds a single non-partitioned
    * empty sentinel ([[retractIvf]]'s takedown edge — the only way a
    * parquet file ever sits at the lists ROOT, since every data write
    * is `partitionBy(cid)`). A partitioned append BESIDE it would land
    * `cid=` directories next to that root file and every later read
    * would die with "conflicting directory structures" — the
    * takedown → re-ingest lifecycle must not brick the artifact. So:
    * verify the root files really are the 0-row sentinel (anything
    * else is a corrupted layout — fail loudly rather than delete
    * data), then remove them; the append then rebuilds the partitioned
    * layout from scratch. */
  private def clearTakedownSentinel(spark: SparkSession, lists: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(lists)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val rootParquet = fs.listStatus(p)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    if (rootParquet.isEmpty) return
    // a mixed root-file + cid= layout is already unreadable; this read
    // fails loudly on it, which is the right outcome
    require(spark.read.parquet(lists).isEmpty,
      s"appendIvf: $lists holds non-empty root parquet files — not the " +
        "takedown sentinel; refusing to touch them")
    rootParquet.foreach(s => fs.delete(s.getPath, false))
  }

  /** Remove every inverted-list row of vectors in `ids` (a vec_id
    * frame) — the IndexIVF `remove_ids` operation. Assignments are a
    * pure per-vector function of the FROZEN centroids, so the
    * anti-join equals an assign-over-the-complement rebuild under the
    * same centroids exactly. Centroids and the `ivf_stats` training
    * record are untouched: retraction does not retrain (exactly as
    * append does not), so [[ivfDrift]] keeps measuring against the
    * original training distribution.
    *
    * CELL-scoped, the actual IndexIVF `remove_ids` cost model: each
    * retracted vector lives in exactly ONE cell, so only the `cid=`
    * partitions holding retracted vec_ids are rewritten — at 100 TB a
    * 10-doc takedown moves ≤ 10 of the inverted lists, and untouched
    * cell directories keep their files and mtimes (AnnIndexSpec pins
    * it). [[Compaction.retractWith]] discovers the touched cells from
    * one column-pruned (vec_id → file) scan; the cid directory layout
    * is preserved (basePath read + partitionBy staging), so path-level
    * cell pruning survives the rewrite. */
  def retractIvf(spark: SparkSession, ids: DataFrame, base: String): Unit =
    retractIvfPinned(spark,
      // pinned before the swap — same lineage hazard as [[retractLsh]]
      ids.select("vec_id").distinct().localCheckpoint(), base)

  private def retractIvfPinned(spark: SparkSession, pinned: DataFrame,
      base: String): Unit = {
    val dir = s"$base/ivf_lists"
    // capture the artifact's READ-BACK schema before the swap: the
    // full-takedown sentinel below must carry exactly what a read of
    // the live lists returns (cid as a data column), and deriving it
    // from the artifact itself — instead of a hand-built literal row —
    // keeps any future list column from silently diverging the
    // sentinel's schema from the data's
    val listSchema = Compaction.readLive(spark, dir).schema
    Compaction.retractWith(spark, dir, pinned, "vec_id") { (kept, staging) =>
      kept.repartition(col("cid")).sortWithinPartitions("vec_id")
        .write.mode("overwrite").partitionBy("cid").parquet(staging)
    }
    // the full-takedown edge: retracting EVERY vector leaves no
    // schema-bearing parquet file (a dynamically-partitioned write of
    // an empty frame emits only _SUCCESS), which would brick the
    // artifact for every later read. Restore a non-partitioned empty
    // sentinel — the schema (cid included, now as a data column)
    // survives, reads return an empty frame, probes return no rows as
    // a fully retracted index should, and [[appendIvf]] clears the
    // sentinel before the next partitioned append.
    if (Compaction.fileCount(spark, dir) == 0L)
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], listSchema)
        .write.mode("overwrite").parquet(Compaction.resolve(spark, dir))
  }

  /** The retrain criterion: 1-row frame comparing the mean squared
    * assignment distance of `newVecs` under the persisted centroids
    * against the training-time mean ([[writeIvfWithStats]]).
    * `drift_ratio` ≈ 1 means the new batch looks like the training
    * distribution; past ~1.5 the frozen cells are a poor quantizer for
    * what is arriving and the operator should schedule a retrain.
    * Driver reads ONE bounded row — the same budget as l28's
    * convergence poll. */
  def ivfDrift(spark: SparkSession, newVecs: DataFrame, base: String): DataFrame = {
    val stats = spark.read.parquet(s"$base/ivf_stats")
    Ivf.assignWithDist(newVecs, spark.read.parquet(s"$base/ivf_centroids"))
      .agg(avg("d2").as("new_mean_d2"), count(lit(1)).as("n_new"))
      .crossJoin(broadcast(stats))
      .select(col("n_new"), col("n_train"), col("new_mean_d2"),
        col("train_mean_d2"),
        // a degenerate training set (mean d² = 0, e.g. constant vectors
        // after heavy dedup) must not NULL the ratio and silently
        // disarm the retrain alert: identical new data → 1.0, anything
        // off the centroids → +Inf (always fires)
        when(col("train_mean_d2") === 0d,
          when(col("new_mean_d2") === 0d, lit(1.0))
            .otherwise(lit(Double.PositiveInfinity)))
          .otherwise(col("new_mean_d2") / col("train_mean_d2"))
          .as("drift_ratio"))
  }

  /** Top-k by exact cosine among the vectors in the query's `nprobe`
    * nearest cells. `idx` may be the composed [[buildIvf]] result or a
    * [[readIvf]] read-back. Centroid selection is a k-row broadcast;
    * the inverted-list join carries bare (vec_id, cid) pairs.
    *
    * Fully lazy (no driver action, unlike [[probeLsh]]'s band-key
    * collect): an EMPTY query frame therefore yields an empty result,
    * not an error — validate the query exists upstream if that
    * distinction matters. */
  def probeIvf(idx: IvfIndex, e: DataFrame, query: DataFrame,
      nprobe: Int, topK: Int, excludeId: Long = -1L): DataFrame = {
    val q = query.select(col("v").as("qv"))
    val probeCells = idx.centroids.crossJoin(broadcast(q))
      .withColumn("d2", Ivf.dist2(col("cv"), col("qv")))
      .orderBy(col("d2"), col("cid")).limit(nprobe)
      .select("cid")
    val candidates = idx.lists.join(broadcast(probeCells), "cid")
      .filter(col("vec_id") =!= excludeId).select("vec_id")
    rerank(candidates, e, query, topK)
  }

  /** Batch IVF probe: top-k for a whole query FRAME (qid, v) in one
    * plan — [[probeLshBatch]]'s sibling for the IVF index, completing
    * the batch surface (an evaluation set probes hundreds of queries;
    * N single probes would run N jobs). Cell selection is per qid: the
    * k×|queries| centroid-distance frame (small — k centroids, batch-
    * bounded queries) ranks within each qid by (d2, cid), exactly the
    * single probe's orderBy-limit tie-break, so a batch of one equals
    * [[probeIvf]] row-for-row. Candidates come from ONE equi-join of
    * the cid-partitioned lists against the broadcast (qid, cid) probe
    * set, then a distinct: a healthy inverted file holds each vec_id
    * once, but a replayed [[appendIvf]] over an overlapping vector
    * batch can land a vec_id twice, and an undeduped duplicate would
    * occupy two top-k slots in the re-rank. `excludeSelf` as in
    * [[probeLshBatch]] — pass false for query-id namespaces unrelated
    * to corpus ids. Returns (qid, vec_id, sim_e4); AnnIndexSpec pins a
    * 3-query batch equal to 3 single probes row-for-row. */
  def probeIvfBatch(idx: IvfIndex, e: DataFrame, queries: DataFrame,
      nprobe: Int, topK: Int, excludeSelf: Boolean = true): DataFrame = {
    val qc = idx.centroids
      .crossJoin(broadcast(queries.select(col("qid"), col("v").as("qv"))))
      .withColumn("d2", Ivf.dist2(col("cv"), col("qv")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("d2"), col("cid"))
    val probeCells = qc.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= nprobe).select("qid", "cid")
    val candidates = idx.lists.join(broadcast(probeCells), "cid")
      .filter(if (excludeSelf) col("vec_id") =!= col("qid") else lit(true))
      .select("qid", "vec_id").distinct()
    rerankBatch(candidates, e, queries, topK)
  }

  // ------------------------------------------- int8-quantized IVF

  /** Int8-quantized IVF index: `centroids` as in [[IvfIndex]] (fp64 —
    * k rows, negligible); `lists` = (vec_id, cid, qv array<tinyint>,
    * scale double, norm double) — the inverted file holding QUANTIZED
    * vectors, 4× smaller than the fp64 lists at 100 TB the difference
    * between an index that fits hot storage and one that doesn't. */
  final case class IvfInt8Index(centroids: DataFrame, lists: DataFrame)

  /** l24's exact quantization rule as a frame transform — q = sign(x) ·
    * round(|x| · 127/max|x|), stored as TINYINT — plus the fp64 norm
    * (‖v‖ is 8 bytes/vector and re-deriving it from int8 would fold the
    * quantization error into every cosine denominator). Row-local. */
  def quantizeInt8(e: DataFrame): DataFrame =
    e.withColumn("m", expr("array_max(transform(v, x -> abs(x)))"))
      .withColumn("scale",
        expr("CASE WHEN m = 0 THEN CAST(1.0 AS DOUBLE) ELSE 127.0 / m END"))
      .withColumn("qv", expr(
        """transform(v, x -> CAST(CAST(sign(x) AS BIGINT)
           * CAST(ROUND(abs(x) * scale) AS BIGINT) AS TINYINT))"""))
      .withColumn("norm", sqrt(aggregate(
        transform(col("v"), x => x * x), lit(0d), (a, x) => a + x)))
      .drop("m")

  /** Build the quantized index: sampled-Lloyd centroids (the l16
    * production path), one assignment pass, one row-local quantization
    * pass joined on vec_id (assign's groupBy already partitioned by
    * vec_id, so only the quantized side shuffles — a build-time
    * one-shot). */
  def buildIvfInt8(e: DataFrame, k: Int, iters: Int, n: Long): IvfInt8Index =
    buildIvfInt8From(Ivf.trainSampled(e, k, iters, n), e)

  /** [[buildIvfInt8]] under ALREADY-TRAINED centroids — the shape for a
    * deployment (or the composed l36 catalog query) that shares one
    * trained centroid frame across the fp64 and int8 index builds
    * rather than re-running Lloyd per variant. */
  def buildIvfInt8From(centroids: DataFrame, e: DataFrame): IvfInt8Index = {
    val q = quantizeInt8(e).select("vec_id", "qv", "scale", "norm")
    IvfInt8Index(centroids, Ivf.assign(e, centroids).join(q, "vec_id"))
  }

  /** Same layout discipline as [[writeIvf]]: cid directory-partitioned
    * lists (path-level nprobe pruning), one centroid file. The parquet
    * schema stores `qv` as `array<tinyint>` — the 4× saving is real on
    * disk, not just in memory. */
  def writeIvfInt8(idx: IvfInt8Index, base: String): Unit = {
    idx.centroids.coalesce(1)
      .write.mode("overwrite").parquet(s"$base/ivf8_centroids")
    idx.lists.repartition(col("cid"))
      .sortWithinPartitions("vec_id")
      .write.mode("overwrite").partitionBy("cid").parquet(s"$base/ivf8_lists")
  }

  def readIvfInt8(spark: SparkSession, base: String): IvfInt8Index =
    IvfInt8Index(
      spark.read.parquet(s"$base/ivf8_centroids"),
      Compaction.readLive(spark, s"$base/ivf8_lists"))

  /** Incremental append on the quantized index — [[appendIvf]]'s twin:
    * assign `newVecs` against the FROZEN persisted centroids, quantize
    * row-locally ([[quantizeInt8]] — l24's rule), append to the
    * cid-partitioned int8 lists. Pure per-vector functions of the
    * frozen centroids, so append-then-probe equals a rebuild over the
    * union corpus exactly (QuantizedAnnSpec pins it); the disjoint-ids
    * caller contract and the takedown-sentinel clearing are
    * [[appendIvf]]'s. */
  def appendIvfInt8(spark: SparkSession, newVecs: DataFrame,
      base: String): Unit =
    Compaction.appendInto(spark, s"$base/ivf8_lists") { lists =>
      clearTakedownSentinel(spark, lists)
      buildIvfInt8From(spark.read.parquet(s"$base/ivf8_centroids"), newVecs)
        .lists
        .repartition(col("cid")).sortWithinPartitions("vec_id")
        .write.mode("append").partitionBy("cid").parquet(lists)
    }

  /** [[retractIvf]] on the QUANTIZED index — the same remove_ids
    * contract (every int8 list row is a pure per-vector function of
    * the frozen centroids plus l24's quantization rule, so the
    * anti-join equals a quantize-and-assign rebuild over the
    * complement exactly), the same cell-scoped cost model, the same
    * full-takedown sentinel discipline. Centroids untouched —
    * retraction does not retrain. Without this the recall story had a
    * hole: a takedown against a deployment probing the int8 index
    * would leave the retracted vectors probe-visible. */
  def retractIvfInt8(spark: SparkSession, ids: DataFrame, base: String): Unit =
    retractIvfInt8Pinned(spark,
      ids.select("vec_id").distinct().localCheckpoint(), base)

  private def retractIvfInt8Pinned(spark: SparkSession, pinned: DataFrame,
      base: String): Unit = {
    val dir = s"$base/ivf8_lists"
    // schema captured from the artifact itself — [[retractIvfPinned]]'s
    // sentinel discipline
    val listSchema = Compaction.readLive(spark, dir).schema
    Compaction.retractWith(spark, dir, pinned, "vec_id") { (kept, staging) =>
      kept.repartition(col("cid")).sortWithinPartitions("vec_id")
        .write.mode("overwrite").partitionBy("cid").parquet(staging)
    }
    if (Compaction.fileCount(spark, dir) == 0L)
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], listSchema)
        .write.mode("overwrite").parquet(Compaction.resolve(spark, dir))
  }

  /** Probe the quantized index: cell selection exactly as [[probeIvf]]
    * (fp64 centroids), then an INT8 shortlist pass over the probed
    * cells — the integer dot product `Σ qa·qb` is exact int arithmetic
    * (bounded by 127²·d, no overflow below d ≈ 5·10¹⁴), descaled to an
    * approximate cosine by the stored scales and norms — and only the
    * top `refine · topK` shortlist rows pay the fp64 re-rank against
    * the RAW embedding frame `e`. At scale that means the heavy read
    * is int8 (quarter the bytes of fp64 lists); fp64 vectors are
    * fetched for ~refine·topK rows, not per candidate. Exactness
    * contract (QuantizedAnnSpec): with `refine` large enough to cover
    * every candidate in the probed cells, the result EQUALS
    * [[probeIvf]] row-for-row — the approximation only ever narrows
    * the shortlist, never the scoring of what survives. */
  def probeIvfInt8(idx: IvfInt8Index, e: DataFrame, query: DataFrame,
      nprobe: Int, topK: Int, refine: Int = 4,
      excludeId: Long = -1L): DataFrame = {
    val qq = quantizeInt8(query.select(col("v")))
      .select(col("qv").as("q_qv"), col("scale").as("q_scale"),
        col("norm").as("q_norm"))
    val probeCells = idx.centroids
      .crossJoin(broadcast(query.select(col("v").as("qv2"))))
      .withColumn("d2", Ivf.dist2(col("cv"), col("qv2")))
      .orderBy(col("d2"), col("cid")).limit(nprobe)
      .select("cid")
    graft.functions.NativeVectorExprs.ensureRegistered(e.sparkSession)
    val approx = idx.lists.join(broadcast(probeCells), "cid")
      .filter(col("vec_id") =!= excludeId)
      .crossJoin(broadcast(qq))
      // native codegen'd int8 dot (graft_dot8) — the shortlist pass is
      // the quantized probe's hot loop; an interpreted HOF here would
      // spend the quarter-width read's saving on lambda dispatch
      .withColumn("int_dot", call_function("graft_dot8", col("qv"), col("q_qv")))
      // approx cosine ≈ (int_dot / (scale·q_scale)) / (norm·q_norm);
      // zero-norm vectors rank at 0 rather than NaN-poisoning the sort
      .withColumn("approx_e4", when(
          col("norm") * col("q_norm") === 0d, lit(0L))
        .otherwise(round(lit(10000) * col("int_dot")
          / (col("scale") * col("q_scale"))
          / (col("norm") * col("q_norm"))).cast("long")))
    val shortlist = approx
      .orderBy(col("approx_e4").desc, col("vec_id"))
      .limit(refine * topK)
      .select("vec_id")
    rerank(shortlist, e, query, topK)
  }

  /** Batch int8 probe — [[probeIvfBatch]]'s sibling for the quantized
    * index, completing the batch surface: per-qid cell selection
    * (identical window tie-break), ONE equi-join of the int8 lists
    * against the broadcast (qid, cid) probe set, per-qid int8
    * shortlists of `refine · topK` via a rank window (partitions are
    * per-query candidate sets, never corpus-sized), exact fp64 re-rank
    * of the shortlist union. A batch of one equals [[probeIvfInt8]]
    * row-for-row (QuantizedAnnSpec). `excludeSelf` as in
    * [[probeIvfBatch]]. */
  def probeIvfInt8Batch(idx: IvfInt8Index, e: DataFrame, queries: DataFrame,
      nprobe: Int, topK: Int, refine: Int = 4,
      excludeSelf: Boolean = true): DataFrame = {
    val qq = quantizeInt8(queries.select(col("qid"), col("v")))
      .select(col("qid"), col("qv").as("q_qv"), col("scale").as("q_scale"),
        col("norm").as("q_norm"))
    val qc = idx.centroids
      .crossJoin(broadcast(queries.select(col("qid"), col("v").as("qv2"))))
      .withColumn("d2", Ivf.dist2(col("cv"), col("qv2")))
    val w = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("d2"), col("cid"))
    val probeCells = qc.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= nprobe).select("qid", "cid")
    graft.functions.NativeVectorExprs.ensureRegistered(e.sparkSession)
    val approx = idx.lists.join(broadcast(probeCells), "cid")
      .filter(if (excludeSelf) col("vec_id") =!= col("qid") else lit(true))
      .join(broadcast(qq), "qid")
      .withColumn("int_dot", call_function("graft_dot8", col("qv"), col("q_qv")))
      .withColumn("approx_e4", when(
          col("norm") * col("q_norm") === 0d, lit(0L))
        .otherwise(round(lit(10000) * col("int_dot")
          / (col("scale") * col("q_scale"))
          / (col("norm") * col("q_norm"))).cast("long")))
    val ws = org.apache.spark.sql.expressions.Window.partitionBy("qid")
      .orderBy(col("approx_e4").desc, col("vec_id"))
    val shortlist = approx.withColumn("_sk", row_number().over(ws))
      .filter(col("_sk") <= refine * topK)
      .select("qid", "vec_id").distinct()
    rerankBatch(shortlist, e, queries, topK)
  }

  // ------------------------------------------- versioned retrain / swap

  /** Versioned IVF index lifecycle — the ACTION for [[ivfDrift]]'s
    * alert, closing the drift→retrain loop. Layout under `base`:
    * {{{
    *   base/CURRENT      one line, e.g. "v3" — the live version
    *   base/v1 … base/vN immutable index trees ([[writeIvfWithStats]])
    * }}}
    * [[retrainIvf]] builds v(n+1) COMPLETELY beside the live tree and
    * only then renames a temp pointer over CURRENT — a same-directory
    * rename, atomic on POSIX and HDFS, so a reader either sees the old
    * version or the new one, never a half-written tree. (On an object
    * store without atomic rename the pointer becomes a small manifest
    * written with put-if-absent + generation number — same contract,
    * different primitive.) In-flight probes that already resolved vN
    * keep reading it: version trees are immutable and never deleted by
    * a retrain ([[pruneIvfVersions]] is the separate, explicit GC).
    * Single-writer contract: retrains are a scheduled batch refresh
    * job, not concurrent mutators. Reference analog: the index set is
    * derived, rebuildable state (`sql/init/03_create_indexes.sql:27-93`
    * — drop and rebuild without touching the data). */
  def currentIvfVersion(base: String): Option[Int] = {
    val p = java.nio.file.Paths.get(base, "CURRENT")
    if (!java.nio.file.Files.exists(p)) None
    else Some(new String(java.nio.file.Files.readAllBytes(p),
      java.nio.charset.StandardCharsets.UTF_8).trim.stripPrefix("v").toInt)
  }

  /** The live version tree — every `*Current` accessor resolves the
    * pointer ONCE and then only touches that immutable directory. */
  def currentIvfDir(base: String): String = {
    val v = currentIvfVersion(base).getOrElse(throw new IllegalStateException(
      s"no CURRENT pointer under $base — run initIvfVersioned first"))
    s"$base/v$v"
  }

  private def flipPointer(base: String, v: Int): Unit = {
    val dir = java.nio.file.Paths.get(base)
    java.nio.file.Files.createDirectories(dir)
    val tmp = dir.resolve(".CURRENT.tmp")
    java.nio.file.Files.write(tmp,
      s"v$v\n".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, dir.resolve("CURRENT"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
  }

  /** First-time versioned build: trains on `e`, writes `base/v1` with
    * drift stats, points CURRENT at it. Returns the version dir. */
  def initIvfVersioned(e: DataFrame, k: Int, iters: Int, base: String): String = {
    require(currentIvfVersion(base).isEmpty,
      s"initIvfVersioned: $base already has a CURRENT pointer — use retrainIvf")
    val dir = s"$base/v1"
    writeIvfWithStats(buildIvf(e, k, iters, e.count()), e, dir)
    flipPointer(base, 1)
    dir
  }

  /** Retrain-and-atomic-swap: train fresh centroids on `e` (the corpus
    * as it stands NOW, drifted appends included), write the complete
    * v(n+1) tree with fresh drift stats, then flip CURRENT. The old
    * tree stays on disk for in-flight readers. Returns the new version
    * dir. After a retrain on the drifted corpus, [[ivfDriftCurrent]]
    * of that same corpus reads ≈ 1 by construction — the staleness
    * [[ivfDrift]] measured is gone (AnnIndexSpec pins both this and
    * probe continuity across the swap on unchanged data). */
  def retrainIvf(e: DataFrame, k: Int, iters: Int, base: String): String = {
    val cur = currentIvfVersion(base).getOrElse(throw new IllegalStateException(
      s"retrainIvf: no CURRENT under $base — run initIvfVersioned first"))
    val dir = s"$base/v${cur + 1}"
    writeIvfWithStats(buildIvf(e, k, iters, e.count()), e, dir)
    flipPointer(base, cur + 1)
    dir
  }

  /** [[retrainIvf]] with k from the shared [[Ivf.cellCount]] selector —
    * a retrain re-sizes the cell grid to the corpus as it is NOW, which
    * is half the point of retraining (appends grow cells; k∝n restores
    * the n²/2k pair bound the semantic-dedup path relies on). */
  def retrainIvf(e: DataFrame, iters: Int, base: String): String =
    retrainIvf(e, Ivf.cellCount(e.count()), iters, base)

  def readIvfCurrent(spark: SparkSession, base: String): IvfIndex =
    readIvf(spark, currentIvfDir(base))

  def appendIvfCurrent(spark: SparkSession, newVecs: DataFrame, base: String): Unit =
    appendIvf(spark, newVecs, currentIvfDir(base))

  def ivfDriftCurrent(spark: SparkSession, newVecs: DataFrame, base: String): DataFrame =
    ivfDrift(spark, newVecs, currentIvfDir(base))

  /** Explicit GC for superseded version trees: deletes every version
    * older than the newest `keep` (default 2 — live + one rollback).
    * Never touches CURRENT's tree: `keep` is clamped to ≥1 and the
    * pointer's version is always retained even if an operator points
    * CURRENT at an old version manually (rollback). Driver-side
    * directory walk — bounded by the version count, not data size. */
  def pruneIvfVersions(base: String, keep: Int = 2): Seq[Int] = {
    import scala.jdk.CollectionConverters._
    val dir = java.nio.file.Paths.get(base)
    if (!java.nio.file.Files.isDirectory(dir)) return Nil
    val versions = java.nio.file.Files.list(dir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d+") => s.drop(1).toInt }
      .toSeq.sorted
    val live = currentIvfVersion(base)
    val doomed = versions.dropRight(keep.max(1))
      .filterNot(live.contains)
    doomed.foreach { v =>
      val root = dir.resolve(s"v$v")
      java.nio.file.Files.walk(root).iterator().asScala.toSeq
        .sortBy(-_.getNameCount)
        .foreach(java.nio.file.Files.delete)
    }
    doomed
  }

  // ------------------------------------------------------------- shared

  /** Exact-cosine re-rank of a bare-id candidate frame against the
    * vector table: vectors join back only for candidates, the query
    * broadcasts as one row, and the top-k is a TakeOrdered (no global
    * sort). Shared verbatim by both probe paths and the composed
    * catalog queries.
    *
    * The contract is a ≤1-row query frame (empty → empty result, the
    * documented lazy trade). A multi-row query would silently BLEND:
    * every candidate scores against every query row and the top-k
    * means nothing. Guarded lazily — a 1-row aggregate over the (tiny)
    * query frame rides along as a broadcast scalar and `assert_true`
    * fails the job loudly at execution, keeping plan construction
    * action-free; the require message directs multi-row callers to the
    * batch probes. */
  private[operators] def rerank(candidates: DataFrame, e: DataFrame,
      query: DataFrame, topK: Int): DataFrame = {
    val guard = query.agg(assert_true(count(lit(1)) <= 1,
      lit("rerank: query frame must have at most 1 row — use " +
        "probeLshBatch/probeIvfBatch for multi-row query sets")).as("_g"))
    candidates.join(e, "vec_id")
      .crossJoin(broadcast(query.select(col("v").as("qv"))))
      // assert_true yields NULL on success, so the filter keeps every
      // row — but REFERENCING _g keeps column pruning from deleting the
      // guard expression (a bare drop("_g") optimizes the assert away)
      .crossJoin(broadcast(guard))
      .filter(col("_g").isNull).drop("_g")
      .withColumn("sim_e4",
        round(lit(10000) * VectorOps.cosineNative(col("v"), col("qv"))).cast("long"))
      .select("vec_id", "sim_e4")
      .orderBy(col("sim_e4").desc, col("vec_id"))
      .limit(topK)
  }
}
