package graft.operators

import graft.{DQ, Tables}
import graft.functions.Sampling
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus sampling / packing operators — the data-mixing stages of an
  * LLM training-data pipeline (no reference analog; north-star extension
  * like the rest of the L-series).
  *
  * Scale design (100 TB):
  *  - l20's sample predicate is a pure per-row hash compare evaluated at
  *    the scan — no shuffle, no RNG state, and the SAME rows are chosen
  *    on any cluster size or re-run (md5 of a stable key, not
  *    `rand()`). Changing a stratum's rate rescales its sample
  *    monotonically (a kept doc stays kept when the rate increases),
  *    which is what lets a 100 TB corpus be re-mixed incrementally.
  *  - l21 packs per SOURCE shard: one shuffle to co-locate each shard,
  *    then a per-partition running offset — the concat-and-chunk layout
  *    used for pretraining batches. No global sequence number is ever
  *    assigned, so shards pack independently and in parallel.
  */
object SamplingQueries {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** L5's BPE-ish pre-tokenizer count, shared by l21. */
  private[operators] def nTok(c: org.apache.spark.sql.Column) =
    size(regexp_extract_all(lower(c),
      lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long")

  /** Per-language keep-rates as 4-hex-digit md5-prefix thresholds
    * (lexicographic compare == numeric compare on fixed-width lowercase
    * hex; 'zzzz' > 'ffff' keeps everything). en is downsampled hardest,
    * zh kept whole — the usual rebalancing direction. */
  private[operators] val thresholds = Seq(
    "en" -> "2000", "de" -> "4000", "es" -> "8000", "fr" -> "c000", "zh" -> "zzzz")

  /** L20 — stratified deterministic sampling: keep a per-language share
    * of documents chosen by an md5-prefix threshold on (doc_id, lang).
    * Output is per-stratum accounting: population, sample size, realized
    * rate, and an identity checksum over the chosen doc_ids so the gate
    * pins WHICH rows were sampled, not just how many.
    */
  val l20 = DQ(
    "l20_stratified_sample",
    (s, d) => {
      val dd = docs(s, d)
      val sampled = dd
        .filter(Sampling.stratifiedKeep(col("doc_id"), col("lang"), thresholds))
        .groupBy("lang")
        .agg(count(lit(1)).as("n_sampled"), sum("doc_id").as("doc_id_sum"))
      dd.groupBy("lang").agg(count(lit(1)).as("n_total"))
        .join(sampled, Seq("lang"), "left")
        .select(
          col("lang"), col("n_total"),
          coalesce(col("n_sampled"), lit(0L)).as("n_sampled"),
          round(coalesce(col("n_sampled"), lit(0L)) * lit(10000.0) / col("n_total"))
            .cast("long").as("samp_bp"),
          coalesce(col("doc_id_sum"), lit(0L)).as("doc_id_sum"))
        .orderBy("lang")
    },
    Some("""WITH t AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total
                       FROM documents GROUP BY 1),
                 s AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_sampled,
                              CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
                       FROM documents
                       WHERE substring(md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 4) <
                         CASE lang WHEN 'en' THEN '2000' WHEN 'de' THEN '4000'
                                   WHEN 'es' THEN '8000' WHEN 'fr' THEN 'c000'
                                   WHEN 'zh' THEN 'zzzz' ELSE '0000' END
                       GROUP BY 1)
            SELECT t.lang AS lang, n_total, COALESCE(n_sampled, 0) AS n_sampled,
              CAST(ROUND(COALESCE(n_sampled, 0) * 10000.0 / n_total) AS BIGINT) AS samp_bp,
              COALESCE(doc_id_sum, 0) AS doc_id_sum
            FROM t LEFT JOIN s ON t.lang = s.lang ORDER BY lang"""))

  private val ctx = 256L // context-window length in pre-tokenizer tokens

  /** Per-source row bound above which [[packingOffsets]] switches from
    * the serial per-source window to the two-level prefix sum: 1M rows
    * is a comfortable single-task cumsum (a window over ≤1M narrow rows
    * is milliseconds), so below it the extra sub-total aggregate +
    * broadcast would be pure overhead. */
  private[graft] val PackShardRowLimit = 1L << 20

  /** Cataloged packing-offset path with the scale selector: per-doc
    * (source, doc_id, n_tok, start). Sources whose shards stay under
    * `maxShardRows` pack with the serial per-source running window —
    * one task per source, the normal case (pretraining shards are sized
    * for exactly this); if ANY source exceeds the bound, the two-level
    * distributed prefix sum ([[packedOffsets]]) engages with sub-shards
    * of `maxShardRows` ids, spec-pinned offset-identical to the serial
    * definition (TemporalSamplingSpec).
    *
    * The selector's decision is a PRE-PLAN driver action (a plan's
    * shape cannot branch on its own data): one aggregate over the
    * explicitly-pruned `source` column, returning a single row — the
    * same bounded-action budget as m1's refresh key, but unlike the
    * round-3 plantedOffset case it cannot move in-plan, because it
    * picks WHICH plan to build. At 100 TB the count comes from shard
    * catalog metadata instead (pass the known bound via
    * `maxShardRows`' caller); the sub-shard width keys on doc_id
    * ranges, so parallelism assumes roughly dense ids (true for
    * generated corpus ids; a sparse id space just yields smaller
    * subs). */
  private[graft] def packingOffsets(
      dd: org.apache.spark.sql.DataFrame,
      maxShardRows: Long = PackShardRowLimit): org.apache.spark.sql.DataFrame = {
    val maxShard = dd.select("source")
      .groupBy("source").agg(count(lit(1)).as("n"))
      .agg(coalesce(max("n"), lit(0L))).first().getLong(0)
    if (maxShard <= maxShardRows) {
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dd.select(col("source"), col("doc_id"), nTok(col("text")).as("n_tok"))
        .withColumn("start", sum("n_tok").over(w) - col("n_tok"))
    } else
      packedOffsets(dd, subSize = maxShardRows)
        .select("source", "doc_id", "n_tok", "start")
  }

  /** L21 — sequence packing: concat-and-chunk each source shard's
    * documents (ordered by doc_id) into fixed 256-token context windows.
    * A document starts at its shard's running token offset; its chunk is
    * `offset div ctx`, and it straddles a boundary when its first and
    * last token fall in different chunks. Output per shard: documents,
    * tokens, chunks containing a document start, boundary-straddling
    * documents, total chunk count, and realized fill rate.
    *
    * Offsets come from [[packingOffsets]] — the serial window while
    * shards stay under [[PackShardRowLimit]] rows (the gate-scale
    * plan), the two-level distributed prefix sum beyond it.
    */
  val l21 = DQ(
    "l21_pack_sequences",
    (s, d) => {
      packingOffsets(docs(s, d))
        .withColumn("cum", col("start") + col("n_tok"))
        .groupBy("source")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_tok").as("total_tokens"),
          countDistinct(expr(s"(cum - n_tok) div ${ctx}L")).as("n_start_chunks"),
          sum(when(col("n_tok") > 0 &&
              expr(s"(cum - n_tok) div ${ctx}L") =!= expr(s"(cum - 1) div ${ctx}L"), 1L)
            .otherwise(0L)).as("n_straddlers"))
        .withColumn("n_chunks", expr(s"(total_tokens + ${ctx - 1}L) div ${ctx}L"))
        .withColumn("fill_bp",
          round(col("total_tokens") * lit(10000.0) / (col("n_chunks") * lit(ctx)))
            .cast("long"))
        .orderBy("source")
    },
    Some("""WITH d AS (
              SELECT source, doc_id,
                CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
                  AS BIGINT) AS n_tok
              FROM documents),
            c AS (
              SELECT source, n_tok,
                SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
              FROM d),
            g AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(n_tok) AS BIGINT) AS total_tokens,
                CAST(COUNT(DISTINCT (cum - n_tok) // 256) AS BIGINT) AS n_start_chunks,
                CAST(SUM(CASE WHEN n_tok > 0 AND (cum - n_tok) // 256 <> (cum - 1) // 256
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_straddlers
              FROM c GROUP BY 1)
            SELECT source, n_docs, total_tokens, n_start_chunks, n_straddlers,
              CAST((total_tokens + 255) // 256 AS BIGINT) AS n_chunks,
              CAST(ROUND(total_tokens * 10000.0 / (((total_tokens + 255) // 256) * 256))
                AS BIGINT) AS fill_bp
            FROM g ORDER BY source"""))

  /** L22 — holdout splitting: partition the corpus into train / val /
    * test by DISJOINT md5-prefix ranges (~75 / 12.5 / 12.5), keyed on
    * (doc_id, "split") — a different salt than l20's sampling key, so
    * sampling and splitting are independent hash draws. Every document
    * lands in exactly one split by construction (the ranges cover the
    * hex space), membership is stable across re-runs and cluster sizes,
    * and — because the hash keys the DOCUMENT — a doc can never leak
    * between train and test no matter where or when it is processed.
    * Output per (lang, split): count and doc_id checksum.
    */
  val l22 = DQ(
    "l22_holdout_split",
    (s, d) => {
      docs(s, d)
        .withColumn("split", Sampling.splitLabel(col("doc_id"), lit("split"),
          Seq("train" -> "c000", "val" -> "e000"), last = "test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n"), sum("doc_id").as("doc_id_sum"))
        .orderBy("lang", "split")
    },
    Some("""SELECT lang,
              -- the NULL branch mirrors Sampling.splitLabel exactly: a
              -- null key draws NULL and labels NULL (never 'test'), so
              -- the two definitions cannot diverge if doc_id ever
              -- admits nulls (today it is non-null)
              CASE WHEN h IS NULL THEN NULL
                   WHEN h < 'c000' THEN 'train'
                   WHEN h < 'e000' THEN 'val' ELSE 'test' END AS split,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
            FROM (SELECT lang, doc_id,
                    substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 4) AS h
                  FROM documents)
            GROUP BY 1, 2 ORDER BY lang, split"""))

  /** L23 — the composed mixing manifest: ONE scan runs the full
    * train-data assembly decision — l19's curation rule (canonical +
    * quality), l20's stratified sampling draw, l22's holdout split —
    * and emits the per-(lang, split) manifest a training run consumes:
    * surviving documents, their token budget (l5's pre-tokenizer), and
    * an identity checksum. Composition order mirrors production: curate
    * first (duplicates/low-quality never reach sampling), sample the
    * survivors, then split — the split hash is salt-independent of the
    * sampling hash, so the draw cannot bias the split.
    *
    * Plan shape: the only shuffle before the rollup is l19's canonical
    * window (hash-partitioned by content hash, exactly L1's groupBy
    * shuffle); sampling and splitting stay per-row predicates on the
    * scan side of it.
    */
  val l23 = DQ(
    "l23_mix_manifest",
    (s, d) => {
      LlmQueries.withStopBp(docs(s, d))
        .withColumn("canonical_id",
          min("doc_id").over(Window.partitionBy(LlmQueries.normHash)))
        .filter(col("doc_id") === col("canonical_id") && LlmQueries.qualityKeep)
        .filter(Sampling.stratifiedKeep(col("doc_id"), col("lang"), thresholds))
        .withColumn("split", Sampling.splitLabel(col("doc_id"), lit("split"),
          Seq("train" -> "c000", "val" -> "e000"), last = "test"))
        .groupBy("lang", "split")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(nTok(col("text"))).as("n_tokens"),
          sum("doc_id").as("doc_id_sum"))
        .orderBy("lang", "split")
    },
    Some("""SELECT lang,
              -- NULL branch mirrors splitLabel (see l22's oracle note)
              CASE WHEN sh IS NULL THEN NULL
                   WHEN sh < 'c000' THEN 'train'
                   WHEN sh < 'e000' THEN 'val' ELSE 'test' END AS split,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
              CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum
            FROM (
              SELECT lang, doc_id,
                substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 4) AS sh,
                CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))
                  AS BIGINT) AS n_tok
              FROM (
                SELECT lang, doc_id, text, n_chars,
                  MIN(doc_id) OVER (PARTITION BY sha256(lower(trim(text)))) AS canonical_id,
                  CAST(ROUND(len(list_filter(string_split_regex(lower(text), '\s+'),
                         t -> list_contains(['the','a','value','table'], t)))
                       * 10000.0 / len(string_split_regex(lower(text), '\s+'))) AS BIGINT)
                    AS stop_bp
                FROM documents)
              WHERE doc_id = canonical_id AND n_chars >= 200 AND stop_bp < 2500
                AND substring(md5(CAST(doc_id AS VARCHAR) || ':' || lang), 1, 4) <
                  CASE lang WHEN 'en' THEN '2000' WHEN 'de' THEN '4000'
                            WHEN 'es' THEN '8000' WHEN 'fr' THEN 'c000'
                            WHEN 'zh' THEN 'zzzz' ELSE '0000' END)
            GROUP BY 1, 2 ORDER BY lang, split"""))

  /** L25 — decontamination screening: flag every TRAIN document that
    * shares at least one distinctive word 5-gram with any TEST document
    * — the published train/test-overlap method (the n-gram collision
    * screens reported with GPT-2/GPT-3 and PaLM; 8–13-gram windows at
    * web scale, 5 here to match the synthetic corpus' short docs). A
    * contaminated holdout silently inflates eval numbers, so this gate
    * runs before l23's manifest is trusted.
    *
    * Splits are l22's hash ranges (same salt, so this screens the
    * ACTUAL holdout), n-grams the same tokenization as l15. Scale
    * shape: n-gram sets are per-row map-side work ending in ONE
    * equi-join shuffle keyed on the gram (the gate form keys on the
    * string for oracle portability; [[decontaminate]]'s
    * `hashedGrams = true` sibling is the 100 TB form — 8-byte xxhash64
    * keys on the wire, spec-pinned to the identical flag set); the
    * test side is ~12.5% of the corpus and the
    * contaminated-id dedup is bounded by the matches. No all-pairs
    * anywhere. Output per language: train size, contaminated count,
    * rate, and the identity checksum pinning WHICH docs are flagged.
    */
  /** The decontamination rollup shared by [[l25]] (string gram keys —
    * oracle-portable) and the 100 TB form (`hashedGrams = true`:
    * `xxhash64(gram)` join keys, so the equi-join shuffle carries 8
    * bytes per gram instead of a ~40-byte string — the wire-size trim
    * the l25 scaladoc promises). A 64-bit collision can only ADD a
    * false flag, never lose a true one, and needs two distinct grams
    * hashing equal: at 10¹² distinct grams (a 100 TB corpus) the
    * birthday bound puts ~0.03 expected collisions across the WHOLE
    * join — negligible against the screen's own n-gram heuristic.
    * TemporalSamplingSpec pins both forms to the identical flag set on
    * sf0.01. */
  /** THE distinctive-word-5-gram stage, in one place: each row of `df`
    * (must carry `text`) explodes to its DISTINCT lowercase word
    * 5-grams as (keep..., gram) — map-side only, no shuffle. Batch
    * [[decontaminate]] and the streaming ingest screen
    * ([[graft.streaming.StreamingDecontam]]) both derive from this
    * definition, so the two can never disagree on what an overlapping
    * gram is. `hashed = true` is the 100 TB wire format (xxhash64 —
    * see [[decontaminate]]'s collision analysis). */
  private[graft] def docGrams(df: DataFrame, keep: Seq[String],
      hashed: Boolean): DataFrame = docGramsK(df, keep, 5, hashed)

  /** [[docGrams]] at any width: each doc's DISTINCT word k-grams (one
    * row per distinct gram per doc), the map-side stage every gram
    * screen shares — l25/L30 at k = 5, the verbatim-repeat screen at
    * k = [[SpanK]]. Same tokenization as [[spanGrams]] by construction. */
  private[graft] def docGramsK(df: DataFrame, keep: Seq[String], k: Int,
      hashed: Boolean): DataFrame = {
    // gram-once reuse (the sketch-once discipline's span sibling): a
    // frame carrying the reserved positional SpanK-gram-hash array —
    // the release gates' pinned shard — explodes its per-doc DISTINCT
    // hashes instead of re-running the 15-token concat+hash per
    // consumer. Same hash set per doc (xxhash64 over distinct strings
    // ≡ distinct over per-position hashes; a 64-bit collision would
    // only drop a duplicate row every downstream dedups anyway).
    if (hashed && k == SpanK && df.columns.contains(LlmQueries.PreGrams))
      df.select(keep.map(col) :+
        explode(array_distinct(col(LlmQueries.PreGrams))).as("gram"): _*)
    else if (hashed) {
      // native kernel, any width: same distinct hash set per doc as the
      // string-distinct-then-hash form (see the pre-branch note)
      graft.functions.NativeTextExprs.ensureRegistered(df.sparkSession)
      df.withColumn("ta", LlmQueries.tokensOf(df))
        .filter(size(col("ta")) >= k)
        .select(keep.map(col) :+
          explode(array_distinct(
            call_function("graft_gram_hash64", col("ta"), lit(k)))).as("gram"): _*)
    } else {
      // graft_grams: the same strings, built as zero-copy views of one
      // space-joined buffer per doc (NativeTextExprs.GramStrings)
      graft.functions.NativeTextExprs.ensureRegistered(df.sparkSession)
      df.withColumn("ta", LlmQueries.tokensOf(df))
        .filter(size(col("ta")) >= k)
        .select(keep.map(col) :+
          explode(array_distinct(
            call_function("graft_grams", col("ta"), lit(k)))).as("gram"): _*)
    }
  }

  /** The reserved positional [[SpanK]]-gram-hash array over a
    * pre-tokenized column — one xxhash64 per gram position, null when
    * the doc has no SpanK-gram (exactly the rows [[spanGrams]]'
    * size-filter drops). Computed once into a pinned frame
    * ([[LlmQueries.withGatePre]]); [[docGramsK]] (distinct form) and
    * [[spanGrams]] (positional form) both project it. */
  private[graft] def spanGramHashes(toks: String): org.apache.spark.sql.Column =
    call_function("graft_gram_hash64", col(toks), lit(SpanK))

  private[graft] def decontaminate(
      labeled: DataFrame, hashedGrams: Boolean): DataFrame = {
    val grams = docGrams(labeled, Seq("lang", "doc_id", "split"), hashedGrams)
    val testGrams = grams.filter(col("split") === "test")
      .select("gram").distinct()
    val contaminated = grams.filter(col("split") === "train")
      .join(testGrams, Seq("gram"), "left_semi")
      .select("lang", "doc_id").distinct()
    contamRollup(labeled, contaminated)
  }

  /** The per-language contamination accounting shared by the exact
    * ([[decontaminate]]) and Bloom-prefiltered ([[decontaminateBloom]])
    * screens: a distinct (lang, doc_id) contaminated frame → train
    * counts, contamination rate (bp), flagged-id checksum. */
  private def contamRollup(labeled: DataFrame,
      contaminated: DataFrame): DataFrame = {
    val agg = contaminated.groupBy("lang")
      .agg(count(lit(1)).as("n_contaminated"), sum("doc_id").as("doc_id_sum"))
    labeled.filter(col("split") === "train")
      .groupBy("lang").agg(count(lit(1)).as("n_train"))
      .join(agg, Seq("lang"), "left")
      .select(col("lang"), col("n_train"),
        coalesce(col("n_contaminated"), lit(0L)).as("n_contaminated"),
        round(coalesce(col("n_contaminated"), lit(0L)) * lit(10000.0) / col("n_train"))
          .cast("long").as("contam_bp"),
        coalesce(col("doc_id_sum"), lit(0L)).as("doc_id_sum"))
      .orderBy("lang")
  }

  /** L35 core — the 100 TB MEMORY shape of decontamination: a Bloom
    * prefilter in front of the exact gram join. The exact screen
    * ([[decontaminate]]) broadcasts the eval set's distinct grams as a
    * hash relation — at a 10⁹-gram eval suite that is tens of GB per
    * executor; the membership SKETCH of the same set at ~10 bits/item
    * is ~1 GB, two orders denser. So: build the Bloom over the eval
    * grams' xxhash64 (Spark's own [[
    * org.apache.spark.sql.catalyst.expressions.aggregate
    * .BloomFilterAggregate]], surfaced by
    * [[graft.functions.BloomExprs]] — the identical machinery the
    * optimizer injects as runtime filters), ship it as a SCALAR
    * SUBQUERY (one broadcast per executor, plan stays action-free),
    * and row-locally drop every train gram the sketch rules out —
    * typically ~all of them. Only the surviving sliver pays the exact
    * semi-join, which removes the sketch's false positives: Bloom has
    * NO false negatives, so prefilter + exact verify ≡ the exact
    * screen, row for row — that identity is the DQ's oracle (same SQL
    * family as l25) and the spec's pin.
    *
    * Scale shape: the prefilter is a per-row hash probe at the scan
    * (no shuffle, no state); the exact join's build side is unchanged
    * but its STREAM side shrinks to the candidate sliver — the shuffle
    * the screen pays becomes proportional to the contamination rate,
    * not the corpus. */
  private[graft] def decontaminateBloom(labeled: DataFrame): DataFrame = {
    val grams = docGrams(labeled, Seq("lang", "doc_id", "split"), hashed = false)
    val testGrams = grams.filter(col("split") === "test")
      .select("gram").distinct()
    decontaminateBloomFrom(labeled,
      grams.filter(col("split") === "train"), testGrams, evalBloom(testGrams))
  }

  /** The eval-set membership sketch as a ONE-ROW binary frame — sized
    * for a ~1% FP rate at 10⁶ eval grams (9.6 bits/item, so 9 600 000
    * bits — the previous 2²³ constant worked out to 8.4 bits/item,
    * ~2.2% FP, double the budgeted verify-join traffic); FP rate only
    * costs verify-join traffic, never correctness. */
  private[graft] def evalBloom(testGrams: DataFrame): DataFrame = {
    graft.functions.BloomExprs.ensureRegistered(testGrams.sparkSession)
    testGrams.agg(
      call_function("graft_bloom_agg", xxhash64(col("gram")),
        lit(1000000L), lit(9600000L)).as("bf"))
  }

  /** The probe half of [[decontaminateBloom]], factored so the sketch
    * (and the exact verify set) can come from PERSISTED artifacts
    * ([[writeDecontamIndex]]) instead of an in-job recompute —
    * identical plan from the inputs down, so screen-from-disk cannot
    * drift from the composed DQ. */
  private[graft] def decontaminateBloomFrom(labeled: DataFrame,
      trainGrams: DataFrame, testGrams: DataFrame,
      bloom: DataFrame): DataFrame = {
    graft.functions.BloomExprs.ensureRegistered(labeled.sparkSession)
    val candidates = trainGrams
      .filter(call_function("graft_might_contain", bloom.scalar(),
        xxhash64(col("gram"))))
    val contaminated = candidates
      .join(testGrams, Seq("gram"), "left_semi")
      .select("lang", "doc_id").distinct()
    contamRollup(labeled, contaminated)
  }

  /** Persist the decontamination screen's two artifacts — built ONCE
    * per eval-suite release, consumed by every shard screen and the
    * streaming gate alike: the distinct eval grams (the exact-verify
    * set, sorted for row-group locality) and the 1-row Bloom sketch.
    * The sketch is derived state; a reader that trusts only the gram
    * parquet can rebuild it with [[evalBloom]] at one small-frame
    * aggregation's cost. */
  def writeDecontamIndex(testGrams: DataFrame, base: String): Unit = {
    testGrams.sortWithinPartitions("gram")
      .write.mode("overwrite").parquet(s"$base/eval_grams")
    evalBloom(testGrams).coalesce(1)
      .write.mode("overwrite").parquet(s"$base/eval_bloom")
  }

  def readDecontamGrams(s: SparkSession, base: String): DataFrame =
    s.read.parquet(s"$base/eval_grams")

  def readDecontamBloom(s: SparkSession, base: String): DataFrame =
    s.read.parquet(s"$base/eval_bloom")

  private[graft] def splitLabeled(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .withColumn("split", Sampling.splitLabel(col("doc_id"), lit("split"),
        Seq("train" -> "c000", "val" -> "e000"), last = "test"))

  /** One oracle for BOTH decontamination screens: l35's Bloom
    * prefilter + exact verify is row-identical to the exact screen by
    * the no-false-negatives argument, so the same independent DuckDB
    * formulation gates both — the strongest possible pin that the
    * sketch path lost nothing. */
  private val decontamOracle = """WITH labeled AS (
              SELECT lang, doc_id, text,
                -- NULL branch mirrors splitLabel (see l22's oracle note)
                CASE WHEN h IS NULL THEN NULL
                     WHEN h < 'c000' THEN 'train'
                     WHEN h < 'e000' THEN 'val' ELSE 'test' END AS split
              FROM (SELECT lang, doc_id, text,
                      substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 4) AS h
                    FROM documents)),
            toks AS (
              SELECT lang, doc_id, split,
                string_split_regex(lower(text), '\s+') AS ta
              FROM labeled),
            grams AS (
              SELECT lang, doc_id, split,
                unnest(list_distinct(list_transform(range(len(ta) - 4),
                  i -> array_to_string(list_slice(ta, i + 1, i + 5), ' ')))) AS gram
              FROM toks WHERE len(ta) >= 5),
            contaminated AS (
              SELECT DISTINCT lang, doc_id FROM grams
              WHERE split = 'train'
                AND gram IN (SELECT gram FROM grams WHERE split = 'test')),
            c AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_c,
                         CAST(SUM(doc_id) AS BIGINT) AS s_c
                  FROM contaminated GROUP BY 1),
            t AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_train
                  FROM labeled WHERE split = 'train' GROUP BY 1)
            SELECT t.lang AS lang, n_train,
              COALESCE(n_c, 0) AS n_contaminated,
              CAST(ROUND(COALESCE(n_c, 0) * 10000.0 / n_train) AS BIGINT) AS contam_bp,
              COALESCE(s_c, 0) AS doc_id_sum
            FROM t LEFT JOIN c ON t.lang = c.lang ORDER BY lang"""

  val l25 = DQ(
    "l25_decontaminate",
    (s, d) => decontaminate(splitLabeled(s, d), hashedGrams = false),
    Some(decontamOracle))

  /** L35 — the Bloom-prefiltered decontamination screen (see
    * [[decontaminateBloom]]); gated against the SAME oracle as l25
    * because the two are answer-identical by construction. */
  val l35 = DQ(
    "l35_decontam_bloom",
    (s, d) => decontaminateBloom(splitLabeled(s, d)),
    Some(decontamOracle))

  /** The 100 TB form of l21's running offset: a two-level distributed
    * prefix sum (the same decomposition as w4's partitioned window with
    * carry-in). Documents sub-shard on contiguous `doc_id div subSize`
    * ranges; per-sub token totals aggregate into a TINY frame whose
    * per-source prefix gives each sub-shard's base offset; the base
    * broadcasts back and the cumsum runs WITHIN each (source, sub)
    * partition — identical offsets to the serial per-source window,
    * with parallelism = number of sub-shards instead of 1 task per
    * source. Returns (source, sub, doc_id, n_tok, start).
    *
    * At real scale the `base` frame would be checkpointed so the scan's
    * tokenization isn't re-run for the totals branch; at catalog scale
    * the recompute is cheaper than the materialization.
    */
  private[graft] def packedOffsets(
      docs: org.apache.spark.sql.DataFrame, subSize: Long)
      : org.apache.spark.sql.DataFrame = {
    val base = docs
      .select(col("source"), col("doc_id"), nTok(col("text")).as("n_tok"))
      .withColumn("sub", expr(s"doc_id div ${subSize}L"))
    val subTotals = base.groupBy("source", "sub").agg(sum("n_tok").as("sub_tok"))
    // prefix over sub-shards: bounded by #subs per source, so the
    // per-source ordering here is a tiny-frame window, never data-sized
    val wSub = Window.partitionBy("source").orderBy("sub")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = subTotals
      .withColumn("sub_base", coalesce(sum("sub_tok").over(wSub), lit(0L)))
      .select("source", "sub", "sub_base")
    val wIn = Window.partitionBy("source", "sub").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(offsets), Seq("source", "sub"))
      .withColumn("start", col("sub_base") + sum("n_tok").over(wIn) - col("n_tok"))
      .select("source", "sub", "doc_id", "n_tok", "start")
  }

  // ------------------------------------------------------- substring dedup

  /** Span gram width: 15 tokens. Lee et al. use 50 BPE tokens on web
    * text; 15 word tokens realizes the same "long verbatim repeat"
    * criterion on this corpus' ~25-40-word documents (the planted
    * near-dup copies share their source's whole tail, far past 15;
    * independent word-soup docs share none — ~30-word vocabulary makes
    * a chance 15-gram repeat impossible in practice). */
  private[graft] val SpanK = 15

  /** POSITIONAL k-grams (unlike [[docGrams]], positions are kept and
    * NOT dedup'd — span merging needs every occurrence site). */
  private[graft] def spanGrams(df: DataFrame, k: Int, hashed: Boolean): DataFrame = {
    // positional form of [[docGramsK]]'s gram-once reuse: posexplode of
    // the reserved hash array is byte-identical to hashing after the
    // string posexplode (xxhash64 applied per position either way)
    if (hashed && k == SpanK && df.columns.contains(LlmQueries.PreGrams))
      df.select(col("lang"), col("doc_id"),
          posexplode(col(LlmQueries.PreGrams)))
        .withColumnRenamed("col", "gram")
    else if (hashed) {
      graft.functions.NativeTextExprs.ensureRegistered(df.sparkSession)
      df.withColumn("ta", LlmQueries.tokensOf(df))
        .filter(size(col("ta")) >= k)
        .select(col("lang"), col("doc_id"),
          posexplode(call_function("graft_gram_hash64", col("ta"), lit(k))))
        .withColumnRenamed("col", "gram")
    } else {
      graft.functions.NativeTextExprs.ensureRegistered(df.sparkSession)
      df.withColumn("ta", LlmQueries.tokensOf(df))
        .filter(size(col("ta")) >= k)
        .select(col("lang"), col("doc_id"),
          posexplode(call_function("graft_grams", col("ta"), lit(k))))
        .withColumnRenamed("col", "gram")
    }
  }

  /** L33 core — substring-level deduplication (Lee et al. 2022,
    * arXiv:2107.06499 "Deduplicating Training Data Makes Language
    * Models Better", the ExactSubstr criterion): find every maximal
    * token span repeated VERBATIM across ≥ 2 distinct documents, the
    * granularity document-level dedup (l1/l9) cannot see — two mostly
    * different pages quoting the same boilerplate paragraph.
    *
    * The published implementation is a suffix array over the
    * concatenated corpus — inherently sequential and memory-resident.
    * The distributed re-expression: positional k-gram fingerprints →
    * one hash agg keeps grams seen in ≥ 2 docs → occurrences of those
    * grams, merged per document into maximal spans (overlapping or
    * adjacent [pos, pos+k) intervals coalesce) by a running-max window.
    * Equivalent on spans ≥ k tokens — a repeat of length L ≥ k is
    * covered by exactly its L−k+1 member grams, which merge back into
    * one [start, start+L) span; repeats shorter than k are below the
    * published threshold by construction.
    *
    * Scale shape: the gram agg is the SAME shuffle family as l25
    * (string grams here for oracle parity; `hashed = true` is the
    * 100 TB form — 8-byte xxhash64 keys, SubstringSpanSpec pins
    * hashed ≡ string). The window only ever sees HIT positions
    * (repeated grams), a vanishing fraction of the corpus, so the
    * per-doc sort is bounded by repeat density, not document count. */
  private[graft] def substringSpans(corpus: DataFrame, k: Int,
      hashed: Boolean): DataFrame = {
    // the gram frame feeds BOTH the repeated-gram agg and the hit join;
    // materializing it once (l29's shared-subtree discipline) saves the
    // second corpus-scan + posexplode execution (measured 2.30 → 1.71 s
    // at sf0.1). At 100 TB the equivalent move is persisting the
    // positional-gram frame to storage once (it IS the substring index
    // a deployment would keep — [[SubstringIndex]] is that split, and
    // [[substringSpansFrom]] the shared probe half); block-manager
    // checkpoint is the single-job stand-in here.
    substringSpansFrom(corpus, spanGrams(corpus, k, hashed)
      .localCheckpoint(), k)
  }

  /** ONE checkpointed positional string-gram frame of the PLANTED
    * corpus per snapshot, shared by every SpanK-gram consumer — l33's
    * span accounting, l64/l65's ExactSubstr cuts, l66's duplication
    * profile. Same (appId, dir) memo discipline (and rationale) as
    * [[LlmQueries.sharedPairs]]: before the memo each of the four
    * catalog queries re-ran the tokenize + posexplode + 15-gram build
    * from scratch; now the first action materializes the lazy
    * checkpoint once and the rest read rows — which is also the
    * production shape (the gram frame IS the persisted
    * [[SubstringIndex]]; this is its single-job stand-in). The frame
    * is a deterministic pure function of the snapshot, so a memo read
    * cannot differ from a rebuild. */
  private val plantedGramsMemo =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  private[graft] def sharedPlantedGrams(s: SparkSession, d: String): DataFrame =
    plantedGramsMemo.computeIfAbsent(s.sparkContext.applicationId + ":" + d,
      _ => spanGrams(LlmQueries.plantedFull(docs(s, d)), SpanK,
        hashed = false).localCheckpoint(eager = false))

  /** The PROBE half of l33, factored so the gram frame can come from
    * either the in-job checkpoint ([[substringSpans]]) or the persisted
    * parquet index ([[SubstringIndex.read]]) — identical plan from the
    * gram frame down, so probe-from-disk cannot drift from the composed
    * DQ. `grams` must be the positional (lang, doc_id, pos, gram) frame
    * of exactly `corpus` (same k). */
  private[graft] def substringSpansFrom(corpus: DataFrame, grams: DataFrame,
      k: Int): DataFrame = {
    val repeated = grams.groupBy("gram")
      .agg(countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2)
      .select("gram")
    val hits = grams.join(repeated, Seq("gram"), "left_semi")
    spanRollup(corpus, mergeSpans(hits, k))
  }

  /** Maximal-span merge: hit positions (lang, doc_id, pos) → coalesced
    * [s, e) spans per doc (overlapping or adjacent [pos, pos+k) member
    * intervals merge via the running-max window). The window input is
    * only HIT positions — repeat-density-bounded, never corpus-sized. */
  private[graft] def mergeSpans(hits: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val prevEnd = max(col("pos") + lit(k))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    hits
      .withColumn("new_span",
        when(prevEnd.isNull || col("pos") > prevEnd, 1L).otherwise(0L))
      .withColumn("span_id", sum("new_span")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("lang", "doc_id", "span_id")
      .agg(min("pos").as("s"), (max("pos") + lit(k)).as("e"))
  }

  /** The per-language accounting rollup shared by every span producer:
    * span frame → (lang, n_docs, n_docs_with_spans, n_spans,
    * tokens_covered, max_span_tokens, span_checksum), zero-filled for
    * languages with no spans. */
  private[graft] def spanRollup(corpus: DataFrame, spans: DataFrame): DataFrame = {
    val perLang = spans.groupBy("lang")
      .agg(
        countDistinct("doc_id").as("n_docs_with_spans"),
        count(lit(1)).as("n_spans"),
        sum(col("e") - col("s")).cast("long").as("tokens_covered"),
        max(col("e") - col("s")).cast("long").as("max_span_tokens"),
        sum_distinct(col("doc_id")).as("span_checksum"))
    corpus.groupBy("lang").agg(count(lit(1)).as("n_docs"))
      .join(perLang, Seq("lang"), "left")
      .select(col("lang"), col("n_docs"),
        coalesce(col("n_docs_with_spans"), lit(0L)).as("n_docs_with_spans"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("tokens_covered"), lit(0L)).as("tokens_covered"),
        coalesce(col("max_span_tokens"), lit(0L)).as("max_span_tokens"),
        coalesce(col("span_checksum"), lit(0L)).as("span_checksum"))
      .orderBy("lang")
  }

  /** L33 — the DQ: substring dedup over the PLANTED corpus (the stock
    * corpus shares no 15-gram across documents — the planted near-dup
    * copies are the verifiable-by-construction repeats, exactly as in
    * the l9 family). String grams so the DuckDB oracle runs the
    * identical computation. */
  val l33 = DQ(
    "l33_substring_dedup",
    (s, d) => substringSpansFrom(
      LlmQueries.plantedFull(docs(s, d)), sharedPlantedGrams(s, d), SpanK),
    Some(s"""WITH corpus AS (
              SELECT lang, doc_id, text FROM documents
              UNION ALL
              SELECT d.lang,
                d.doc_id + (SELECT COALESCE(MAX(doc_id), -1) + 1 FROM documents),
                substring(d.text, instr(d.text, ' ') + 1)
              FROM documents d WHERE d.doc_id % 10 = 0),
            toks AS (
              SELECT lang, doc_id, string_split_regex(lower(text), '\\s+') AS ta
              FROM corpus),
            posn AS (
              SELECT lang, doc_id, ta,
                unnest(range(len(ta) - ${SpanK - 1})) AS pos
              FROM toks WHERE len(ta) >= $SpanK),
            grams AS (
              SELECT lang, doc_id, pos,
                array_to_string(list_slice(ta, pos + 1, pos + $SpanK), ' ') AS gram
              FROM posn),
            repeated AS (
              SELECT gram FROM grams GROUP BY gram
              HAVING COUNT(DISTINCT doc_id) >= 2),
            hits AS (
              SELECT lang, doc_id, pos FROM grams
              WHERE gram IN (SELECT gram FROM repeated)),
            marked AS (
              SELECT lang, doc_id, pos,
                CASE WHEN pos > COALESCE(MAX(pos + $SpanK) OVER
                    (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_span
              FROM hits),
            spanid AS (
              SELECT lang, doc_id, pos,
                SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
              FROM marked),
            spans AS (
              SELECT lang, doc_id, span_id,
                MIN(pos) AS s, MAX(pos) + $SpanK AS e
              FROM spanid GROUP BY 1, 2, 3),
            perlang AS (
              SELECT lang,
                COUNT(DISTINCT doc_id) AS n_docs_with_spans,
                COUNT(*) AS n_spans,
                SUM(e - s) AS tokens_covered,
                MAX(e - s) AS max_span_tokens,
                SUM(DISTINCT doc_id) AS span_checksum
              FROM spans GROUP BY 1),
            total AS (SELECT lang, COUNT(*) AS n_docs FROM corpus GROUP BY 1)
            SELECT t.lang,
              CAST(t.n_docs AS BIGINT) AS n_docs,
              CAST(COALESCE(p.n_docs_with_spans, 0) AS BIGINT) AS n_docs_with_spans,
              CAST(COALESCE(p.n_spans, 0) AS BIGINT) AS n_spans,
              CAST(COALESCE(p.tokens_covered, 0) AS BIGINT) AS tokens_covered,
              CAST(COALESCE(p.max_span_tokens, 0) AS BIGINT) AS max_span_tokens,
              CAST(COALESCE(p.span_checksum, 0) AS BIGINT) AS span_checksum
            FROM total t LEFT JOIN perlang p ON t.lang = p.lang
            ORDER BY t.lang"""))

  /** The substring-dedup TRANSFORM — [[l33]] accounts the repeated
    * spans; this CUTS them, the operation Lee et al. 2022 actually
    * apply (ExactSubstr "removes the duplicated substring, keeping one
    * occurrence"): per repeated gram the canonical OWNER is the
    * smallest doc_id containing it; every occurrence in a NON-owner
    * document is a cut site, cut sites merge into maximal spans
    * ([[mergeSpans]] — the same coalescing l33 fingerprints), and the
    * cleaned document is its normalized token stream with cut spans
    * removed. Cross-document repeats only (l33's criterion);
    * within-doc-only repeats are below the nd ≥ 2 bar by construction.
    * Returns (lang, doc_id, ta, cuts, text_clean, n_tokens,
    * n_cut_tokens) — one row per corpus document, `text_clean` the
    * space-rejoined kept tokens ("" when a doc cuts entirely).
    *
    * Scale shape: the gram agg is l33's one shuffle; cut sites are
    * hit-density-bounded into the per-doc merge window; the cut
    * itself is ROW-LOCAL (zip_with + filter over the doc's own tokens
    * against its ≤spans-sized cut list) — no second corpus shuffle. */
  private[graft] def exactSubstrCut(corpus: DataFrame, k: Int): DataFrame =
    exactSubstrCutFrom(corpus,
      spanGrams(corpus, k, hashed = false).localCheckpoint(), k)

  /** [[exactSubstrCut]] with a caller-supplied gram frame — the DQ
    * passes [[sharedPlantedGrams]] so the l33/l64/l65/l66 family
    * tokenizes the planted corpus exactly once per snapshot. */
  private[graft] def exactSubstrCutFrom(corpus: DataFrame,
      grams: DataFrame, k: Int): DataFrame = {
    val owners = grams.groupBy("gram")
      .agg(min("doc_id").as("owner"), countDistinct("doc_id").as("nd"))
      .filter(col("nd") >= 2)
      .select("gram", "owner")
    val cutHits = grams.join(owners, Seq("gram"))
      .filter(col("doc_id") =!= col("owner"))
      .select("lang", "doc_id", "pos")
    val cuts = mergeSpans(cutHits, k)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("cuts"))
    applyCuts(corpus, cuts)
  }

  /** The UNIFIED ExactSubstr cut — [[exactSubstrCut]] handles the
    * cross-document criterion (l33's scope: owner DOCUMENTS keep all
    * their occurrences); this is the full Lee et al. rule, within-doc
    * repeats included: for every gram the CANONICAL occurrence is the
    * globally first site in (doc_id, pos) order, and every other
    * occurrence — a later position in the SAME doc just as much as a
    * site in another doc — is a cut site. The canonical key is the
    * integer encoding doc_id·2²⁰ + pos (positions are token offsets,
    * far under 2²⁰ — integer-exact in both engines, no struct-min
    * portability question), so "first occurrence" is ONE min() per
    * gram. Same merge/cut machinery as [[exactSubstrCut]] downstream.
    *
    * Fixpoint, precisely stated (the Lee et al. caveat): after the
    * cut, every k-gram that was INTACT IN THE ORIGINAL token stream
    * occurs exactly once globally — nothing the original corpus
    * repeated survives, across or within documents. Re-joining the
    * kept tokens across a cut boundary can MINT new k-grams (the
    * suffix before a cut abutting the prefix after it), and a minted
    * gram may itself repeat; the single-pass criterion does not chase
    * those, exactly as the published ExactSubstr pass does not (its
    * remedy concatenates around the removed span too). The spec pins
    * the original-stream property on a planted corpus where no
    * boundary-minted gram happens to repeat, so the re-run there
    * finds zero spans; a caller wanting the stronger every-gram-of-
    * the-CLEANED-stream property iterates the cut to convergence. */
  private[graft] def exactSubstrCutGlobal(corpus: DataFrame,
      k: Int): DataFrame =
    exactSubstrCutGlobalFrom(corpus,
      spanGrams(corpus, k, hashed = false).localCheckpoint(), k)

  /** [[exactSubstrCutGlobal]] with a caller-supplied gram frame (same
    * split as [[exactSubstrCutFrom]]). */
  private[graft] def exactSubstrCutGlobalFrom(corpus: DataFrame,
      grams: DataFrame, k: Int): DataFrame = {
    val keyed = grams.withColumn("okey",
      shiftleft(col("doc_id"), 20) + col("pos"))
    val canon = keyed.groupBy("gram").agg(min("okey").as("ckey"))
    val cutHits = keyed.join(canon, Seq("gram"))
      .filter(col("okey") =!= col("ckey"))
      .select("lang", "doc_id", "pos")
    val cuts = mergeSpans(cutHits, k)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("cuts"))
    applyCuts(corpus, cuts)
  }

  /** The INCREMENTAL ExactSubstr cut — [[exactSubstrCut]]'s criterion
    * against a PERSISTED corpus ([[SubstringIndex]]'s hashed gram
    * frame) instead of within one corpus: every maximal run of `shard`
    * k-grams that exist ANYWHERE in the index is a cut span (the
    * corpus already holds the canonical occurrence — the shard copy is
    * the one Lee et al. remove), and the cleaned shard document is its
    * token stream with those spans removed. This is the curative form
    * of [[SubstringIndex.spansAgainst]]: same probe join, but the hits
    * feed the cut instead of the accounting rollup.
    *
    * Scale shape: only the SHARD tokenizes (the index side is a
    * distinct-gram projection scan of the persisted files); the merge
    * window sees hit positions only; the cut is row-local
    * ([[applyCuts]]). Shard ids must be disjoint from indexed ids —
    * the index family's standing contract. */
  private[graft] def cutAgainstIndex(shard: DataFrame, index: DataFrame,
      k: Int): DataFrame = {
    val hits = spanGrams(shard, k, hashed = true)
      .join(index.select("gram").distinct(), Seq("gram"), "left_semi")
      .select("lang", "doc_id", "pos")
    val cuts = mergeSpans(hits, k)
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("s"), col("e")))).as("cuts"))
    applyCuts(shard, cuts)
  }

  /** The shared row-local cut application: corpus ⋈ per-doc cut list →
    * cleaned token stream + accounting columns. Factored so the
    * cross-doc ([[exactSubstrCut]]) and unified
    * ([[exactSubstrCutGlobal]]) criteria share one implementation.
    *
    * The kept stream is assembled as the GAP slices between cuts —
    * one slice per gap plus the tail, O(tokens + spans) per doc —
    * rather than a per-token `exists(cuts, ...)` membership scan
    * (O(tokens × spans), which bites exactly on the boilerplate-heavy
    * docs where spans are dense). Sound because [[mergeSpans]]' output
    * is sorted, non-overlapping, and maximal: gap i is
    * [prev.e, cuts(i).s) (prev.e = 0 at i = 0), never negative-width,
    * and the lazy CASE keeps the i−1 index unevaluated at i = 0. */
  private def applyCuts(corpus: DataFrame, cuts: DataFrame): DataFrame =
    corpus.filter(col("text").isNotNull)
      .withColumn("ta", LlmQueries.tokensOf(corpus))
      .join(cuts, Seq("doc_id"), "left")
      .withColumn("kept",
        when(col("cuts").isNull, col("ta")).otherwise(expr(
          s"""flatten(concat(
                transform(cuts, (c, i) -> slice(ta,
                  (CASE WHEN i = 0 THEN 0 ELSE cuts[i-1].e END) + 1,
                  c.s - (CASE WHEN i = 0 THEN 0 ELSE cuts[i-1].e END))),
                array(slice(ta, element_at(cuts, -1).e + 1,
                  size(ta) - element_at(cuts, -1).e))))""")))
      .withColumn("text_clean", concat_ws(" ", col("kept")))
      .withColumn("n_tokens", size(col("ta")).cast("long"))
      .withColumn("n_cut_tokens",
        when(col("cuts").isNull, 0L).otherwise(expr(
          "aggregate(cuts, 0L, (acc, c) -> acc + (c.e - c.s))")))
      .select("lang", "doc_id", "ta", "cuts", "text_clean",
        "n_tokens", "n_cut_tokens")

  /** L65 — the unified-criterion DQ ([[exactSubstrCutGlobal]] over the
    * planted corpus): same rollup shape as [[l64]]; the two DQs differ
    * exactly where the criteria differ — a within-doc repeat is
    * invisible to l64 and cut by l65. */
  val l65 = DQ(
    "l65_substring_cut_global",
    (s, d) => {
      exactSubstrCutGlobalFrom(LlmQueries.plantedFull(docs(s, d)),
        sharedPlantedGrams(s, d), SpanK)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("n_cut_tokens") > 0L, 1L).otherwise(0L))
            .as("n_docs_cut"),
          sum("n_tokens").as("tokens_before"),
          sum("n_cut_tokens").as("tokens_cut"),
          (sum("n_tokens") - sum("n_cut_tokens")).as("tokens_after"),
          sum(conv(substring(md5(col("text_clean")), 1, 8), 16, 10)
            .cast("long")).as("cleaned_checksum"))
        .orderBy("lang")
    },
    Some(s"""WITH corpus AS (
              SELECT lang, doc_id, text FROM documents
              UNION ALL
              SELECT d.lang,
                d.doc_id + (SELECT COALESCE(MAX(doc_id), -1) + 1 FROM documents),
                substring(d.text, instr(d.text, ' ') + 1)
              FROM documents d WHERE d.doc_id % 10 = 0),
            toks AS (
              SELECT lang, doc_id, string_split_regex(lower(text), '\\s+') AS ta
              FROM corpus WHERE text IS NOT NULL),
            posn AS (
              SELECT lang, doc_id, ta,
                unnest(range(len(ta) - ${SpanK - 1})) AS pos
              FROM toks WHERE len(ta) >= $SpanK),
            grams AS (
              SELECT lang, doc_id, pos,
                doc_id * 1048576 + pos AS okey,
                array_to_string(list_slice(ta, pos + 1, pos + $SpanK), ' ') AS gram
              FROM posn),
            canon AS (
              SELECT gram, MIN(okey) AS ckey FROM grams GROUP BY gram),
            hits AS (
              SELECT g.lang, g.doc_id, g.pos FROM grams g
              JOIN canon c ON g.gram = c.gram AND g.okey <> c.ckey),
            marked AS (
              SELECT lang, doc_id, pos,
                CASE WHEN pos > COALESCE(MAX(pos + $SpanK) OVER
                    (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_span
              FROM hits),
            spanid AS (
              SELECT lang, doc_id, pos,
                SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
              FROM marked),
            spans AS (
              SELECT lang, doc_id, span_id,
                MIN(pos) AS s, MAX(pos) + $SpanK AS e
              FROM spanid GROUP BY 1, 2, 3),
            positions AS (
              SELECT lang, doc_id, ta, unnest(range(len(ta))) AS i
              FROM toks),
            kept AS (
              SELECT p.lang, p.doc_id, p.i, p.ta[p.i + 1] AS tok
              FROM positions p
              WHERE NOT EXISTS (SELECT 1 FROM spans s
                WHERE s.doc_id = p.doc_id AND p.i >= s.s AND p.i < s.e)),
            cleaned AS (
              SELECT t.lang, t.doc_id, len(t.ta) AS n_tokens,
                COALESCE(k.ctext, '') AS text_clean,
                COALESCE(k.n_kept, 0) AS n_kept
              FROM toks t LEFT JOIN (
                SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS ctext,
                  COUNT(*) AS n_kept
                FROM kept GROUP BY 1) k ON t.doc_id = k.doc_id)
            SELECT lang,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN n_tokens > n_kept THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_cut,
              CAST(SUM(n_tokens) AS BIGINT) AS tokens_before,
              CAST(SUM(n_tokens - n_kept) AS BIGINT) AS tokens_cut,
              CAST(SUM(n_kept) AS BIGINT) AS tokens_after,
              CAST(SUM(CAST(('0x' || substring(md5(text_clean), 1, 8))
                AS BIGINT)) AS BIGINT) AS cleaned_checksum
            FROM cleaned GROUP BY 1 ORDER BY lang"""))

  /** L64 — substring-cut accounting (the DQ over [[exactSubstrCut]] on
    * the planted corpus, string grams for oracle parity): per language
    * — docs, docs cut, tokens before/cut/after, and a checksum over
    * the CLEANED text (8 md5 hex digits per doc, summed — pins the
    * exact byte content of every cleaned document, not just counts).
    * The planted near-dup copies are the verifiable repeats: each
    * copy's text is owned by its smaller-id source, so copies cut and
    * sources keep — keep-one-occurrence realized corpus-wide. */
  val l64 = DQ(
    "l64_substring_cut",
    (s, d) => {
      exactSubstrCutFrom(LlmQueries.plantedFull(docs(s, d)),
        sharedPlantedGrams(s, d), SpanK)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("n_cut_tokens") > 0L, 1L).otherwise(0L))
            .as("n_docs_cut"),
          sum("n_tokens").as("tokens_before"),
          sum("n_cut_tokens").as("tokens_cut"),
          (sum("n_tokens") - sum("n_cut_tokens")).as("tokens_after"),
          sum(conv(substring(md5(col("text_clean")), 1, 8), 16, 10)
            .cast("long")).as("cleaned_checksum"))
        .orderBy("lang")
    },
    Some(s"""WITH corpus AS (
              SELECT lang, doc_id, text FROM documents
              UNION ALL
              SELECT d.lang,
                d.doc_id + (SELECT COALESCE(MAX(doc_id), -1) + 1 FROM documents),
                substring(d.text, instr(d.text, ' ') + 1)
              FROM documents d WHERE d.doc_id % 10 = 0),
            toks AS (
              SELECT lang, doc_id, string_split_regex(lower(text), '\\s+') AS ta
              FROM corpus WHERE text IS NOT NULL),
            posn AS (
              SELECT lang, doc_id, ta,
                unnest(range(len(ta) - ${SpanK - 1})) AS pos
              FROM toks WHERE len(ta) >= $SpanK),
            grams AS (
              SELECT lang, doc_id, pos,
                array_to_string(list_slice(ta, pos + 1, pos + $SpanK), ' ') AS gram
              FROM posn),
            owners AS (
              SELECT gram, MIN(doc_id) AS owner FROM grams GROUP BY gram
              HAVING COUNT(DISTINCT doc_id) >= 2),
            hits AS (
              SELECT g.lang, g.doc_id, g.pos FROM grams g
              JOIN owners o ON g.gram = o.gram AND g.doc_id <> o.owner),
            marked AS (
              SELECT lang, doc_id, pos,
                CASE WHEN pos > COALESCE(MAX(pos + $SpanK) OVER
                    (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_span
              FROM hits),
            spanid AS (
              SELECT lang, doc_id, pos,
                SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
              FROM marked),
            spans AS (
              SELECT lang, doc_id, span_id,
                MIN(pos) AS s, MAX(pos) + $SpanK AS e
              FROM spanid GROUP BY 1, 2, 3),
            positions AS (
              SELECT lang, doc_id, ta, unnest(range(len(ta))) AS i
              FROM toks),
            kept AS (
              SELECT p.lang, p.doc_id, p.i, p.ta[p.i + 1] AS tok
              FROM positions p
              WHERE NOT EXISTS (SELECT 1 FROM spans s
                WHERE s.doc_id = p.doc_id AND p.i >= s.s AND p.i < s.e)),
            cleaned AS (
              SELECT t.lang, t.doc_id, len(t.ta) AS n_tokens,
                COALESCE(k.ctext, '') AS text_clean,
                COALESCE(k.n_kept, 0) AS n_kept
              FROM toks t LEFT JOIN (
                SELECT doc_id, string_agg(tok, ' ' ORDER BY i) AS ctext,
                  COUNT(*) AS n_kept
                FROM kept GROUP BY 1) k ON t.doc_id = k.doc_id)
            SELECT lang,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN n_tokens > n_kept THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_cut,
              CAST(SUM(n_tokens) AS BIGINT) AS tokens_before,
              CAST(SUM(n_tokens - n_kept) AS BIGINT) AS tokens_cut,
              CAST(SUM(n_kept) AS BIGINT) AS tokens_after,
              CAST(SUM(CAST(('0x' || substring(md5(text_clean), 1, 8))
                AS BIGINT)) AS BIGINT) AS cleaned_checksum
            FROM cleaned GROUP BY 1 ORDER BY lang"""))

  /** [[l40]]'s cap as a reusable frame so the spec can run a binding
    * cap at sf0.001 (where the DQ's production cap of 10 exceeds every
    * source's 2–3 docs and nothing would differ). Returns per-source
    * accounting of the capped corpus.
    *
    * Shape, deliberately split into totals ⋈ survivors: the kept side
    * filters `row_number() <= cap` DIRECTLY after the window, which is
    * the pattern Spark's optimizer rewrites into a map-side
    * WindowGroupLimit — each input task keeps only its local best `cap`
    * rows per source BEFORE the shuffle, so the exchange carries
    * O(cap · sources · tasks) rows, not the corpus (the spec pins
    * `WindowGroupLimit` in the physical plan). The totals side is a
    * plain partial-aggregable count. A monolithic
    * rank-then-conditional-agg form would window over every row with no
    * group-limit rewrite. */
  private[operators] def sourceCapped(dd0: DataFrame, cap: Int): DataFrame = {
    val dd = dd0.filter(col("text").isNotNull)
    val totals = dd.groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum("n_chars").as("n_chars_in"))
    val w = Window.partitionBy("source")
      .orderBy(col("drw"), col("doc_id"))
    val kept = dd
      .withColumn("drw", Sampling.draw(col("doc_id"), col("source")))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= cap)
      .groupBy("source")
      .agg(count(lit(1)).as("n_kept"),
        sum("n_chars").as("kept_chars"),
        sum("doc_id").as("kept_checksum"))
    totals.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("n_chars_in"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("kept_chars"), lit(0L)).as("kept_chars"),
        coalesce(col("kept_checksum"), lit(0L)).as("kept_checksum"))
      .orderBy("source")
  }

  private[operators] val SourceCap = 10

  /** L40 — per-source document caps (the over-represented-domain guard
    * of the published recipes: RefinedWeb caps URLs per domain, Dolma
    * caps per-source shares — without it, one crawler-friendly site
    * dominates the mix). Each source keeps at most 10 documents, chosen
    * by the catalog's standard deterministic md5 draw (salted by the
    * source, tie-broken by doc_id): no RNG state, the same survivors on
    * any cluster size, and — because the draw is a fixed per-row hash —
    * recapping to a larger cap only ADDS documents (the rank order is
    * stable), so a 100 TB corpus can be re-capped incrementally. Per
    * source: docs and chars in, docs/chars kept, survivor checksum.
    *
    * Scale shape: the rank-filter form is rewritten by Spark into a
    * map-side WindowGroupLimit (bounded per-task state, the exchange
    * carries only candidate survivors); the per-source window then
    * ranks at most tasks·cap rows per source. A skew-heavy domain
    * therefore never ships its full row set to one task — the map-side
    * limit already cut it to cap per input task. */
  val l40 = DQ(
    "l40_source_caps",
    (s, d) => sourceCapped(docs(s, d), SourceCap),
    Some(s"""WITH ranked AS (
              SELECT source, doc_id, n_chars,
                row_number() OVER (PARTITION BY source
                  ORDER BY substring(md5(CAST(doc_id AS VARCHAR) || ':' || source), 1, 4),
                           doc_id) AS rk
              FROM documents WHERE text IS NOT NULL)
            SELECT source,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(n_chars) AS BIGINT) AS n_chars_in,
              CAST(SUM(CASE WHEN rk <= $SourceCap THEN 1 ELSE 0 END) AS BIGINT)
                AS n_kept,
              CAST(COALESCE(SUM(CASE WHEN rk <= $SourceCap THEN n_chars END), 0)
                AS BIGINT) AS kept_chars,
              CAST(COALESCE(SUM(CASE WHEN rk <= $SourceCap THEN doc_id END), 0)
                AS BIGINT) AS kept_checksum
            FROM ranked GROUP BY 1 ORDER BY source"""))

  /** L42 — SEMANTIC decontamination (the third decontamination modality
    * beside l25/l35's exact n-gram screens and l30's streaming gate:
    * published model reports — GPT-4, Llama, Phi — additionally screen
    * training data against benchmarks by EMBEDDING similarity, which
    * catches paraphrased or reformatted eval material that shares no
    * 13-gram). Train vectors whose max cosine against ANY eval-suite
    * vector clears 0.90 (e4-rounded, the catalog's shared near-dup bar)
    * are contaminated. The eval suite is the mod-10 id slice; since the
    * natural corpus' cross-split cosines top out at ~0.49 (measured),
    * contamination is PLANTED by the catalog's standard rule
    * ([[LlmQueries.plantedOffset]] discipline): each eval vector also
    * appears perturbed (+0.3 on coordinate 1) as a train row at
    * id + offset, so the gate pins that exactly the planted paraphrases
    * are caught and nothing natural is. Per label: train rows, flagged
    * rows, flagged checksum, max similarity seen.
    *
    * Scale shape: the eval side is the BENCHMARK SUITE — bounded by
    * construction (10³–10⁴ rows at production), so it broadcasts and
    * the screen is one BroadcastNestedLoopJoin pass over train with
    * per-row O(|eval|·d) codegen'd dot products, then a per-row max —
    * no shuffle of the train corpus at all. (The IVF-accelerated
    * variant — probe only the eval vectors in nearby cells — composes
    * [[AnnIndexes]]; the brute form here is the oracle-checkable
    * baseline the published reports actually run at eval-suite sizes.) */
  /** [[l42]]'s contamination bar (e4-rounded max cosine ≥ 0.90 — the
    * catalog's shared near-dup cosine bar), ONE definition for the
    * batch DQ, its IVF scale path, and the streaming ingest gate
    * ([[graft.streaming.StreamingSemanticDecontam]]) so the three
    * screens cannot drift. */
  private[graft] val SemanticContamE4 = 9000L

  /** [[l42]]'s planted frames, shared with the IVF-variant spec:
    * `(eval with (vec_id, v), train with (vec_id, label, v))`. */
  private[operators] def semanticFrames(s: SparkSession,
      d: String): (DataFrame, DataFrame) = {
    val base = Tables.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
    val off = LlmQueries.plantedOffset(base, "vec_id")
    val contaminated = base
      .filter(LlmQueries.isPlantedSrc(col("vec_id")))
      .crossJoin(broadcast(off))
      .select((col("vec_id") + col("_off")).as("vec_id"), col("label"),
        expr("concat(array(element_at(v, 1) + 0.3), slice(v, 2, size(v) - 1))")
          .as("v"))
    val eval = base.filter(LlmQueries.isPlantedSrc(col("vec_id")))
      .select(col("vec_id"), col("v"))
    val train = base.filter(!LlmQueries.isPlantedSrc(col("vec_id")))
      .unionByName(contaminated)
    (eval, train)
  }

  val l42 = DQ(
    "l42_semantic_decontam",
    (s, d) => {
      val (evalVecs, train) = semanticFrames(s, d)
      val eval = evalVecs.select(col("v").as("ev"))
      train.crossJoin(broadcast(eval))
        .withColumn("cos_e4",
          round(lit(10000) *
            graft.functions.VectorOps.cosineNative(col("v"), col("ev")))
            .cast("long"))
        .groupBy("vec_id", "label")
        .agg(max("cos_e4").as("max_e4"))
        .groupBy("label")
        .agg(
          count(lit(1)).as("n_train"),
          sum(when(col("max_e4") >= SemanticContamE4, 1L).otherwise(0L)).as("n_flagged"),
          coalesce(sum(when(col("max_e4") >= SemanticContamE4, col("vec_id"))), lit(0L))
            .as("flagged_checksum"),
          max("max_e4").as("max_sim_e4"))
        .orderBy("label")
    },
    Some("""WITH base AS (
              SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
            off AS (SELECT COALESCE(MAX(vec_id), -1) + 1 AS o FROM base),
            contaminated AS (
              SELECT b.vec_id + off.o AS vec_id, b.label,
                list_concat([v[1] + 0.3], v[2:]) AS v
              FROM base b, off WHERE b.vec_id % 10 = 0),
            ev AS (SELECT v AS evec FROM base WHERE vec_id % 10 = 0),
            train AS (
              SELECT vec_id, label, v FROM base WHERE vec_id % 10 <> 0
              UNION ALL
              SELECT vec_id, label, v FROM contaminated),
            sims AS (
              SELECT t.vec_id, t.label,
                MAX(CAST(ROUND(10000 * list_dot_product(t.v, e.evec)
                  / (sqrt(list_dot_product(t.v, t.v))
                     * sqrt(list_dot_product(e.evec, e.evec)))) AS BIGINT))
                  AS max_e4
              FROM train t, ev e GROUP BY 1, 2)
            SELECT label,
              CAST(COUNT(*) AS BIGINT) AS n_train,
              CAST(SUM(CASE WHEN max_e4 >= 9000 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_flagged,
              CAST(COALESCE(SUM(CASE WHEN max_e4 >= 9000 THEN vec_id END), 0)
                AS BIGINT) AS flagged_checksum,
              CAST(MAX(max_e4) AS BIGINT) AS max_sim_e4
            FROM sims GROUP BY 1 ORDER BY label"""))

  // ----------------------------------------------------------- l39 DSIR

  /** DSIR feature-space size (hashed-bigram buckets). The paper uses
    * 10⁴ on web corpora; 1024 keeps every bucket populated at the test
    * sfs while the shape is B-independent. */
  private[operators] val DsirBuckets = 1024

  /** (doc_id, lang, bucket, n) hashed-bigram feature counts — the ONE
    * token-grain pass of the DSIR pipeline; factored out so the spec
    * can recompute the model/weight arithmetic downstream of it
    * independently of the plan's join path. */
  private[operators] def dsirFeats(dd0: DataFrame): DataFrame =
    dd0.filter(col("text").isNotNull)
      .select(col("doc_id"), col("lang"),
        split(lower(col("text")), "\\s+").as("ta"))
      .withColumn("bg", zip_with(
        expr("slice(ta, 1, greatest(size(ta) - 1, 0))"),
        expr("slice(ta, 2, greatest(size(ta) - 1, 0))"),
        // unit-separator keeps ("ab","c") / ("a","bc") as distinct keys
        (a, b) => concat(a, lit("\u001f"), b)))
      .select(col("doc_id"), col("lang"), explode(col("bg")).as("g"))
      .withColumn("b", pmod(xxhash64(col("g")), lit(DsirBuckets)).cast("long"))
      .groupBy("doc_id", "lang", "b").agg(count(lit(1)).as("n"))

  /** The trained DSIR model from a feature frame: the ≤B-row
    * (b, llr_milli) log-likelihood-ratio table — the ONLY trained
    * state of the pipeline, factored out so [[DsirIndex]] can persist
    * it (train once per target, score many corpus snapshots). */
  private[operators] def dsirModelFrom(feats: DataFrame,
      targetLang: String): DataFrame = {
    // bucket-grain bag-of-ngrams models: raw = whole corpus, target =
    // the target slice; add-1 smoothing over B buckets
    val raw = feats.groupBy("b").agg(sum("n").as("cr"))
    val tgt = feats.filter(col("lang") === targetLang)
      .groupBy("b").agg(sum("n").as("ct"))
    val totals = feats.agg(
      sum("n").as("nr"),
      sum(when(col("lang") === targetLang, col("n")).otherwise(0L)).as("nt"))
    raw.join(tgt, Seq("b"), "left")
      .crossJoin(broadcast(totals)) // 1-row totals broadcast
      .withColumn("llr_milli", round(lit(1000.0) *
          (log((coalesce(col("ct"), lit(0L)) + 1d) / (col("nt") + DsirBuckets)) -
           log((col("cr") + 1d) / (col("nr") + DsirBuckets)))).cast("long"))
      .select("b", "llr_milli")
  }

  /** Per-document integer milli-nat weights of `feats` under a trained
    * model frame: the exact long dot Σ n_b·llr_milli[b] against the
    * broadcast ≤B-row table — aggregation-order-independent, so
    * in-query and probe-from-parquet weights agree bit-for-bit. */
  private[operators] def dsirWeightsFrom(feats: DataFrame,
      model: DataFrame): DataFrame =
    feats.join(broadcast(model), Seq("b"))
      .groupBy("doc_id").agg(sum(col("n") * col("llr_milli")).as("w_milli"))

  /** Per-document DSIR importance weights + deterministic Gumbel-top-k
    * resample ([[l39]]'s pipeline, parameterized so the spec can run a
    * binding k at sf0.001). Returns one row per document:
    * `(doc_id, lang, w_milli, gkey, sampled)`.
    *
    * The weight is INTEGER milli-nats: each bucket's log-likelihood
    * ratio is rounded to a long once (`llr_milli`), and the per-doc
    * weight is the exact long sum Σ n_b·llr_milli[b] — so the weight is
    * independent of aggregation order (a double sum here would make the
    * Gumbel ranking flicker across partitionings near ties). The Gumbel
    * perturbation is derived from the catalog's md5 draw machinery —
    * 15 hex digits → uniform in (0,1) → −ln(−ln(u)) — a pure per-row
    * function of doc_id, so the SAMPLE is reproducible on any cluster
    * layout, yet distributed exactly as Gumbel-top-k sampling without
    * replacement from softmax(w) requires (Vieira 2014). */
  private[operators] def dsirSample(dd0: DataFrame, targetLang: String,
      k: Int): DataFrame = {
    val dd = dd0.filter(col("text").isNotNull).select("doc_id", "lang")
    // checkpointed ONCE (l33's discipline): the bigram explode + agg is
    // the pipeline's only token-grain pass, and four consumers read it
    // (raw model, target model, smoothing totals, per-doc weights) — an
    // unshared frame would re-tokenize the corpus four times
    val feats = dsirFeats(dd0).localCheckpoint()
    val llr = dsirModelFrom(feats, targetLang)
    // per-doc weight: exact long dot of feature counts with the ≤B-row
    // broadcast llr table; docs with no bigram weigh 0
    val w = dsirWeightsFrom(feats, llr)
    val scored = dd
      .join(w, Seq("doc_id"), "left")
      .withColumn("w_milli", coalesce(col("w_milli"), lit(0L)))
      // deterministic Gumbel: 15 md5 hex digits → u ∈ (0,1) → −ln(−ln u)
      .withColumn("u",
        (conv(substring(md5(concat(col("doc_id").cast("string"),
          lit(":dsir"))), 1, 15), 16, 10).cast("double") + 0.5d) /
          lit(math.pow(16.0, 15)))
      .withColumn("gkey",
        col("w_milli").cast("double") + lit(1000.0) * -log(-log(col("u"))))
      .drop("u")
    val chosen = scored.orderBy(col("gkey").desc, col("doc_id")).limit(k)
      .select(col("doc_id"), lit(true).as("_s"))
    scored.join(broadcast(chosen), Seq("doc_id"), "left")
      .withColumn("sampled", coalesce(col("_s"), lit(false))).drop("_s")
  }

  /** L39 — data selection by importance resampling (DSIR, Xie et al.
    * 2023 arXiv:2302.03169: choose pretraining documents whose
    * hashed-n-gram distribution matches a TARGET corpus — the
    * principled version of "more data like the good data" that l37's
    * score buckets approximate). Bag-of-hashed-bigrams models with
    * add-1 smoothing give each doc a log importance weight
    * Σ_b n_b·(log p̂_target(b) − log p̂_raw(b)); sampling without
    * replacement ∝ softmax(w) is realized EXACTLY by Gumbel-top-k with
    * deterministic per-doc Gumbel noise from the md5 draw. The target
    * here is the zh slice (languages have disjoint synthetic vocab, so
    * enrichment is verifiable); production swaps any high-quality
    * corpus in as `targetLang`'s slice. Per language: population,
    * sampled docs, SUMMED sampled milli-weight (a total, not a mean —
    * it scales with the language's sampled count by design; divide by
    * n_sampled for a mean).
    *
    * Scale shape: one bigram explode → (doc, bucket) agg; the bucket
    * models and llr table are B-row (broadcast); the per-doc weight is
    * an exact long dot against that broadcast; Gumbel-top-k is a
    * TakeOrdered. No all-pairs, no window over the corpus, no RNG
    * state. NO ORACLE by design: the weights are ln-valued and
    * Math.log is not bit-portable across engines (a DuckDB recompute
    * can differ in the last ulp and flip a rounded milli-weight), so
    * the gate is the spec's driver-side recompute instead — same
    * discipline as the sketch/ANN rows. */
  val l39 = DQ(
    "l39_dsir_sample",
    (s, d) => {
      dsirSample(docs(s, d), "zh", 64)
        .groupBy("lang")
        .agg(
          count(lit(1)).as("n_docs"),
          sum(when(col("sampled"), 1L).otherwise(0L)).as("n_sampled"),
          coalesce(sum(when(col("sampled"), col("w_milli"))), lit(0L))
            .as("sampled_w_milli"),
          coalesce(sum(when(col("sampled"), col("doc_id"))), lit(0L))
            .as("sampled_checksum"))
        .orderBy("lang")
    },
    None)

  /** [[l42]]'s IVF-accelerated scale path, roles deliberately FLIPPED
    * from [[AnnIndexes.probeIvfBatch]]: there the queries broadcast and
    * the corpus is the index; here the INDEX is built over the (small,
    * bounded) eval suite and the 100 TB train corpus streams through as
    * the probed side — broadcasting the k-row centroid table and the
    * |eval|-row inverted lists, never the train side. Each train vector
    * ranks the centroids (k-row window per vector, l16's probe shape),
    * keeps its `nprobe` nearest eval cells, and pays exact cosines only
    * against eval vectors IN those cells — ~nprobe/k of the brute
    * screen's |eval| dots per row, the difference between 10⁴ and 10²
    * dot products per train document at a real eval-suite size.
    *
    * Approximation contract (the spec pins it on the planted corpus): a
    * contaminated train vector is a small perturbation of its eval
    * source, so its nearest eval CELL is the source's own cell and
    * recall on real contamination is total; what the probe may miss is
    * a pair near the threshold across a cell boundary — the same
    * residual the batch exact screen (the DQ) exists to audit. */
  private[operators] def semanticDecontamIvfFlags(evalVecs: DataFrame,
      train: DataFrame, k: Int, nprobe: Int): DataFrame = {
    val idx = AnnIndexes.buildIvf(
      evalVecs.select(col("vec_id"), col("v")), k, iters = 2)
    val evalSide = idx.lists
      .join(evalVecs.select(col("vec_id"), col("v").as("ev")), "vec_id")
      .select("cid", "ev")
    val ranked = train.crossJoin(broadcast(idx.centroids))
      .withColumn("d2", graft.functions.Ivf.dist2(col("cv"), col("v")))
    val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("cid"))
    val probes = ranked.withColumn("_rk", row_number().over(w))
      .filter(col("_rk") <= nprobe)
      .select(col("vec_id"), col("label"), col("v"), col("cid"))
    probes.join(broadcast(evalSide), "cid")
      .withColumn("cos_e4",
        round(lit(10000) *
          graft.functions.VectorOps.cosineNative(col("v"), col("ev")))
          .cast("long"))
      .groupBy("vec_id", "label")
      .agg(max("cos_e4").as("max_e4"))
      .withColumn("flagged", col("max_e4") >= lit(SemanticContamE4))
  }

  // ---------------------------------------------- l47 span decontam

  /** Span width for [[l47]]: 8 tokens — the window the Llama 2 report's
    * contamination analysis uses (Touvron et al. 2023 §A.6: a token is
    * contaminated when it appears in an ≥8-token n-gram shared with an
    * evaluation sample). Narrower than [[SpanK]] deliberately: the
    * decontamination question ("did eval text leak?") wants higher
    * recall than the dedup question ("is this span boilerplate?"), and
    * the corpus' 10-token minimum doc length means every eval doc can
    * plant a detectable tail at k = 8 but not at k = 15. */
  private[graft] val SpanContamK = 8

  /** Coverage bar: a train doc is FLAGGED when ≥ 80% of its tokens lie
    * inside shared spans (the "mostly contaminated" criterion; the
    * integer cross-multiply keeps the compare exact on both engines). */
  private[graft] val SpanContamFlagBp = 8000L

  /** The planted corpus for [[l47]]: the split-labeled documents plus,
    * for every TEST-split doc, one planted TRAIN doc at id + offset —
    * even test ids plant their TAIL verbatim (a fully-contaminated doc,
    * ~100% coverage), odd ids plant tail + token-REVERSED tail (a
    * half-contaminated doc: the reversed half shares no forward k-gram,
    * so coverage lands near 50%, under the 80% bar — pinning that the
    * bar separates "contains eval text" from "mostly eval text").
    * Construction is one expression battery used verbatim by both
    * engines (the catalog's standard fixture discipline — natural
    * cross-doc k-gram overlap does not exist in the synthetic corpus). */
  private[operators] def spanContamCorpus(s: SparkSession, d: String): DataFrame = {
    val base = splitLabeled(s, d).filter(col("text").isNotNull)
      .select("lang", "doc_id", "text", "split")
    val off = LlmQueries.plantedOffset(base, "doc_id")
    val tests = base.filter(col("split") === "test")
      .crossJoin(broadcast(off))
    val planted = tests.select(
      col("lang"), (col("doc_id") + col("_off")).as("doc_id"),
      when(col("doc_id") % 2 === 0,
        expr("substring(text, instr(text, ' ') + 1)"))
        .otherwise(expr(
          "concat(substring(text, instr(text, ' ') + 1), ' ', " +
            "concat_ws(' ', reverse(split(substring(text, instr(text, ' ') + 1), ' '))))"))
        .as("text"),
      lit("train").as("split"))
    base.unionByName(planted)
  }

  /** L47 core — span-coverage decontamination: per train doc, the
    * fraction of tokens lying in maximal verbatim spans (≥ k tokens)
    * shared with ANY eval-split doc. The third decontamination modality
    * beside l25/l35 (≥ 1 shared 5-gram — binary, high recall) and l42
    * (embedding similarity — catches paraphrase): published model
    * reports grade contamination by HOW MUCH of a doc is eval text,
    * which only span merging can measure — a doc quoting one eval
    * sentence is reportable; a doc that IS an eval record must be
    * dropped.
    *
    * Scale shape: the eval side is the benchmark suite — bounded by
    * construction — so its distinct-gram set broadcasts into the semi
    * join ([[spanGrams]] keeps train grams map-side); only HIT
    * positions (shared grams, a vanishing fraction) reach
    * [[mergeSpans]]' per-doc window; the coverage compare is an
    * integer cross-multiply at the rollup. Same probe family as L30's
    * streaming gate; `hashed` grams are the wire form there. */
  private[operators] def spanDecontam(labeled: DataFrame, k: Int): DataFrame = {
    val train = labeled.filter(col("split") === "train")
    val evalGrams = docGramsK(labeled.filter(col("split") === "test"),
      Seq.empty, k, hashed = false).select("gram").distinct()
    val hits = spanGrams(train, k, hashed = false)
      .join(evalGrams, Seq("gram"), "left_semi")
    val perDoc = mergeSpans(hits, k)
      .groupBy("lang", "doc_id")
      .agg(sum(col("e") - col("s")).cast("long").as("covered"))
    val flagBar = col("covered") * lit(10000L) >= col("n_tok") * SpanContamFlagBp
    train
      .select(col("lang"), col("doc_id"),
        size(split(lower(col("text")), "\\s+")).cast("long").as("n_tok"))
      .join(perDoc, Seq("lang", "doc_id"), "left")
      .withColumn("covered", coalesce(col("covered"), lit(0L)))
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_train"),
        sum(when(col("covered") > 0L, 1L).otherwise(0L)).as("n_overlap"),
        sum(when(flagBar, 1L).otherwise(0L)).as("n_flagged"),
        sum("covered").as("tokens_covered"),
        coalesce(sum(when(flagBar, col("doc_id"))), lit(0L))
          .as("flagged_checksum"))
      .orderBy("lang")
  }

  /** L47 — the DQ: span-coverage decontamination over the planted
    * corpus (see [[spanContamCorpus]]), flagging train docs ≥ 80%
    * covered by verbatim ≥ 8-token eval spans. */
  val l47 = DQ(
    "l47_span_decontam",
    (s, d) => spanDecontam(spanContamCorpus(s, d), SpanContamK),
    Some(s"""WITH base AS (
              SELECT lang, doc_id, text,
                CASE WHEN h IS NULL THEN NULL
                     WHEN h < 'c000' THEN 'train'
                     WHEN h < 'e000' THEN 'val' ELSE 'test' END AS split
              FROM (SELECT lang, doc_id, text,
                      substring(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 4) AS h
                    FROM documents WHERE text IS NOT NULL)),
            off AS (SELECT COALESCE(MAX(doc_id), -1) + 1 AS o FROM base),
            planted AS (
              SELECT lang, doc_id + off.o AS doc_id,
                CASE WHEN doc_id % 2 = 0
                  THEN substring(text, instr(text, ' ') + 1)
                  ELSE substring(text, instr(text, ' ') + 1) || ' ' ||
                    array_to_string(list_reverse(string_split(
                      substring(text, instr(text, ' ') + 1), ' ')), ' ')
                END AS text,
                'train' AS split
              FROM base, off WHERE split = 'test'),
            corpus AS (
              SELECT lang, doc_id, text, split FROM base
              UNION ALL
              SELECT lang, doc_id, text, split FROM planted),
            toks AS (
              SELECT lang, doc_id, split,
                string_split_regex(lower(text), '\\s+') AS ta
              FROM corpus),
            evalg AS (
              SELECT DISTINCT unnest(list_transform(range(len(ta) - ${SpanContamK - 1}),
                i -> array_to_string(list_slice(ta, i + 1, i + $SpanContamK), ' '))) AS gram
              FROM toks WHERE split = 'test' AND len(ta) >= $SpanContamK),
            posn AS (
              SELECT lang, doc_id, ta, unnest(range(len(ta) - ${SpanContamK - 1})) AS pos
              FROM toks WHERE split = 'train' AND len(ta) >= $SpanContamK),
            grams AS (
              SELECT lang, doc_id, pos,
                array_to_string(list_slice(ta, pos + 1, pos + $SpanContamK), ' ') AS gram
              FROM posn),
            hits AS (
              SELECT lang, doc_id, pos FROM grams
              WHERE gram IN (SELECT gram FROM evalg)),
            marked AS (
              SELECT lang, doc_id, pos,
                CASE WHEN pos > COALESCE(MAX(pos + $SpanContamK) OVER
                    (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1)
                  THEN 1 ELSE 0 END AS new_span
              FROM hits),
            spanid AS (
              SELECT lang, doc_id, pos,
                SUM(new_span) OVER (PARTITION BY doc_id ORDER BY pos
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
              FROM marked),
            spans AS (
              SELECT lang, doc_id, span_id,
                MIN(pos) AS s, MAX(pos) + $SpanContamK AS e
              FROM spanid GROUP BY 1, 2, 3),
            perdoc AS (
              SELECT lang, doc_id, SUM(e - s) AS covered
              FROM spans GROUP BY 1, 2),
            lab AS (
              SELECT n.lang, n.doc_id, CAST(len(n.ta) AS BIGINT) AS n_tok,
                CAST(COALESCE(p.covered, 0) AS BIGINT) AS covered
              FROM toks n LEFT JOIN perdoc p
                ON n.doc_id = p.doc_id AND n.lang = p.lang
              WHERE n.split = 'train')
            SELECT lang,
              CAST(COUNT(*) AS BIGINT) AS n_train,
              CAST(SUM(CASE WHEN covered > 0 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_overlap,
              CAST(SUM(CASE WHEN covered * 10000 >= n_tok * 8000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_flagged,
              CAST(SUM(covered) AS BIGINT) AS tokens_covered,
              CAST(COALESCE(SUM(CASE WHEN covered * 10000 >= n_tok * 8000
                THEN doc_id END), 0) AS BIGINT) AS flagged_checksum
            FROM lab GROUP BY 1 ORDER BY lang"""))

  /** L45 — temperature-resampled language mix (the multilingual
    * rebalancing recipe of XLM, Lample & Conneau 2019 §3.1, and mT5,
    * Xue et al. 2021 §3.2: sample languages with probability
    * q_l ∝ p_l^α, α < 1, so high-resource languages shrink toward — but
    * never to — parity). Realized at α = 0.5 with DATA-DEPENDENT keep
    * rates, the thing [[l20]]'s fixed thresholds cannot express: each
    * language keeps at rate r_l = √(n_min / n_l), anchored so the
    * SMALLEST language keeps everything (downsample-only — no
    * upsampling, so the mix is a pure filter). Kept counts then follow
    * k_l = √(n_min · n_l) ∝ √n_l, which renormalizes to exactly the
    * α = 0.5 temperature distribution.
    *
    * Cross-engine portability is why α is 0.5 and not mT5's 0.3:
    * p^0.3 = exp(0.3·ln p) and neither exp nor ln is bit-portable,
    * while √ is IEEE-correctly-rounded everywhere — so
    * u_l = round(65536·√(n_min/n_l)) is the SAME integer on both
    * engines (division and √ correctly rounded, ×65536 an exact
    * power-of-two scale), and the rate lands as a 4-hex md5-draw
    * threshold via %04x (u ≥ 65536 ⇒ 'zzzz', the keep-all sentinel —
    * '10000' would compare lexicographically wrong).
    *
    * Scale shape: ONE partial-aggregable lang count (L rows) + a 1-row
    * min, the L-row rate table broadcasts onto the corpus, and the
    * keep decision is the catalog's standard per-row md5 draw at the
    * scan (salt `tmix:<lang>` — independent of l20's and l22's draws).
    * No corpus shuffle before the rollup, no RNG state, no driver
    * action; re-running with a grown corpus only moves the L-row rate
    * table. Per language: population, target rate (bp), kept count,
    * realized rate (bp), kept-doc checksum. */
  val l45 = DQ(
    "l45_temperature_mix",
    (s, d) => {
      val dd = docs(s, d)
      val counts = dd.groupBy("lang").agg(count(lit(1)).as("n_total"))
      val nMin = counts.agg(min("n_total").as("n_min"))
      val rates = counts.crossJoin(broadcast(nMin))
        .withColumn("u",
          round(lit(65536.0) *
            sqrt(col("n_min").cast("double") / col("n_total"))).cast("long"))
        .withColumn("thr",
          when(col("u") >= 65536L, lit("zzzz"))
            .otherwise(format_string("%04x", col("u"))))
        .select("lang", "n_total", "u", "thr")
      val kept = dd
        .join(broadcast(rates.select("lang", "thr")), Seq("lang"))
        .withColumn("kept",
          Sampling.draw(col("doc_id"), concat(lit("tmix:"), col("lang")))
            < col("thr"))
        .groupBy("lang")
        .agg(
          sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
          coalesce(sum(when(col("kept"), col("doc_id"))), lit(0L))
            .as("kept_checksum"))
      rates.join(kept, Seq("lang"), "left")
        .select(col("lang"), col("n_total"),
          round(col("u") * lit(10000.0) / lit(65536.0)).cast("long")
            .as("target_bp"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          round(coalesce(col("n_kept"), lit(0L)) * lit(10000.0) / col("n_total"))
            .cast("long").as("kept_bp"),
          coalesce(col("kept_checksum"), lit(0L)).as("kept_checksum"))
        .orderBy("lang")
    },
    Some("""WITH t AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_total
                       FROM documents GROUP BY 1),
            r AS (SELECT lang, n_total,
                    CAST(ROUND(65536 * sqrt(
                      CAST((SELECT MIN(n_total) FROM t) AS DOUBLE) / n_total))
                      AS BIGINT) AS u
                  FROM t),
            r2 AS (SELECT lang, n_total, u,
                     CASE WHEN u >= 65536 THEN 'zzzz'
                          ELSE printf('%04x', u) END AS thr
                   FROM r),
            k AS (SELECT d.lang,
                    CAST(SUM(CASE WHEN
                        substring(md5(CAST(d.doc_id AS VARCHAR) || ':tmix:' || d.lang), 1, 4)
                          < r2.thr THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
                    CAST(COALESCE(SUM(CASE WHEN
                        substring(md5(CAST(d.doc_id AS VARCHAR) || ':tmix:' || d.lang), 1, 4)
                          < r2.thr THEN d.doc_id END), 0) AS BIGINT) AS kept_checksum
                  FROM documents d JOIN r2 ON d.lang = r2.lang GROUP BY 1)
            SELECT r2.lang AS lang, n_total,
              CAST(ROUND(u * 10000.0 / 65536.0) AS BIGINT) AS target_bp,
              COALESCE(n_kept, 0) AS n_kept,
              CAST(ROUND(COALESCE(n_kept, 0) * 10000.0 / n_total) AS BIGINT)
                AS kept_bp,
              COALESCE(kept_checksum, 0) AS kept_checksum
            FROM r2 LEFT JOIN k ON r2.lang = k.lang ORDER BY lang"""))

  /** [[l51]]'s two published constants: the budget is 3× the unique
    * corpus (a data-constrained run by construction — repeating is
    * unavoidable, and the cap genuinely BINDS: 2-3 of the corpus'
    * languages sit under 15% of total tokens, where 4×avail < 3×Σ/5) and no language repeats past 4 epochs (Muennighoff et
    * al.'s diminishing-returns knee). */
  private[operators] val BudgetPerUnique = 3L
  private[operators] val MaxEpochs = 4L

  /** L51 — epoch-repeat planning under a token budget (the
    * data-constrained scaling recipe, Muennighoff et al. 2023
    * arXiv:2305.16264: repeating data is nearly free up to ~4 epochs
    * and sharply diminishing after, so a budgeted multilingual run
    * allocates each language min(its target share, 4 × its unique
    * tokens) and reports the shortfall rather than over-repeating).
    * The planning arithmetic every training run does by hand, as an
    * operator: per language — unique available tokens (the l5/l21
    * tokenizer), the uniform target share of the 3×-corpus budget,
    * the realized allocation under the 4-epoch cap, the deficit a
    * planner must reallocate or accept, and the realization split into
    * full epochs + partial-epoch tokens. ALL integer arithmetic (div /
    * min / mod over token counts — engines cannot disagree), div
    * guarded for the degenerate zero-token language under ANSI.
    *
    * Scale shape: ONE partial-aggregable (lang, Σtok) agg + a 1-row
    * (total, n_langs) broadcast; everything after is per-row integer
    * math on an L-row frame. */
  val l51 = DQ(
    "l51_epoch_plan",
    (s, d) => {
      val avail = docs(s, d).filter(col("text").isNotNull)
        .groupBy("lang").agg(sum(nTok(col("text"))).as("avail_tokens"))
      val totals = avail.agg(
        sum("avail_tokens").as("corpus_tokens"),
        count(lit(1)).as("n_langs"))
      avail.crossJoin(broadcast(totals))
        .withColumn("target_tokens",
          expr(s"(corpus_tokens * ${BudgetPerUnique}L) div n_langs"))
        .withColumn("realized_tokens",
          least(col("target_tokens"), col("avail_tokens") * lit(MaxEpochs)))
        .withColumn("deficit_tokens",
          col("target_tokens") - col("realized_tokens"))
        .withColumn("n_epochs_full",
          when(col("avail_tokens") > 0L,
            expr("realized_tokens div avail_tokens")).otherwise(0L))
        .withColumn("partial_tokens",
          when(col("avail_tokens") > 0L,
            expr("realized_tokens % avail_tokens")).otherwise(0L))
        .select("lang", "avail_tokens", "target_tokens", "realized_tokens",
          "deficit_tokens", "n_epochs_full", "partial_tokens")
        .orderBy("lang")
    },
    Some("""WITH a AS (
              SELECT lang,
                CAST(SUM(len(regexp_extract_all(lower(text),
                  '[a-z]+|[0-9]+|[^a-z0-9\s]'))) AS BIGINT) AS avail_tokens
              FROM documents WHERE text IS NOT NULL GROUP BY 1),
            t AS (SELECT CAST(SUM(avail_tokens) AS BIGINT) AS corpus_tokens,
                         CAST(COUNT(*) AS BIGINT) AS n_langs FROM a),
            p AS (
              SELECT lang, avail_tokens,
                (corpus_tokens * 3) // n_langs AS target_tokens,
                LEAST((corpus_tokens * 3) // n_langs, avail_tokens * 4)
                  AS realized_tokens
              FROM a, t)
            SELECT lang, avail_tokens, target_tokens, realized_tokens,
              target_tokens - realized_tokens AS deficit_tokens,
              CASE WHEN avail_tokens > 0 THEN realized_tokens // avail_tokens
                   ELSE 0 END AS n_epochs_full,
              CASE WHEN avail_tokens > 0 THEN realized_tokens % avail_tokens
                   ELSE 0 END AS partial_tokens
            FROM p ORDER BY lang"""))

  /** [[l55]]'s shard count as a hex-prefix width: 1 hex digit = 16
    * shards. At 100 TB the width grows so each shard hits the target
    * file size (the k ∝ n discipline of [[graft.functions.Ivf
    * .cellCount]]): 4 digits = 65 536 shards ≈ 1.5 GB each — the
    * width is the ONLY thing that changes, never the plan shape. */
  private[operators] val EpochShardHexDigits = 1

  /** L55 — deterministic epoch shuffle (the training-order step every
    * pretraining run needs: a reproducible global permutation of the
    * corpus per epoch, sharded for parallel writers, reproducible on
    * any cluster size and under replay — T5/GPT-NeoX-style seeded
    * data ordering). The order key is the catalog's standard md5 draw
    * salted by the epoch (':epoch0', ':epoch1' — independent
    * permutations per epoch by construction); the SHARD is the key's
    * leading hex digit, so shards are contiguous RANGES of the global
    * order — reading shard files in shard order replays the exact
    * permutation — and balanced in expectation. Per (epoch, shard):
    * doc/char counts, the membership checksum, and `order_fp` =
    * Σ position·doc_id — a fingerprint that pins the exact SEQUENCE,
    * not just membership (any swap of two docs changes it).
    *
    * Scale shape: the order key and shard are row-local (evaluated at
    * the scan); the only exchange is the per-(epoch, shard) window's,
    * and the shard width keeps each window partition at the shard
    * file-size target by construction — the window never sees more
    * than one shard. A deployment materializing the order writes
    * `repartitionByRange(ord).sortWithinPartitions(ord)` with the SAME
    * key and no window at all; the DQ form folds the permutation into
    * checkable 32-row arithmetic instead of dumping 100 TB. */
  val l55 = DQ(
    "l55_epoch_shuffle",
    (s, d) => {
      val w = Window
        .partitionBy(col("epoch"), col("shard"))
        .orderBy(col("ord"), col("doc_id"))
      docs(s, d).filter(col("text").isNotNull)
        .select(col("doc_id"), col("n_chars"),
          explode(array(lit(0), lit(1))).as("epoch"))
        .withColumn("ord",
          substring(md5(concat(col("doc_id").cast("string"),
            lit(":epoch"), col("epoch").cast("string"))), 1, 8))
        .withColumn("shard",
          conv(substring(col("ord"), 1, EpochShardHexDigits), 16, 10)
            .cast("long"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .groupBy("epoch", "shard")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").as("n_chars"),
          sum("doc_id").as("id_checksum"),
          sum(col("pos") * col("doc_id")).as("order_fp"))
        .orderBy("epoch", "shard")
    },
    Some(s"""WITH d AS (
              SELECT doc_id, n_chars FROM documents WHERE text IS NOT NULL),
            e AS (
              SELECT doc_id, n_chars, epoch,
                substring(md5(CAST(doc_id AS VARCHAR) || ':epoch'
                  || CAST(epoch AS VARCHAR)), 1, 8) AS ord
              FROM d, (SELECT unnest([0, 1]) AS epoch)),
            sharded AS (
              SELECT epoch, doc_id, n_chars, ord,
                CAST(('0x' || substring(ord, 1, $EpochShardHexDigits)) AS BIGINT) AS shard,
                row_number() OVER (PARTITION BY epoch, substring(ord, 1, $EpochShardHexDigits)
                                   ORDER BY ord, doc_id) AS pos
              FROM e)
            SELECT epoch, shard,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(n_chars) AS BIGINT) AS n_chars,
              CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
              CAST(SUM(pos * doc_id) AS BIGINT) AS order_fp
            FROM sharded GROUP BY 1, 2 ORDER BY epoch, shard"""))

  /** L60 — quality-curriculum ordering (the annealing-phase data
    * order of published training runs — MiniCPM's decay-phase
    * high-quality mix, OLMo's mid-training anneal, classic curriculum
    * learning: the BEST data is scheduled LAST, where the learning-rate
    * decay spends it): [[l55]]'s deterministic epoch-shuffle machinery
    * composed with l34's hashed-feature scorer (the SAME
    * [[CleaningQueries.scoreMilliSql]] fold, integer milli-scores so
    * engines cannot disagree on a phase boundary). Phase 0 = score ≤ 0
    * (bulk data first), phase 1 = score > 0 (quality anneal last);
    * within a phase the order/shard/position machinery is exactly
    * l55's (md5 order key salted ':curriculum', leading-hex shards =
    * contiguous ranges). Per (phase, shard): doc/char counts, the
    * membership checksum, `order_fp` = Σ pos·doc_id pinning the exact
    * sequence, and the phase's score mass (strictly ≤ 0 for phase 0,
    * > 0 for phase 1 — the partition claim as an output).
    *
    * Scale shape: scoring and the order key are row-local (one fold
    * per doc, evaluated at the scan); the only exchange is the
    * per-(phase, shard) window's, shard-width-bounded exactly as l55.
    * A deployment materializes `repartitionByRange(phase, ord)` +
    * `sortWithinPartitions` with no window at all. */
  val l60 = DQ(
    "l60_curriculum_order",
    (s, d) => {
      val w = Window
        .partitionBy(col("phase"), col("shard"))
        .orderBy(col("ord"), col("doc_id"))
      docs(s, d).filter(col("text").isNotNull)
        .withColumn("ta", split(lower(col("text")), "\\s+"))
        .withColumn("score_milli", expr(CleaningQueries.scoreMilliSql))
        .withColumn("phase",
          when(col("score_milli") > 0L, 1).otherwise(0))
        .withColumn("ord",
          substring(md5(concat(col("doc_id").cast("string"),
            lit(":curriculum"))), 1, 8))
        .withColumn("shard",
          conv(substring(col("ord"), 1, EpochShardHexDigits), 16, 10)
            .cast("long"))
        .withColumn("pos", row_number().over(w).cast("long"))
        .groupBy("phase", "shard")
        .agg(
          count(lit(1)).as("n_docs"),
          sum("n_chars").as("n_chars"),
          sum("doc_id").as("id_checksum"),
          sum(col("pos") * col("doc_id")).as("order_fp"),
          sum("score_milli").as("score_mass"))
        .orderBy("phase", "shard")
    },
    Some(s"""WITH scored AS (
              SELECT doc_id, n_chars,
                ${CleaningQueries.duckScoreSql} AS score_milli
              FROM documents WHERE text IS NOT NULL),
            keyed AS (
              SELECT doc_id, n_chars, score_milli,
                CASE WHEN score_milli > 0 THEN 1 ELSE 0 END AS phase,
                substring(md5(CAST(doc_id AS VARCHAR) || ':curriculum'),
                  1, 8) AS ord
              FROM scored),
            sharded AS (
              SELECT phase, doc_id, n_chars, score_milli, ord,
                CAST(('0x' || substring(ord, 1, $EpochShardHexDigits))
                  AS BIGINT) AS shard,
                row_number() OVER (
                  PARTITION BY phase, substring(ord, 1, $EpochShardHexDigits)
                  ORDER BY ord, doc_id) AS pos
              FROM keyed)
            SELECT phase, shard,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(n_chars) AS BIGINT) AS n_chars,
              CAST(SUM(doc_id) AS BIGINT) AS id_checksum,
              CAST(SUM(pos * doc_id) AS BIGINT) AS order_fp,
              CAST(SUM(score_milli) AS BIGINT) AS score_mass
            FROM sharded GROUP BY 1, 2 ORDER BY phase, shard"""))

  /** [[l61]]'s budget: 9/10 of the corpus' total tokens — chosen so
    * the fixture splits (this corpus: the four smaller languages fit
    * under the water line whole, English caps) and both allocator arms
    * are exercised at every sf. */
  private val WaterfillBudgetNum = 9L
  private val WaterfillBudgetDen = 10L

  /** L61 — budget-constrained waterfill allocation (the proportional-
    * fair token-budget solve behind every "train on T tokens from
    * these sources" decision — the max-min-fair allocation classic:
    * every language below its fair share keeps EVERYTHING, the rest
    * cap at the common water level, the unique level L with
    * Σ min(avail, L) ≤ B maximal; [[l45]] draws a temperature-shaped
    * sample, [[l51]] prices epochs for a fixed mix — this SOLVES the
    * mix when the budget binds). All-integer arithmetic: the
    * breakpoint search is the sorted-prefix formula
    * level_i = (B − Σ_{j<i} avail_j) ÷ (n − i + 1), the level is the
    * first rank where avail exceeds it, allocations are
    * min(avail, level) — engines cannot disagree on a boundary. Per
    * language: availability, allocation, the capped flag, the shared
    * budget, and the realized water level (−1 when the budget never
    * binds).
    *
    * Scale shape: availability is one partial-aggregable token agg;
    * everything after runs on the L-row language frame (a window over
    * L rows, a 1-row level broadcast) — corpus-size-independent. */
  val l61 = DQ(
    "l61_budget_waterfill",
    (s, d) => {
      val inf = Long.MaxValue
      val avail = docs(s, d).filter(col("text").isNotNull)
        .select(col("lang"),
          size(VocabIndex.tokens(col("text"))).cast("long").as("n_tok"))
        .groupBy("lang").agg(sum("n_tok").as("avail"))
      val budget = avail.agg(
        expr(s"(sum(avail) * $WaterfillBudgetNum) div $WaterfillBudgetDen")
          .as("b"),
        count(lit(1)).as("n"))
      // un-partitioned window over the L-row language frame —
      // language-cardinality by construction; WindowExec's "No
      // Partition Defined" warning is the design, not a hazard
      val w = Window.orderBy(col("avail"), col("lang"))
      val lv = avail
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("cb", coalesce(sum("avail").over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .crossJoin(broadcast(budget))
        .withColumn("level_here",
          expr("(b - cb) div (n - rk + 1)"))
      val level = lv.filter(col("avail") > col("level_here"))
        .orderBy("rk").limit(1)
        .select(col("level_here").as("level"))
        .agg(coalesce(min("level"), lit(inf)).as("level"))
      lv.crossJoin(broadcast(level))
        .select(col("lang"), col("avail"),
          least(col("avail"), col("level")).as("allocated"),
          (col("avail") > col("level")).as("capped"),
          col("b").as("budget"),
          when(col("level") === inf, -1L).otherwise(col("level"))
            .as("water_level"))
        .orderBy("lang")
    },
    Some(s"""WITH avail AS (
              SELECT lang,
                CAST(SUM(len(regexp_extract_all(lower(text),
                  '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS BIGINT) AS avail
              FROM documents WHERE text IS NOT NULL GROUP BY 1),
            budget AS (
              SELECT CAST((SUM(avail) * $WaterfillBudgetNum) // $WaterfillBudgetDen
                       AS BIGINT) AS b,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM avail),
            ranked AS (
              SELECT lang, avail,
                CAST(row_number() OVER (ORDER BY avail, lang) AS BIGINT) AS rk,
                CAST(COALESCE(SUM(avail) OVER (ORDER BY avail, lang
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cb
              FROM avail),
            lv AS (
              SELECT r.*, b.b,
                CAST((b.b - r.cb) // (b.n - r.rk + 1) AS BIGINT) AS level_here
              FROM ranked r, budget b),
            wl AS (
              SELECT CAST(COALESCE(
                (SELECT level_here FROM lv WHERE avail > level_here
                 ORDER BY rk LIMIT 1),
                9223372036854775807) AS BIGINT) AS level)
            SELECT l.lang, l.avail,
              CAST(LEAST(l.avail, w.level) AS BIGINT) AS allocated,
              (l.avail > w.level) AS capped,
              l.b AS budget,
              CASE WHEN w.level = 9223372036854775807 THEN CAST(-1 AS BIGINT)
                   ELSE w.level END AS water_level
            FROM lv l, wl w ORDER BY lang"""))

  /** L62 — the composed MIX-PLANNING report: the three allocators the
    * catalog proves separately ([[l45]] temperature rates, [[l51]]
    * epoch-repeat caps, [[l61]] budget waterfill) all reduce to the
    * same per-language availability frame, and the report a
    * data-mixture decision actually reads carries all three side by
    * side — ONE corpus scan, one L-row frame, every column the same
    * arithmetic as its standalone operator (MixPlanSpec pins
    * column-for-column equality against the three green pipelines).
    * Per language: doc/token availability, the temperature-mix target
    * share (α=0.5, basis points), the 3×-budget epoch plan
    * (target/realized/deficit, full epochs + partial tokens, 4-epoch
    * cap), and the 9/10-budget waterfill solve (allocation, capped
    * flag, shared budget, water level).
    *
    * Scale shape: one partial-aggregable (lang, count, Σtok) agg; the
    * totals are a 1-row broadcast; everything after is per-row integer
    * math and one window on the L-row language frame —
    * corpus-size-independent, exactly the standalone allocators'
    * shapes. */
  val l62 = DQ(
    "l62_mix_plan",
    (s, d) => {
      val inf = Long.MaxValue
      val base = docs(s, d).filter(col("text").isNotNull)
        .groupBy("lang").agg(
          count(lit(1)).as("n_docs"),
          sum(nTok(col("text"))).as("avail_tokens"))
      val totals = base.agg(
        min("n_docs").as("n_min"),
        sum("avail_tokens").as("corpus_tokens"),
        count(lit(1)).as("n_langs"),
        expr(s"(sum(avail_tokens) * $WaterfillBudgetNum)" +
          s" div $WaterfillBudgetDen").as("b"))
      val withT = base.crossJoin(broadcast(totals))
        .withColumn("u",
          round(lit(65536.0) *
            sqrt(col("n_min").cast("double") / col("n_docs"))).cast("long"))
        .withColumn("temp_bp",
          round(col("u") * lit(10000.0) / lit(65536.0)).cast("long"))
        .withColumn("target_tokens",
          expr(s"(corpus_tokens * ${BudgetPerUnique}L) div n_langs"))
        .withColumn("realized_tokens",
          least(col("target_tokens"), col("avail_tokens") * lit(MaxEpochs)))
        .withColumn("deficit_tokens",
          col("target_tokens") - col("realized_tokens"))
        .withColumn("n_epochs_full",
          when(col("avail_tokens") > 0L,
            expr("realized_tokens div avail_tokens")).otherwise(0L))
        .withColumn("partial_tokens",
          when(col("avail_tokens") > 0L,
            expr("realized_tokens % avail_tokens")).otherwise(0L))
      // un-partitioned window over the L-row language frame —
      // language-cardinality by construction; WindowExec's "No
      // Partition Defined" warning is the design, not a hazard
      val w = Window.orderBy(col("avail_tokens"), col("lang"))
      val lv = withT
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("cb", coalesce(sum("avail_tokens").over(
          w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .withColumn("level_here",
          expr("(b - cb) div (n_langs - rk + 1)"))
      val level = lv.filter(col("avail_tokens") > col("level_here"))
        .orderBy("rk").limit(1)
        .select(col("level_here").as("level"))
        .agg(coalesce(min("level"), lit(inf)).as("level"))
      lv.crossJoin(broadcast(level))
        .select(col("lang"), col("n_docs"), col("avail_tokens"),
          col("temp_bp"), col("target_tokens"), col("realized_tokens"),
          col("deficit_tokens"), col("n_epochs_full"), col("partial_tokens"),
          least(col("avail_tokens"), col("level")).as("allocated"),
          (col("avail_tokens") > col("level")).as("capped"),
          col("b").as("budget"),
          when(col("level") === inf, -1L).otherwise(col("level"))
            .as("water_level"))
        .orderBy("lang")
    },
    Some(s"""WITH base AS (
              SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(len(regexp_extract_all(lower(text),
                  '[a-z]+|[0-9]+|[^a-z0-9\\s]'))) AS BIGINT) AS avail_tokens
              FROM documents WHERE text IS NOT NULL GROUP BY 1),
            t AS (SELECT CAST(MIN(n_docs) AS BIGINT) AS n_min,
                    CAST(SUM(avail_tokens) AS BIGINT) AS corpus_tokens,
                    CAST(COUNT(*) AS BIGINT) AS n_langs,
                    CAST((SUM(avail_tokens) * $WaterfillBudgetNum)
                      // $WaterfillBudgetDen AS BIGINT) AS b
                  FROM base),
            p AS (
              SELECT base.*, t.*,
                CAST(ROUND(65536 * sqrt(CAST(n_min AS DOUBLE) / n_docs))
                  AS BIGINT) AS u,
                CAST((corpus_tokens * $BudgetPerUnique) // n_langs
                  AS BIGINT) AS target_tokens
              FROM base, t),
            p2 AS (
              SELECT *,
                CAST(ROUND(u * 10000.0 / 65536.0) AS BIGINT) AS temp_bp,
                CAST(LEAST(target_tokens, avail_tokens * $MaxEpochs)
                  AS BIGINT) AS realized_tokens
              FROM p),
            ranked AS (
              SELECT *,
                CAST(row_number() OVER (ORDER BY avail_tokens, lang)
                  AS BIGINT) AS rk,
                CAST(COALESCE(SUM(avail_tokens) OVER (
                  ORDER BY avail_tokens, lang
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS cb
              FROM p2),
            lv AS (
              SELECT *,
                CAST((b - cb) // (n_langs - rk + 1) AS BIGINT) AS level_here
              FROM ranked),
            wl AS (
              SELECT CAST(COALESCE(
                (SELECT level_here FROM lv WHERE avail_tokens > level_here
                 ORDER BY rk LIMIT 1),
                9223372036854775807) AS BIGINT) AS level)
            SELECT l.lang, l.n_docs, l.avail_tokens, l.temp_bp,
              l.target_tokens, l.realized_tokens,
              CAST(l.target_tokens - l.realized_tokens AS BIGINT)
                AS deficit_tokens,
              CAST(CASE WHEN l.avail_tokens > 0
                   THEN l.realized_tokens // l.avail_tokens ELSE 0 END
                AS BIGINT) AS n_epochs_full,
              CAST(CASE WHEN l.avail_tokens > 0
                   THEN l.realized_tokens % l.avail_tokens ELSE 0 END
                AS BIGINT) AS partial_tokens,
              CAST(LEAST(l.avail_tokens, w.level) AS BIGINT) AS allocated,
              (l.avail_tokens > w.level) AS capped,
              l.b AS budget,
              CASE WHEN w.level = 9223372036854775807 THEN CAST(-1 AS BIGINT)
                   ELSE w.level END AS water_level
            FROM lv l, wl w ORDER BY lang"""))

  val all: Seq[DQ] = Seq(l20, l21, l22, l23, l25, l33, l35, l39, l40, l42,
    l45, l47, l51, l55, l60, l61, l62, l64, l65)
}
