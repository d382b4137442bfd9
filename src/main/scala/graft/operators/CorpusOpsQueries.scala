package graft.operators

import graft.{DQ, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus LIFECYCLE operators — the snapshot-management layer a
  * long-running training-data pipeline needs around the per-document
  * stages: release-over-release accounting ("what changed between
  * corpus v1 and v2, per source"), the audit that gates every
  * retraining decision (did a source silently churn? did a cleaning
  * rule rewrite half the corpus?).
  */
object CorpusOpsQueries {

  private def docs(s: SparkSession, d: String) = Tables.documents(s, d)

  /** The planted PREVIOUS snapshot for [[l44]], derived in-query from
    * the current corpus by one SQL expression battery used verbatim on
    * both engines (the catalog's standard fixture discipline — there is
    * only one stored snapshot, so version history must be planted):
    *  - docs with `doc_id % 7 = 0` are ABSENT from v1 (added in v2);
    *  - docs with `doc_id % 11 = 0` carry an ' edited' suffix in v1
    *    (modified in v2; %7 wins when both apply — the doc is simply
    *    new);
    *  - v1 additionally holds REMOVED docs at id + offset (one per
    *    `doc_id % 13 = 0` source doc), absent from v2. */
  private val v1FilterSql = "doc_id % 7 <> 0"
  private val v1TextSql =
    "CASE WHEN doc_id % 11 = 0 THEN concat(text, ' edited') ELSE text END"

  /** The planted v1 snapshot as a frame — (doc_id, source, text) —
    * shared by [[l44]] (key diff) and [[l46]] (content screen) so the
    * two operators describe the SAME version history. */
  private[operators] def v1Snapshot(cur: DataFrame): DataFrame = {
    val off = LlmQueries.plantedOffset(cur, "doc_id")
    val v1Base = cur.filter(expr(v1FilterSql))
      .select(col("doc_id"), col("source"), expr(v1TextSql).as("text"))
    val v1Removed = cur.filter(col("doc_id") % 13 === 0)
      .crossJoin(broadcast(off))
      .select((col("doc_id") + col("_off")).as("doc_id"), col("source"),
        col("text"))
    v1Base.unionByName(v1Removed)
  }

  /** The v1 CTE shared by both oracles — identical construction to
    * [[v1Snapshot]], executed by DuckDB. */
  private val v1CteSql = s"""cur AS (
              SELECT doc_id, source, text FROM documents
              WHERE text IS NOT NULL),
            off AS (SELECT COALESCE(MAX(doc_id), -1) + 1 AS o FROM cur),
            v1 AS (
              SELECT doc_id, source,
                $v1TextSql AS text
              FROM cur WHERE $v1FilterSql
              UNION ALL
              SELECT c.doc_id + off.o AS doc_id, c.source, c.text
              FROM cur c, off WHERE c.doc_id % 13 = 0)"""

  /** L44 — corpus snapshot diff: classify every document of two corpus
    * versions as added / removed / modified / unchanged by primary key
    * and content, rolled up per source with identity checksums. The
    * operational core of incremental corpus versioning: a release
    * pipeline diffs v_{n} against v_{n-1} to audit churn before
    * training sees it, and the added/modified slice IS the increment
    * that downstream indexes (l33's substring index, the ANN indexes,
    * the dedup sketches) append rather than rebuild.
    *
    * Scale shape: ONE full-outer equi-join on the primary key — the
    * co-partitionable shape (both snapshots bucketed by doc_id diff
    * with zero extra shuffle; identically-partitioned snapshot tables
    * diff partition-by-partition) — then a partial-aggregable rollup.
    * Content comparison is direct string equality inside the join
    * projection (at 100 TB the snapshots carry a stored content hash
    * and the diff never reads text at all — same plan, 32-byte
    * column). */
  val l44 = DQ(
    "l44_snapshot_diff",
    (s, d) => {
      val cur = docs(s, d).filter(col("text").isNotNull)
      val v1 = v1Snapshot(cur)
      val v2 = cur.select(col("doc_id"), col("source"), col("text"))
      v1.select(col("doc_id"), col("source").as("src1"), col("text").as("t1"))
        .join(v2.select(col("doc_id"), col("source").as("src2"),
          col("text").as("t2")), Seq("doc_id"), "full_outer")
        .withColumn("source", coalesce(col("src2"), col("src1")))
        .withColumn("status",
          when(col("t1").isNull, "added")
            .when(col("t2").isNull, "removed")
            .when(col("t1") =!= col("t2"), "modified")
            .otherwise("unchanged"))
        .groupBy("source")
        .agg(
          sum(when(col("status") === "added", 1L).otherwise(0L)).as("n_added"),
          sum(when(col("status") === "removed", 1L).otherwise(0L)).as("n_removed"),
          sum(when(col("status") === "modified", 1L).otherwise(0L)).as("n_modified"),
          sum(when(col("status") === "unchanged", 1L).otherwise(0L)).as("n_unchanged"),
          coalesce(sum(when(col("status") === "added", col("doc_id"))), lit(0L))
            .as("added_checksum"),
          coalesce(sum(when(col("status") === "modified", col("doc_id"))), lit(0L))
            .as("modified_checksum"))
        .orderBy("source")
    },
    Some(s"""WITH $v1CteSql,
            j AS (
              SELECT COALESCE(v2.doc_id, v1.doc_id) AS doc_id,
                COALESCE(v2.source, v1.source) AS source,
                CASE WHEN v1.doc_id IS NULL THEN 'added'
                     WHEN v2.doc_id IS NULL THEN 'removed'
                     WHEN v1.text <> v2.text THEN 'modified'
                     ELSE 'unchanged' END AS status
              FROM v1 FULL OUTER JOIN cur v2 ON v1.doc_id = v2.doc_id)
            SELECT source,
              CAST(SUM(CASE WHEN status = 'added' THEN 1 ELSE 0 END) AS BIGINT)
                AS n_added,
              CAST(SUM(CASE WHEN status = 'removed' THEN 1 ELSE 0 END) AS BIGINT)
                AS n_removed,
              CAST(SUM(CASE WHEN status = 'modified' THEN 1 ELSE 0 END) AS BIGINT)
                AS n_modified,
              CAST(SUM(CASE WHEN status = 'unchanged' THEN 1 ELSE 0 END) AS BIGINT)
                AS n_unchanged,
              CAST(COALESCE(SUM(CASE WHEN status = 'added' THEN doc_id END), 0)
                AS BIGINT) AS added_checksum,
              CAST(COALESCE(SUM(CASE WHEN status = 'modified' THEN doc_id END), 0)
                AS BIGINT) AS modified_checksum
            FROM j GROUP BY 1 ORDER BY source"""))

  /** The l44 increment as a frame: every doc whose doc_id-keyed row
    * changed, labeled added / modified by the diff's own rules. */
  private[operators] def incrementOf(cur: DataFrame): DataFrame =
    cur
      .filter(col("doc_id") % 7 === 0 || col("doc_id") % 11 === 0)
      .withColumn("status",
        when(col("doc_id") % 7 === 0, "added").otherwise("modified"))

  /** The PROBE half of [[l46]], factored so the hash set can come from
    * either the in-query v1 fixture (the DQ) or the persisted index
    * ([[DedupIndex.read]]) — identical plan from the hash frame down,
    * so screen-from-disk cannot drift from the composed DQ. `hashes`
    * must carry one column `h` (canonical content hashes, duplicates
    * tolerated — the distinct here is index-sized, partial-aggregable). */
  private[graft] def screenAgainst(inc: DataFrame, hashes: DataFrame): DataFrame =
    inc
      .select(col("doc_id"), col("status"), DedupIndex.contentHash.as("h"))
      .join(hashes.select("h").distinct().withColumn("_hit", lit(1)),
        Seq("h"), "left")
      .withColumn("known", col("_hit").isNotNull)
      .groupBy("status")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("known"), 1L).otherwise(0L)).as("n_known"),
        sum(when(!col("known"), 1L).otherwise(0L)).as("n_novel"),
        coalesce(sum(when(col("known"), col("doc_id"))), lit(0L))
          .as("known_checksum"),
        coalesce(sum(when(!col("known"), col("doc_id"))), lit(0L))
          .as("novel_checksum"))
      .orderBy("status")

  /** The increment screen shared by the [[l46]] DQ and its spec: label
    * every increment doc (added / modified per l44's key rules) as
    * content-`known` (its canonical hash exists somewhere in v1) or
    * content-`novel`, rolled up per status with identity checksums. */
  private[operators] def incrementScreen(cur: DataFrame): DataFrame =
    screenAgainst(incrementOf(cur),
      v1Snapshot(cur).select(DedupIndex.contentHash.as("h")))

  /** L46 — incremental dedup of the version increment: the operational
    * composition l44 exists FOR. A release pipeline takes the diff's
    * added+modified slice (the increment — everything whose doc_id-keyed
    * row changed) and screens its CONTENT against the previous
    * snapshot's canonical hash set (l1's normHash — the same definition
    * as the batch dedup and the streaming ingest gate, so the three can
    * never disagree) before admitting it: a doc REMOVED under an old id
    * and re-crawled under a new one is key-`added` but content-`known`,
    * and admitting it would undo the dedup the last release performed.
    * Here the known class is non-empty by l44's own planted history —
    * added docs at `doc_id % 91 = 0` (added-by-key ∧ planted-removed, 7·13)
    * re-carry a v1 removed doc's text, and modified docs at
    * `% 143 = 0` (11·13) revert to a text v1 still holds — so the gate
    * pins WHICH increment docs the screen must refuse, by construction.
    *
    * Scale shape: v1's hash set is the PERSISTED exact-dedup index a
    * deployment already maintains (l1's hash table / l17's state) —
    * built once per release, partial-aggregable distinct; the increment
    * (small by definition — it is the CHANGE, not the corpus) probes it
    * with one equi-join on 32-byte keys, co-partitioned when both sides
    * bucket by hash, Bloom-prefiltered (l35's sketch) when the index
    * must stay on disk. The v2 corpus never shuffles: only increment
    * rows carry into the join. */
  val l46 = DQ(
    "l46_incremental_dedup",
    (s, d) => incrementScreen(docs(s, d).filter(col("text").isNotNull)),
    Some(s"""WITH $v1CteSql,
            v1h AS (SELECT DISTINCT sha256(lower(trim(text))) AS h FROM v1),
            inc AS (
              SELECT doc_id,
                CASE WHEN doc_id % 7 = 0 THEN 'added' ELSE 'modified' END AS status,
                sha256(lower(trim(text))) AS h
              FROM cur WHERE doc_id % 7 = 0 OR doc_id % 11 = 0),
            lab AS (
              SELECT inc.doc_id, inc.status, (v1h.h IS NOT NULL) AS known
              FROM inc LEFT JOIN v1h ON inc.h = v1h.h)
            SELECT status,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN known THEN 1 ELSE 0 END) AS BIGINT) AS n_known,
              CAST(SUM(CASE WHEN known THEN 0 ELSE 1 END) AS BIGINT) AS n_novel,
              CAST(COALESCE(SUM(CASE WHEN known THEN doc_id END), 0) AS BIGINT)
                AS known_checksum,
              CAST(COALESCE(SUM(CASE WHEN known THEN 0 ELSE doc_id END), 0) AS BIGINT)
                AS novel_checksum
            FROM lab GROUP BY 1 ORDER BY status"""))

  /** [[l48]]'s gram width (l33's [[SamplingQueries.SpanK]] criterion —
    * "long verbatim run", the grain at which shared content means shared
    * PROVENANCE rather than shared phrasing) and its chrome bar: a gram
    * present in more than `DfCap` sources is site chrome / template
    * text, not provenance signal — exactly l38's document-frequency
    * argument one level up — and excluding it is what bounds the
    * per-gram pair fan-out at scale (a df-capped gram emits at most
    * DfCap·(DfCap−1)/2 source pairs; an uncapped cookie banner in every
    * source would emit |sources|²). */
  private[operators] val OverlapK = 15
  private[operators] val OverlapDfCap = 8

  /** L48 core — pairwise source-overlap matrix over distinct word
    * k-grams: for every source pair sharing at least one (non-chrome)
    * gram, the shared-gram count and Jaccard similarity. */
  private[operators] def sourceOverlap(cur: DataFrame, k: Int,
      dfCap: Int): DataFrame = {
    // the overlap question is SOURCE-grained — doc identity never
    // reaches the output, so the mirror needs no planted-offset ids
    val mirrored = cur.filter(col("doc_id") % 10 === 0)
      .select(concat(lit("m_"), col("source")).as("source"),
        expr("substring(text, instr(text, ' ') + 1)").as("text"))
    val corpus = cur.select("source", "text").unionByName(mirrored)
    // per-source distinct grams with each gram's source-df, one gram
    // shuffle; the frame feeds three consumers (totals + both join
    // sides) — checkpointed once, the l29/l33 shared-subtree discipline
    val kept = SamplingQueries.docGramsK(corpus, Seq("source"), k, hashed = false)
      .select("source", "gram").distinct()
      .withColumn("sdf", count(lit(1)).over(Window.partitionBy("gram")))
      .filter(col("sdf") <= dfCap)
      .select("source", "gram")
      // eager: three consumers (totals + both self-join sides) race
      // through a lazy pin as concurrent AQE stages, each recomputing
      // the gram window until the cache lands (the round-19 decide-pin
      // lesson); one up-front job materializes it exactly once
      .localCheckpoint()
    val tot = kept.groupBy("source").agg(count(lit(1)).as("n_grams"))
    val pairs = kept.select(col("gram"), col("source").as("src_a"))
      .join(kept.select(col("gram"), col("source").as("src_b")), Seq("gram"))
      .filter(col("src_a") < col("src_b"))
      .groupBy("src_a", "src_b")
      .agg(count(lit(1)).as("n_shared"))
    pairs
      .join(tot.select(col("source").as("src_a"), col("n_grams").as("grams_a")),
        Seq("src_a"))
      .join(tot.select(col("source").as("src_b"), col("n_grams").as("grams_b")),
        Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("grams_a"), col("grams_b"),
        col("n_shared"),
        round(col("n_shared") * lit(10000.0) /
          (col("grams_a") + col("grams_b") - col("n_shared")))
          .cast("long").as("jaccard_bp"))
      .orderBy("src_a", "src_b")
  }

  /** L48 — cross-source overlap audit (the provenance-level dedup
    * matrix of the published corpus reports: Dolma and RedPajama both
    * account cross-source duplication, and crawl pipelines audit
    * snapshot-to-snapshot overlap to schedule recrawls — "which sources
    * carry the same content" decides both dedup ORDER and source
    * weights). Overlap is exact Jaccard over each source's distinct
    * word 15-grams (l33's long-verbatim-run grain), excluding grams in
    * more than 8 sources (chrome, l38's df argument — and the bound
    * that keeps the pair fan-out linear in grams at scale). Mirror
    * sources are planted by the catalog's standard rule (every
    * `doc_id % 10 = 0` doc re-appears under `m_<source>` with its first
    * token dropped), so every real source overlaps its mirror by
    * construction and the gate pins the matrix cell-for-cell.
    *
    * Scale shape: per-source distinct grams are one partial-aggregable
    * shuffle; the pair generation is a gram-keyed self-equi-join whose
    * per-gram fan-out the df cap bounds; totals are source-cardinality
    * frames (broadcast onto the pair rollup). At 10⁵+ sources the same
    * frame feeds the sketch path instead: per-source MinHash signatures
    * (the [[graft.functions.MinHash]] aggregator over the identical
    * gram set) + l9's banded buckets find candidate pairs without any
    * exact join — spec-pinned against this exact matrix on the mirror
    * pairs. */
  val l48 = DQ(
    "l48_source_overlap",
    (s, d) => sourceOverlap(
      docs(s, d).filter(col("text").isNotNull), OverlapK, OverlapDfCap),
    Some(s"""WITH cur AS (
              SELECT doc_id, source, text FROM documents
              WHERE text IS NOT NULL),
            off AS (SELECT COALESCE(MAX(doc_id), -1) + 1 AS o FROM cur),
            corpus AS (
              SELECT source, text FROM cur
              UNION ALL
              SELECT 'm_' || source, substring(text, instr(text, ' ') + 1)
              FROM cur, off WHERE doc_id % 10 = 0),
            toks AS (
              SELECT source, string_split_regex(lower(text), '\\s+') AS ta
              FROM corpus),
            grams AS (
              SELECT DISTINCT source,
                unnest(list_transform(range(len(ta) - ${OverlapK - 1}),
                  i -> array_to_string(list_slice(ta, i + 1, i + $OverlapK), ' ')))
                  AS gram
              FROM toks WHERE len(ta) >= $OverlapK),
            kept AS (
              SELECT source, gram FROM (
                SELECT source, gram, COUNT(*) OVER (PARTITION BY gram) AS sdf
                FROM grams)
              WHERE sdf <= $OverlapDfCap),
            tot AS (
              SELECT source, CAST(COUNT(*) AS BIGINT) AS n_grams
              FROM kept GROUP BY 1),
            pairs AS (
              SELECT a.source AS src_a, b.source AS src_b,
                CAST(COUNT(*) AS BIGINT) AS n_shared
              FROM kept a JOIN kept b
                ON a.gram = b.gram AND a.source < b.source
              GROUP BY 1, 2)
            SELECT src_a, src_b,
              ta.n_grams AS grams_a, tb.n_grams AS grams_b, n_shared,
              CAST(ROUND(n_shared * 10000.0 /
                (ta.n_grams + tb.n_grams - n_shared)) AS BIGINT) AS jaccard_bp
            FROM pairs
            JOIN tot ta ON pairs.src_a = ta.source
            JOIN tot tb ON pairs.src_b = tb.source
            ORDER BY src_a, src_b"""))

  /** [[l49]]'s near-known bar: exact verified Jaccard ≥ 0.80 against
    * some v1 document. The ' edited' suffix of l44's modified class
    * costs one shingle out of m−1 (J = (m−2)/(m−1) ≥ 8/9 at the
    * corpus' 10-token minimum), so every planted revision clears the
    * bar; unrelated word-soup docs sit near 0. */
  private[operators] val NearKnownE4 = 8000L

  /** L49 core — the SKETCH form of [[incrementScreen]]: the increment
    * probed against v1's MinHash band index instead of its hash set. */
  private[operators] def incrementNearScreen(cur: DataFrame): DataFrame = {
    val v1Sk = LlmQueries.docSketch(v1Snapshot(cur))
    val v1B = LlmQueries.minhashBuckets(v1Sk.select("doc_id", "sig"))
      .select(col("doc_id").as("v1_id"), col("band_id"), col("bkey"))
    val inc = incrementOf(cur)
    val incSk = LlmQueries.docSketch(inc, keep = Seq("status"))
    val incB = LlmQueries.minhashBuckets(incSk.select("doc_id", "sig"))
    val cands = incB.join(v1B, Seq("band_id", "bkey"))
      .select(col("doc_id"), col("v1_id")).distinct()
    val verified = cands
      .join(incSk.select(col("doc_id"), col("shs").as("sha"),
        col("n_sh").as("na")), "doc_id")
      .join(v1Sk.select(col("doc_id").as("v1_id"), col("shs").as("shb"),
        col("n_sh").as("nb")), "v1_id")
      .withColumn("n_inter",
        size(array_intersect(col("sha"), col("shb"))).cast("long"))
      .withColumn("jac_e4",
        round(col("n_inter") * lit(10000.0) /
          (col("na") + col("nb") - col("n_inter"))).cast("long"))
      .filter(col("jac_e4") >= NearKnownE4)
      .select("doc_id").distinct()
      .withColumn("_near", lit(1))
    // rollup base = the FULL increment (l46's base frame, so the two
    // screens' n_docs can never disagree), not the sketch frame —
    // docSketch drops sub-3-token docs, which must still be COUNTED
    // (they cannot near-match anything: no 3-shingle, no signature)
    inc.select("doc_id", "status")
      .join(verified, Seq("doc_id"), "left")
      .groupBy("status")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(when(col("_near").isNotNull, 1L).otherwise(0L)).as("n_near_known"),
        coalesce(sum(when(col("_near").isNotNull, col("doc_id"))), lit(0L))
          .as("near_known_checksum"))
      .orderBy("status")
  }

  /** L49 — incremental NEAR-dup screening of the version increment: the
    * sketch sibling of [[l46]], catching what the hash screen cannot. A
    * re-crawl that dropped a byte, re-encoded whitespace, or carries an
    * editorial tweak hashes fresh — l46 calls it novel — but its MinHash
    * signature still collides with the old copy's. Here that is exactly
    * l44's MODIFIED class: the v1 row differs by one planted token, so
    * the hash screen reports "novel content" while this screen reports
    * "near-known revision" — the operational difference between the two
    * dedup granularities, measured on the same increment. Near-known =
    * banded-LSH candidate (l9's 16×4 bands over the shared
    * [[LlmQueries.docSketch]] — the streaming gate L18's exact
    * machinery, so batch recap and ingest screen can never disagree)
    * verified at exact Jaccard ≥ 0.80.
    *
    * Scale shape: v1's band index is the PERSISTED LSH artifact
    * ([[AnnIndexes]]' build/probe split — built once per release,
    * appended via `appendLsh`); the increment sketches map-side
    * (shuffle-free one-row-per-doc form) and probes with band
    * equi-joins; only candidates carry shingle arrays. No oracle by
    * driver design (signature hashing is not SQL-portable); the spec
    * pins every modified doc caught, every exact re-crawl caught,
    * soundness (flagged ⊆ brute ≥-bar pairs, exact by the verify
    * step), and ≥ 80% brute recall — the l9 discipline. */
  val l49 = DQ(
    "l49_incremental_neardup",
    (s, d) => incrementNearScreen(docs(s, d).filter(col("text").isNotNull)),
    None)

  /** [[l59]]'s drift-flag bar: a share moving ≥ 100 bp (one
    * percentage point) between releases flags the dimension value.
    * Deployments tune this; the constant keeps the DQ deterministic. */
  private[operators] val DriftFlagBp = 100L

  /** The dimension unpivot shared by both [[l59]] snapshots: every doc
    * contributes one (dim, val) row per audited dimension — provenance
    * (`source`) and the length profile (`len` buckets at < 200 /
    * < 400 / ≥ 400 chars, a quality proxy that needs only text). */
  private def driftDims(df: DataFrame): DataFrame =
    df.select(explode(map(
      lit("source"), col("source"),
      lit("len"), when(length(col("text")) < 200, "short")
        .when(length(col("text")) < 400, "mid")
        .otherwise("long"))).as(Seq("dim", "val")))

  /** L59 — release-over-release DISTRIBUTION drift (the data-health
    * audit gating every retraining decision: a corpus can pass every
    * per-document gate and still have silently shifted its source mix
    * or length profile — the population-drift checks production
    * pipelines run between releases, here with integer basis-point
    * deltas instead of PSI/KL so the numbers are engine-portable and
    * the flag bar is exact). Same planted version history as l44/l46
    * ([[v1Snapshot]] — one story, three audits): per (dim, val) the
    * doc counts and shares of both snapshots, the share delta in bp,
    * and the ≥ 100 bp drift flag.
    *
    * Scale shape: each snapshot contributes ONE scan → row-local
    * unpivot (2 rows/doc) → a partial-aggregable (dim, val) count; the
    * join and share arithmetic run on the tiny post-agg frame (values
    * × dims rows). The per-dim totals come from a second-level agg of
    * the SAME counts, never a re-scan. */
  val l59 = DQ(
    "l59_dist_drift",
    (s, d) => {
      val cur = docs(s, d).filter(col("text").isNotNull)
      val c1 = driftDims(v1Snapshot(cur))
        .groupBy("dim", "val").agg(count(lit(1)).as("n_v1"))
      val c2 = driftDims(cur.select(col("doc_id"), col("source"), col("text")))
        .groupBy("dim", "val").agg(count(lit(1)).as("n_v2"))
      val joined = c1.join(c2, Seq("dim", "val"), "full_outer")
        .select(col("dim"), col("val"),
          coalesce(col("n_v1"), lit(0L)).as("n_v1"),
          coalesce(col("n_v2"), lit(0L)).as("n_v2"))
      val totals = joined.groupBy("dim")
        .agg(sum("n_v1").as("t1"), sum("n_v2").as("t2"))
      joined.join(broadcast(totals), "dim")
        .withColumn("share_v1_bp",
          round(col("n_v1") * lit(10000.0) / col("t1")).cast("long"))
        .withColumn("share_v2_bp",
          round(col("n_v2") * lit(10000.0) / col("t2")).cast("long"))
        .withColumn("delta_bp", col("share_v2_bp") - col("share_v1_bp"))
        .withColumn("drifted", abs(col("delta_bp")) >= DriftFlagBp)
        .select("dim", "val", "n_v1", "n_v2",
          "share_v1_bp", "share_v2_bp", "delta_bp", "drifted")
        .orderBy("dim", "val")
    },
    Some(s"""WITH $v1CteSql,
            d1 AS (
              SELECT dim, val, CAST(COUNT(*) AS BIGINT) AS n_v1 FROM (
                SELECT 'source' AS dim, source AS val FROM v1
                UNION ALL
                SELECT 'len' AS dim,
                  CASE WHEN len(text) < 200 THEN 'short'
                       WHEN len(text) < 400 THEN 'mid'
                       ELSE 'long' END AS val FROM v1)
              GROUP BY 1, 2),
            d2 AS (
              SELECT dim, val, CAST(COUNT(*) AS BIGINT) AS n_v2 FROM (
                SELECT 'source' AS dim, source AS val FROM cur
                UNION ALL
                SELECT 'len' AS dim,
                  CASE WHEN len(text) < 200 THEN 'short'
                       WHEN len(text) < 400 THEN 'mid'
                       ELSE 'long' END AS val FROM cur)
              GROUP BY 1, 2),
            j AS (
              SELECT COALESCE(d1.dim, d2.dim) AS dim,
                COALESCE(d1.val, d2.val) AS val,
                COALESCE(n_v1, 0) AS n_v1, COALESCE(n_v2, 0) AS n_v2
              FROM d1 FULL OUTER JOIN d2
                ON d1.dim = d2.dim AND d1.val = d2.val),
            t AS (
              SELECT dim, SUM(n_v1) AS t1, SUM(n_v2) AS t2
              FROM j GROUP BY 1)
            SELECT j.dim, j.val, n_v1, n_v2,
              CAST(ROUND(n_v1 * 10000.0 / t1) AS BIGINT) AS share_v1_bp,
              CAST(ROUND(n_v2 * 10000.0 / t2) AS BIGINT) AS share_v2_bp,
              CAST(ROUND(n_v2 * 10000.0 / t2) AS BIGINT)
                - CAST(ROUND(n_v1 * 10000.0 / t1) AS BIGINT) AS delta_bp,
              (ABS(CAST(ROUND(n_v2 * 10000.0 / t2) AS BIGINT)
                - CAST(ROUND(n_v1 * 10000.0 / t1) AS BIGINT))
                >= $DriftFlagBp) AS drifted
            FROM j JOIN t ON j.dim = t.dim
            ORDER BY j.dim, val"""))

  val all: Seq[DQ] = Seq(l44, l46, l48, l49, l59)
}
