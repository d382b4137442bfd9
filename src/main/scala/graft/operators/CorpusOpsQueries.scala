package graft.operators

import graft.{DQ, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
      val off = LlmQueries.plantedOffset(cur, "doc_id")
      val v1Base = cur.filter(expr(v1FilterSql))
        .select(col("doc_id"), col("source"),
          expr(v1TextSql).as("text"))
      val v1Removed = cur.filter(col("doc_id") % 13 === 0)
        .crossJoin(broadcast(off))
        .select((col("doc_id") + col("_off")).as("doc_id"), col("source"),
          col("text"))
      val v1 = v1Base.unionByName(v1Removed)
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
    Some(s"""WITH cur AS (
              SELECT doc_id, source, text FROM documents
              WHERE text IS NOT NULL),
            off AS (SELECT COALESCE(MAX(doc_id), -1) + 1 AS o FROM cur),
            v1 AS (
              SELECT doc_id, source,
                $v1TextSql AS text
              FROM cur WHERE $v1FilterSql
              UNION ALL
              SELECT c.doc_id + off.o AS doc_id, c.source, c.text
              FROM cur c, off WHERE c.doc_id % 13 = 0),
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

  val all: Seq[DQ] = Seq(l44)
}
