package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-layout utilities — the storage-side half of the 100 TB join
  * strategy (SURVEY.md "Partitioning & shuffle").
  *
  * A fact⋈fact equi-join (J2's lineitem⋈orders shape) shuffles BOTH
  * sides on the key every time it runs. Writing both tables bucketed by
  * that key moves the shuffle to write time, once: every subsequent join
  * on the bucket key is co-located (zero Exchange in the plan), which is
  * the difference between re-shuffling 100 TB per query and never
  * shuffling it again. The bucket count is fixed at write time — size it
  * to the target parallelism (≈ 2–3× total cores at the expected SF).
  *
  * Spark bucketing requires the session catalog (`saveAsTable`) so the
  * bucket spec survives as table metadata; a path-only parquet write
  * cannot carry it.
  */
object Bucketing {

  /** Write `df` as a bucketed, sorted table registered in the session
    * catalog. Sorting within buckets additionally removes the join's
    * per-partition sort (SortMergeJoin reads presorted buckets). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key — co-located, so the
    * physical plan contains no shuffle Exchange for either side.
    * `joinType` covers the diff shapes too: a FULL OUTER over two
    * identically-bucketed corpus snapshots (l44's layout claim) diffs
    * partition-by-partition with zero exchange. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      leftKey: String, rightKey: String,
      joinType: String = "inner"): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey), joinType)
  }
}

/** Catalog statistics — the ANALYZE analog of the reference's Postgres
  * planner statistics (SURVEY §4): table row counts plus per-column
  * NDV/min/max histogram inputs. With `spark.sql.cbo.enabled` (on in
  * `graft.Session`) these drive cardinality estimation — a selective
  * filter over an analyzed table shrinks its estimated output, which
  * can flip a join to broadcast or reorder a multi-way join; without
  * stats the optimizer only has file sizes. Run after (re)writing a
  * catalog table, like `ANALYZE` after bulk load.
  */
object Stats {
  def analyze(spark: SparkSession, table: String, cols: Seq[String] = Nil): Unit = {
    spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS")
    if (cols.nonEmpty)
      spark.sql(
        s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS ${cols.mkString(", ")}")
  }
}
