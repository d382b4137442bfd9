package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` / `oracleSql` are built from the full declared-query catalog;
  * every DQ with an oracle gets hash-compared against DuckDB by the
  * driver's correctness gate at sf0.01.
  */
object SparkEntry {

  /** The whole declared-query catalog, one DQ per SURVEY.md §2 operator. */
  def catalog: Seq[DQ] =
    RelationalQueries.all ++ TemporalJoinQueries.all ++ WindowQueries.all ++
      SetOpQueries.all ++ ScalarQueries.all ++ IngestQueries.all ++
      LlmQueries.all ++ SamplingQueries.all ++ ValidationQueries.all ++
      MartQueries.all ++ CleaningQueries.all ++ CorpusOpsQueries.all ++
      AuditQueries.all ++ ReleaseQueries.all ++ TokenizerQueries.all ++
      MediaReleaseQueries.all ++ CorpusBuildQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * DQ-J1 star join: scan → broadcast joins → hash agg → sort. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.j1.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(dq => dq.name -> dq.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.collect { case DQ(n, _, Some(sql)) => n -> sql }.toMap
}
