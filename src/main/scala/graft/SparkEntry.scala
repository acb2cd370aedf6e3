package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{AnalyticsQueries, ExtendedQueries, ImageQueryCatalog, MlQueryCatalog, RelationalQueries, StreamQueryCatalog, TextQueryCatalog, VectorQueryCatalog}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` maps one entry per implemented operator family from
  * SURVEY.md §2 (and the training-data-pipeline extensions) to a DataFrame
  * program over the synthetic tables in `sfDir`; `oracleSql` holds the
  * DuckDB twin the driver hash-compares against.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Multi-join + aggregate + window — exercises scan, broadcast join,
    * shuffle agg and window in one plan. */
  def entry(spark: SparkSession): DataFrame =
    RelationalQueries.q6MultiJoin(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.defs ++ ExtendedQueries.defs ++
      AnalyticsQueries.defs ++
      TextQueryCatalog.defs ++ VectorQueryCatalog.defs ++
      ImageQueryCatalog.defs ++
      MlQueryCatalog.defs ++ StreamQueryCatalog.defs

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.sql ++ ExtendedQueries.sql ++
      AnalyticsQueries.sql ++
      TextQueryCatalog.sql ++ VectorQueryCatalog.sql ++
      ImageQueryCatalog.sql ++
      MlQueryCatalog.sql ++ StreamQueryCatalog.sql
}
