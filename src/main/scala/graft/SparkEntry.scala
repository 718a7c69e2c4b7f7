package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Revenue-by-nation exercises scan → two fact joins → two broadcast
    * dims → hash agg → sort in one Catalyst plan. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.revenueByNation(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops
    * (approximate/ML families) → driver records a rows-only check. */
  def oracleSql: Map[String, String] =
    QueryRegistry.oracleSql
}
