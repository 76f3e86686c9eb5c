package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.QueryPack

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * The actual query inventory lives in graft.queries.QueryPack; each
  * entry is one operator/capability from SURVEY.md §2 (or a scale
  * extension) with, when SQL-expressible, a DuckDB oracle.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    QueryPack.all.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryPack.all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    QueryPack.all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
