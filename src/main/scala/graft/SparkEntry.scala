package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Queries, QueryTexts}
import graft.sources.Tables

/** Driver contract — see /root/repo/SURVEY.md §0.2/§7.
  *
  * Every key in [[queries]] has a matching DuckDB oracle in
  * [[oracleSql]]; the driver diffs the two at sf0.01 (t2). Query
  * implementations live in [[graft.queries.Queries]] (DataFrame API /
  * operator library) with [[graft.queries.QueryTexts]] holding the
  * validated SQL texts (both the Spark-SQL compatibility surface and
  * the DuckDB oracle side).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q11_agg_hash")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. */
  def oracleSql: Map[String, String] = Queries.oracle
}
