package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** Native DataFrame-API implementations of the §2 contract queries.
  * Filled in incrementally (phase B of SURVEY.md §7); until a key
  * appears here, [[Queries]] serves the validated SQL text.
  */
object Relational {
  def queries: Map[String, Queries.QueryFn] = Map()
}
