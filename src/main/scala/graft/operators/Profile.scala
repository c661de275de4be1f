package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass data profiling: per-column null counts, distinct counts,
  * and min/max over any DataFrame — the first thing run against a new
  * 100 TB dataset before writing real queries.
  *
  * The whole profile is ONE aggregation pass over the data (partial +
  * final, like any hash agg). Only the finished one-row summary is
  * collected and reshaped on the driver — driver traffic is
  * summary-sized, never data-sized.
  */
object Profile {

  /** Profile `cols` (default: every column) of `df`. Returns a small
    * DataFrame: (column, n_rows, n_nulls, n_distinct, min, max) with
    * min/max rendered as strings so mixed types fit one schema.
    *
    * `exact = true` uses exact distinct counts — n columns expand the
    * scan n-fold (`RewriteDistinctAggregates`), fine up to mid scale.
    * At 100 TB set `exact = false`: HLL `approx_count_distinct` keeps
    * the pass single-width with ~2% error. */
  def profile(df: DataFrame, cols: Seq[String] = Nil, exact: Boolean = true): DataFrame = {
    require(df.columns.length == df.columns.distinct.length,
      "profile needs unique column names — alias duplicates (e.g. post-join) first")
    // min/max/distinct need an ordering; default mode silently skips
    // non-orderable columns (maps etc.), explicit requests fail loudly
    def orderable(c: String): Boolean = df.schema(c).dataType match {
      case _: MapType => false
      case _ => true
    }
    val cs =
      if (cols.nonEmpty) cols
      else df.columns.toSeq.filter(orderable)
    require(cs.nonEmpty, "profile needs at least one column")
    val missing = cs.filterNot(df.columns.contains)
    require(missing.isEmpty, s"no such columns: ${missing.mkString(", ")}")
    val bad = cs.filterNot(orderable)
    require(bad.isEmpty, s"non-orderable columns cannot be profiled: ${bad.mkString(", ")}")
    val aggs = cs.flatMap { c =>
      Seq(
        // coalesce: sum over ZERO rows is SQL NULL — an empty input
        // must profile as all-zero counts, not NPE
        coalesce(sum(when(col(c).isNull, 1).otherwise(0)), lit(0L)).as(s"${c}__nulls"),
        (if (exact) countDistinct(col(c)) else approx_count_distinct(col(c)))
          .as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val row = df.agg(count(lit(1)).as("__n"), aggs: _*).collect()(0)
    val n = row.getLong(row.fieldIndex("__n"))
    val out = cs.map { c =>
      Row(c, n,
        row.getLong(row.fieldIndex(s"${c}__nulls")),
        row.getLong(row.fieldIndex(s"${c}__distinct")),
        row.getAs[String](s"${c}__min"),
        row.getAs[String](s"${c}__max"))
    }
    val schema = StructType(Seq(
      StructField("column", StringType, nullable = false),
      StructField("n_rows", LongType, nullable = false),
      StructField("n_nulls", LongType, nullable = false),
      StructField("n_distinct", LongType, nullable = false),
      StructField("min", StringType), StructField("max", StringType)))
    df.sparkSession.createDataFrame(
      df.sparkSession.sparkContext.parallelize(out, 1), schema)
  }
}
