package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch operators — the pre-aggregate-then-merge pattern
  * that makes rollups affordable at 100 TB: build a constant-size
  * sketch per partition key (per day, per source, per shard) ONCE,
  * persist it, and answer any coarser rollup later by merging sketches
  * — no rescan of the fact data, and merging is associative so it
  * map-side combines like any other aggregate.
  *
  * Engine-specific by nature (sketch bytes are not portable across
  * engines), so excluded from the DuckDB hash-match contract
  * (SURVEY.md §2 "known-excluded"); verified with tolerance against
  * exact answers in ApproxSpec instead. Spark ships Apache
  * DataSketches HLL natively (`hll_sketch_agg` etc.), codegen'd — no
  * UDF/UDAF anywhere here.
  */
object Sketches {

  /** Per-group HLL sketch of `col`'s distinct count: one row per group
    * with a binary `sketch` column plus its estimate. Persist this as
    * the daily/shard rollup; coarser rollups come from [[mergeEstimate]].
    * lgK trades size for accuracy (12 => ~1.6% relative error, 4 KB). */
  def distinctSketch(df: DataFrame, groupCols: Seq[String], col: Column,
                     lgK: Int = 12): DataFrame =
    df.groupBy(groupCols.map(c => df(c)): _*)
      .agg(hll_sketch_agg(col, lit(lgK)).as("sketch"))
      .withColumn("estimate", hll_sketch_estimate(column("sketch")))

  /** Roll a sketch table up to coarser groups by MERGING sketches —
    * the whole point: answers "distinct users per month" from daily
    * sketches without touching the raw data. */
  def mergeEstimate(sketches: DataFrame, groupCols: Seq[String],
                    sketchCol: String = "sketch"): DataFrame =
    sketches.groupBy(groupCols.map(c => sketches(c)): _*)
      .agg(hll_union_agg(column(sketchCol)).as("sketch"))
      .withColumn("estimate", hll_sketch_estimate(column("sketch")))

  /** Approximate quantiles per group via percentile_approx: one pass,
    * fixed memory (`accuracy` buckets), mergeable partials — the
    * scale-path alternative to the exact `percentile` used where the
    * contract demands hash-equality. */
  def approxQuantiles(df: DataFrame, groupCols: Seq[String], col: Column,
                      qs: Seq[Double], accuracy: Int = 10000): DataFrame =
    df.groupBy(groupCols.map(c => df(c)): _*)
      .agg(percentile_approx(col, array(qs.map(lit): _*), lit(accuracy)).as("quantiles"))
}
