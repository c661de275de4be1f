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

  /** Winsorized per-group summary with percentile_approx fences —
    * q94's 100 TB twin. The exact q94 fences come from a rank window,
    * which at lake scale sorts every group's full value set through
    * one reducer per group; this replaces them with ONE mergeable
    * percentile_approx aggregate (fixed memory, map-side combined,
    * rank error <= group_n/accuracy), then applies the same
    * clamp-and-DECIMAL-sum report. Fences are approximate (an actual
    * data value near the requested rank, not the interpolated order
    * statistic), so this mode lives OUTSIDE the hash gate: ApproxSpec
    * tolerance-tests fences and winsorized mass against the exact
    * q94; the exact window form remains the oracle-gated mode for
    * bounded inputs — at 100 TB default to THIS one. Output schema
    * matches q94: (group, lo, hi, n, n_lo, n_hi, wsum). */
  def winsorizedStats(df: DataFrame, groupCol: String, valueCol: String,
                      pLo: Double = 0.05, pHi: Double = 0.95,
                      accuracy: Int = 10000): DataFrame = {
    require(0 <= pLo && pLo < pHi && pHi <= 1, s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    import org.apache.spark.sql.types.DecimalType
    val v = col(valueCol).cast("double")
    val f = df.groupBy(groupCol)
      .agg(percentile_approx(v, array(lit(pLo), lit(pHi)), lit(accuracy)).as("q"))
      .select(col(groupCol), round(element_at(col("q"), 1), 6).as("lo"),
        round(element_at(col("q"), 2), 6).as("hi"))
    df.join(broadcast(f), groupCol)
      .groupBy(groupCol, "lo", "hi")
      .agg(count(lit(1)).as("n"),
        sum(when(v < col("lo"), 1L).otherwise(0L)).as("n_lo"),
        sum(when(v > col("hi"), 1L).otherwise(0L)).as("n_hi"),
        sum(when(v < col("lo"), col("lo").cast(DecimalType(18, 6)))
          .when(v > col("hi"), col("hi").cast(DecimalType(18, 6)))
          .otherwise(v.cast(DecimalType(18, 6)))).cast("double").as("wsum"))
      .orderBy(groupCol)
  }
}
