package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: turn a sparse per-key series of
  * aggregated buckets into a dense one — every step between each key's
  * first and last observation exists, gaps filled with zero and the
  * last POSITIVE value carried forward. Designed for count/positive
  * series (where a filled gap and an observed zero are the same "no
  * activity" fact); a series with meaningful zero or negative
  * observations needs a sentinel-based variant, because zero-fill
  * makes those indistinguishable from gaps.
  *
  * Scale shape: bounds are one hash agg on the key; the grid is an
  * in-row `sequence` explode (rows bounded by span/step per key, never
  * by event count); the fill join and the carry-forward window are both
  * partitioned by the key. No stage touches more than one key's
  * timeline at a time.
  */
object TimeSeries {

  /** Dense version of `series` (key, ts, value): adds missing `step`
    * buckets per key with `value` = 0, plus a `carried` column = the
    * most recent POSITIVE value at or before each bucket (0 until the
    * first positive observation) — see the object note on why carry
    * skips zeros. `series` must be pre-aggregated: one row per
    * (key, bucket), with every ts on the key's min(ts)+k*step grid —
    * a MISALIGNED observation matches no grid row and its value is
    * dropped from the dense output. `strict = true` spends one extra
    * job to count misaligned rows and fail loudly instead (off by
    * default: the check is an eager action, and aligned-by-
    * construction inputs — date_trunc'd aggregates — don't need it).
    * Reserved working columns: `_h0`, `_h1`, `carried`.
    */
  def gapFill(series: DataFrame, key: String, ts: String, value: String,
              step: String = "interval 1 hour", strict: Boolean = false): DataFrame = {
    val reserved = Seq("_h0", "_h1", "carried").filter(series.columns.contains)
    require(reserved.isEmpty,
      s"gapFill reserves working columns ${reserved.mkString(", ")} — rename them on the input")
    val bounds = series.groupBy(col(key))
      .agg(min(col(ts)).as("_h0"), max(col(ts)).as("_h1"))
    val grid = bounds.select(col(key),
      explode(expr(s"sequence(_h0, _h1, $step)")).as(ts))
    if (strict) {
      val lost = series.join(grid, Seq(key, ts), "left_anti").count()
      require(lost == 0L,
        s"gapFill: $lost observation(s) are not on the min(ts)+k*($step) grid " +
          "of their key and would be silently dropped — align the input " +
          "(e.g. date_trunc to the step) or fix the step")
    }
    val filled = grid.join(series, Seq(key, ts), "left")
      .select(col(key), col(ts), coalesce(col(value), lit(0)).as(value))
    filled.withColumn("carried",
      coalesce(last(when(col(value) > 0, col(value)), ignoreNulls = true)
        .over(Window.partitionBy(key).orderBy(ts)), lit(0)))
  }
}
