package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable windowed/sequential operators the reference-class engine
  * needs but Spark has no single built-in for. All are expressed as
  * Catalyst window functions over a (partitionKey, time, tiebreak)
  * ordering, so they execute as one `WindowExec` per partition key —
  * shuffle once on the key, then sort within partition. At cluster
  * scale that is the right plan: state never leaves the executor that
  * owns the key.
  */
object Windows {

  /** As-of join expressed as a running aggregate instead of a join:
    * for each row, the latest prior `ts` among rows matching
    * `matchCond` within the same `partitionKey`. One shuffle on the
    * key vs. a range-join's O(n*m) pair explosion — the formulation
    * that survives scale (SURVEY.md §2 q10).
    * Ordering is made total with `tiebreak` so results are
    * deterministic under equal timestamps.
    */
  def asOfPrior(partitionKey: Column, ts: Column, tiebreak: Column, matchCond: Column): Column = {
    val w = Window.partitionBy(partitionKey).orderBy(ts, tiebreak)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    max(when(matchCond, ts)).over(w)
  }

  /** Gap-based sessionization: adds `session_id` (1-based, per
    * partition key, in time order) where a new session starts when the
    * gap to the previous event exceeds `gapMs`.
    * Streaming twin: `session_window(ts, gap)` — same semantics, this
    * batch form is oracle-checkable (SURVEY.md §2 q34).
    */
  def sessionize(df: DataFrame, partitionKey: Column, ts: Column, tiebreak: Column,
                 gapMs: Long): DataFrame = {
    val w = Window.partitionBy(partitionKey).orderBy(ts, tiebreak)
    val prevTs = lag(ts, 1).over(w)
    val newSession = when(
      unix_millis(ts) - unix_millis(prevTs) > gapMs || prevTs.isNull, 1).otherwise(0)
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("session_id", sum(newSession).over(cum))
  }

  /** Top-k rows per group by `ordering`, with `rn` (1-based rank kept
    * in the output). Executes as WindowExec + filter — no global sort.
    */
  def topKPerGroup(df: DataFrame, k: Int, partitionKey: Column, ordering: Column*): DataFrame = {
    val w = Window.partitionBy(partitionKey).orderBy(ordering: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }
}
