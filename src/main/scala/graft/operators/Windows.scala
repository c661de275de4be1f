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

  /** General two-table as-of join: every `left` row gains an `asof`
    * struct holding the latest `right` row whose `tsCol` is <= the
    * left row's (same `key`), or null if none precedes it.
    *
    * Implemented as union + one running `last(_, ignoreNulls)` window
    * rather than a time-range join: one shuffle/sort on the key, no
    * pair materialization, and naturally skew-tolerant — the classic
    * scalable as-of formulation (same idea as q10, generalized to two
    * tables). Right rows sort before left rows at equal timestamps, so
    * "as of" is inclusive.
    *
    * `rightTiebreak` names right-table columns that make the ordering
    * total when multiple right rows share (key, ts) — without it the
    * attached row would be partition-order-dependent, violating the
    * library's determinism rule (the same rule asOfPrior and sessionize
    * enforce via their explicit tiebreak column). The LAST right row in
    * tiebreak order wins.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, tsCol: String,
               rightTiebreak: Seq[String] = Nil): DataFrame = {
    val lStruct = struct(left.columns.map(col): _*)
    val rStruct = struct(right.columns.map(col): _*)
    val tbNames = rightTiebreak.indices.map(i => s"_tb$i")
    val rTb = rightTiebreak.zip(tbNames).map { case (c, n) => col(c).as(n) }
    val lTb = rightTiebreak.zip(tbNames).map { case (c, n) =>
      lit(null).cast(right.select(col(c)).schema.head.dataType).as(n) }
    val lpart = left.select(Seq(col(key).as("_k"), col(tsCol).as("_t"), lit(1).as("_is_left"),
      lStruct.as("_l"), lit(null).cast(right.select(rStruct).schema.head.dataType).as("_r"))
      ++ lTb: _*)
    val rpart = right.select(Seq(col(key).as("_k"), col(tsCol).as("_t"), lit(0).as("_is_left"),
      lit(null).cast(left.select(lStruct).schema.head.dataType).as("_l"), rStruct.as("_r"))
      ++ rTb: _*)
    val w = Window.partitionBy("_k")
      .orderBy(col("_t") +: col("_is_left") +: tbNames.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lpart.union(rpart)
      .withColumn("_asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_is_left") === 1)
      .select(col("_l.*"), col("_asof").as("asof"))
  }

  /** Top-k rows per group by `ordering`, with `rn` (1-based rank kept
    * in the output). Executes as WindowExec + filter — no global sort.
    */
  def topKPerGroup(df: DataFrame, k: Int, partitionKey: Column, ordering: Column*): DataFrame = {
    val w = Window.partitionBy(partitionKey).orderBy(ordering: _*)
    df.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
  }

  /** Distributed prefix sum (running total of `valueCol` in `orderCol`
    * order, per `partitionCols` group) with NO single-task window —
    * the scale-out form of `SUM(v) OVER (ORDER BY o)`.
    *
    * A partition-less (or low-cardinality-keyed) cumulative window
    * funnels the whole relation through one task per key: fine when
    * the relation is fixture-bounded (q120's ~days precedent), a
    * scale-killer when its size follows the data's ndv. This is the
    * classic two-level scan instead:
    *
    *   1. rows map to `buckets` RANGE buckets of the order domain
    *      (order-preserving: every value in bucket i sorts before
    *      every value in bucket i+1), from a one-row (per group)
    *      min/max broadcast;
    *   2. the cumulative sum runs WITHIN each bucket — a keyed
    *      WindowExec, embarrassingly parallel;
    *   3. per-bucket totals (≤ `buckets` rows per group) get
    *      exclusive offsets via a broadcast lower-triangle self-join
    *      — tiny, and deliberately window-free so the executed plan
    *      contains no SinglePartition WindowExec at all;
    *   4. offsets broadcast back: result = offset + local cumsum.
    *
    * Requirements: `orderCol` must be DISTINCT within each group
    * (collapse to a (key, value, count) relation first — every CDF
    * call site already does), and numerically bucketable — pass
    * `orderNum` for a non-numeric but order-isomorphic domain (e.g.
    * `unix_date(col("d"))` for dates). Value skew across buckets
    * cannot affect correctness, only balance.
    *
    * Partition and order keys must be NON-NULL: the range join and
    * the offsets equi-join are null-rejecting, so (unlike the
    * cumulative window this replaces) a null key would silently DROP
    * the row — the worst failure mode for a general operator. The
    * contract is enforced loudly: a per-row guard raises on the first
    * null key (a codegen'd null check, no extra scan). Route nulls
    * through a sentinel value first if they are legitimate.
    *
    * `exclusive = true` yields the sum of strictly-preceding rows
    * (`cum − v`, valid because order keys are distinct).
    */
  def prefixSum(df: DataFrame, partitionCols: Seq[String], orderCol: String,
                valueCol: String, outCol: String, exclusive: Boolean = false,
                buckets: Int = 256, orderNum: Option[Column] = None): DataFrame =
    prefixSumN(df, partitionCols, orderCol, Seq(valueCol -> outCol),
      exclusive, buckets, orderNum)

  /** Multi-value [[prefixSum]]: running totals of EVERY column in
    * `valueCols` (valueCol -> outCol) over ONE shared (group, order)
    * pass — the window sums share a single WindowExec and the bucket
    * machinery (range broadcast, offsets) runs once, where chaining
    * single-column prefixSums pays the whole two-level scan per
    * column (guide §2.4). Same contract as [[prefixSum]].
    */
  def prefixSumN(df: DataFrame, partitionCols: Seq[String], orderCol: String,
                 valueCols: Seq[(String, String)], exclusive: Boolean = false,
                 buckets: Int = 256, orderNum: Option[Column] = None): DataFrame = {
    require(valueCols.nonEmpty, "prefixSumN needs at least one value column")
    val num = orderNum.getOrElse(col(orderCol)).cast("double")
    // loud failure on null keys (see contract above): a filter whose
    // predicate raises cannot be pruned away, and costs one null check
    val anyNullKey = (partitionCols.map(col) :+ num)
      .map(_.isNull).reduce(_ || _)
    val guarded = df.filter(when(anyNullKey, raise_error(lit(
      "graft prefixSum: NULL partition/order key would be silently " +
        "dropped by the null-rejecting joins; map nulls to a sentinel first")))
      .otherwise(lit(true)))
    val rngAggs = Seq(min(num).as("_ps_mn"), max(num).as("_ps_mx"))
    val withRange =
      if (partitionCols.isEmpty)
        guarded.crossJoin(broadcast(guarded.agg(rngAggs.head, rngAggs.tail: _*)))
      else
        guarded.join(broadcast(guarded.groupBy(partitionCols.map(col): _*)
          .agg(rngAggs.head, rngAggs.tail: _*)), partitionCols)
    val span = col("_ps_mx") - col("_ps_mn")
    val bucketed = withRange.withColumn("_ps_b",
      when(span <= 0, lit(0)).otherwise(
        least(floor((num - col("_ps_mn")) / span * buckets), lit(buckets - 1)))
        .cast("int"))
    val grpB = partitionCols :+ "_ps_b"
    val w = Window.partitionBy(grpB.map(col): _*).orderBy(orderCol)
    val idx = valueCols.indices
    val local = idx.foldLeft(bucketed) { (d, i) =>
      d.withColumn(s"_ps_cum$i", sum(valueCols(i)._1).over(w))
    }
    // Bucket totals derive from the SAME window pass: the running sum
    // at the bucket's LAST row (max_by on the distinct order key) is
    // the bucket total. The groupBy rides the window exchange's
    // hash(grpB) partitioning — no second scan of the input and no
    // extra Exchange, where the previous `bucketed.groupBy` re-read
    // the whole input and shuffled it again (guide §2.4: two
    // operations keyed the same way share one exchange).
    val tAggs = idx.map(i => expr(s"max_by(_ps_cum$i, `$orderCol`)").as(s"_ps_t$i"))
    val totals = local.groupBy(grpB.map(col): _*).agg(tAggs.head, tAggs.tail: _*)
    // every name on the lower (broadcast) side is fresh, so the
    // triangle self-join needs no dataset-id disambiguation
    val lower = totals.select(
      partitionCols.zipWithIndex.map { case (c, i) => col(c).as(s"_ps_p$i") } ++
        Seq(col("_ps_b").as("_ps_lb")) ++
        idx.map(i => col(s"_ps_t$i").as(s"_ps_lt$i")): _*)
    val cond = partitionCols.zipWithIndex
      .map { case (c, i) => col(c) === col(s"_ps_p$i") }
      .foldLeft(col("_ps_lb") < col("_ps_b"))(_ && _)
    val oAggs = idx.map(i => coalesce(sum(s"_ps_lt$i"), lit(0L)).as(s"_ps_off$i"))
    val offs = totals.join(broadcast(lower), cond, "left")
      .groupBy(grpB.map(col): _*).agg(oAggs.head, oAggs.tail: _*)
    val joined = local.join(broadcast(offs), grpB)
    val withOut = idx.foldLeft(joined) { (d, i) =>
      val (valueCol, outCol) = valueCols(i)
      d.withColumn(outCol,
        if (exclusive) col(s"_ps_off$i") + col(s"_ps_cum$i") - col(valueCol)
        else col(s"_ps_off$i") + col(s"_ps_cum$i"))
    }
    withOut.drop(Seq("_ps_mn", "_ps_mx", "_ps_b") ++
      idx.flatMap(i => Seq(s"_ps_cum$i", s"_ps_off$i")): _*)
  }
}
