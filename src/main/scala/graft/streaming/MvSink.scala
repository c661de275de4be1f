package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.operators.Mvm
import graft.sources.ManagedTable

/** Streaming CDC apply that keeps a materialized rollup CURRENT: each
  * micro-batch lands in the base [[ManagedTable]] as a last-writer-
  * wins upsert (exactly [[ManagedSink]]'s apply) AND is folded into a
  * second managed table holding the view, via [[Mvm]]'s multiset-delta
  * algebra — so the rollup a dashboard reads is always one batch
  * behind the stream, at delta-sized cost, with no recompute anywhere.
  *
  * Per micro-batch:
  *   1. reduce the batch to its winners per key ([[ManagedSink.latestPerKey]]);
  *   2. pin the PRE-image: the base table's current rows for the
  *      batch's keys (the manifest is resolved at read() time and
  *      copy-on-write keeps superseded files until vacuum, so the
  *      pre-image stays readable after the upsert; it is still
  *      checkpointed before mutating — retention must never be a
  *      correctness hinge);
  *   3. upsert the winners into the base table;
  *   4. the view delta is (+winners, −pre-image) — exactly the rows
  *      the upsert changed; aggregate per group and merge into the
  *      view's AFFECTED groups only ([[Mvm.applyDelta]]), upserting
  *      survivors and deleting groups whose maintained count hit 0.
  *
  * Idempotence (the foreachBatch retry contract): a re-applied batch
  * finds pre-image == winners, the delta bag cancels to zero per
  * group, the merge rewrites unchanged values, and the dead-group
  * delete matches nothing — both tables converge to the same state.
  *
  * Scale shape: every step is batch- or group-delta-sized — the
  * pre-image probe is a key semi-join against the base table (file-
  * pruned by the upsert's own probe machinery), the view merge joins
  * |affected groups| rows, and only dead-group KEYS (bounded by the
  * batch's distinct groups) ever reach the driver. Group keys must be
  * non-null (join-key semantics; same contract as [[Mvm]]).
  */
object MvSink {

  /** Create the view table at `viewRoot` from the base table's current
    * state — the one full compute (the bootstrap every incremental
    * scheme pays once). */
  def bootstrap(spark: SparkSession, tableRoot: String, viewRoot: String,
                viewKeys: Seq[String], countCol: String,
                sums: Seq[(String, Column)],
                mins: Seq[(String, Column)] = Nil,
                maxs: Seq[(String, Column)] = Nil,
                avgs: Seq[(String, Column)] = Nil): Unit = {
    val mv = Mvm.compute(ManagedTable.read(spark, tableRoot),
      viewKeys, countCol, sums, mins, maxs, avgs)
    ManagedTable.create(spark, viewRoot, mv.schema)
    ManagedTable.insert(spark, viewRoot, mv)
  }

  /** One micro-batch: base-table upsert + incremental view merge.
    * Exposed for batch backfills and tested directly. */
  def applyBatch(batch: DataFrame, tableRoot: String, viewRoot: String,
                 keys: Seq[String], orderCols: Seq[String],
                 viewKeys: Seq[String], countCol: String,
                 sums: Seq[(String, Column)],
                 mins: Seq[(String, Column)] = Nil,
                 maxs: Seq[(String, Column)] = Nil,
                 avgs: Seq[(String, Column)] = Nil): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val schema = ManagedTable.history(spark, tableRoot).last.schema
    val winners = ManagedSink.latestPerKey(batch, keys, orderCols)
      .select(schema.fieldNames.map(col): _*)
      .localCheckpoint() // reused by the upsert AND the delta bag
    val pre = ManagedTable.read(spark, tableRoot)
      .join(winners.select(keys.map(col): _*), keys, "left_semi")
      .localCheckpoint() // materialized BEFORE the upsert rewrites files
    ManagedTable.upsert(spark, tableRoot, winners, keys)
    val bag = winners.withColumn(Mvm.MultCol, lit(1L))
      .unionByName(pre.withColumn(Mvm.MultCol, lit(-1L)))
    // extrema delete-repair reads the POST-upsert base (dirty groups only)
    val base = if (mins.isEmpty && maxs.isEmpty) None
               else Some(ManagedTable.read(spark, tableRoot))
    mergeBagIntoView(spark, viewRoot, bag, viewKeys, countCol, sums,
      mins, maxs, base, avgs)
  }

  /** Merge a multiset delta bag ([[Mvm.MultCol]]-tagged rows) into the
    * managed view table: affected groups only — survivors upserted,
    * dead groups deleted. Shared by the streaming sink and the SQL
    * router's post-DML maintenance, so every maintenance path applies
    * the identical algebra. */
  def mergeBagIntoView(spark: SparkSession, viewRoot: String, bag: DataFrame,
                       viewKeys: Seq[String], countCol: String,
                       sums: Seq[(String, Column)],
                       mins: Seq[(String, Column)] = Nil,
                       maxs: Seq[(String, Column)] = Nil,
                       base: Option[DataFrame] = None,
                       avgs: Seq[(String, Column)] = Nil): Unit = {
    require(mins.isEmpty && maxs.isEmpty || base.nonEmpty,
      "MIN/MAX maintenance needs the post-mutation base table for delete-repair")
    val affected = bag.select(viewKeys.map(col): _*).distinct()
    val viewSchema = ManagedTable.history(spark, viewRoot).last.schema
    val affectedView =
      ManagedTable.read(spark, viewRoot).join(affected, viewKeys, "left_semi")
    val applied = Mvm.applyDeltaAll(affectedView, bag, base, viewKeys,
      countCol, sums, mins, maxs, avgs)
    val merged = applied
      .select(viewSchema.fieldNames.map(col): _*)
      .localCheckpoint() // pinned before the view mutations below
    // group death: affected groups absent from the merge result; their
    // KEYS (bounded by the delta's distinct groups) come to the driver
    // to form the delete predicate — the same metadata-scale boundary
    // as the upsert's affected-file probe
    val dead = affected.join(merged.select(viewKeys.map(col): _*),
      viewKeys, "left_anti").collect()
    if (dead.nonEmpty)
      ManagedTable.delete(spark, viewRoot,
        dead.map(r => viewKeys.zipWithIndex
            .map { case (k, i) => col(k) === lit(r.get(i)) }
            .reduce(_ && _))
          .reduce(_ || _))
    if (!merged.isEmpty)
      ManagedTable.upsert(spark, viewRoot, merged, viewKeys)
  }

  /** Start the streaming apply: every micro-batch lands as one base
    * upsert + one incremental view merge. `checkpointDir` makes
    * restarts resume from the last committed batch; a replayed batch
    * is a no-op by the idempotence argument above. */
  def upsertStreamWithView(stream: DataFrame, tableRoot: String,
                           viewRoot: String, keys: Seq[String],
                           orderCols: Seq[String], viewKeys: Seq[String],
                           countCol: String, sums: Seq[(String, Column)],
                           checkpointDir: String,
                           trigger: Trigger = Trigger.AvailableNow(),
                           mins: Seq[(String, Column)] = Nil,
                           maxs: Seq[(String, Column)] = Nil,
                           avgs: Seq[(String, Column)] = Nil): StreamingQuery =
    stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, tableRoot, viewRoot, keys, orderCols,
          viewKeys, countCol, sums, mins, maxs, avgs)
      }
      .start()
}
