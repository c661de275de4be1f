package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom streaming state via flatMapGroupsWithState: operators whose
  * per-key state machine the built-in window aggregations cannot
  * express.
  *
  * State lives in the state store, partitioned by key across
  * executors; `GroupStateTimeout.EventTimeTimeout` + the source's
  * watermark bound state lifetime, so memory is O(active keys), not
  * O(stream length) — the property that matters at cluster scale.
  */
object StatefulOps {

  final case class Event(user_id: Long, ts: Timestamp, value: Double)

  /** Running per-user anomaly detector: emits an alert whenever a
    * user's event value exceeds `factor` x their running mean (after a
    * warm-up of `minEvents` events). The (count, sum) state is tiny
    * and constant-size per user.
    */
  final case class RunningStats(n: Long, sum: Double)
  final case class Alert(user_id: Long, ts: Timestamp, value: Double, running_mean: Double)

  /** `idleEvictionMs` bounds state: a user idle past the watermark +
    * eviction horizon has their stats dropped via EventTimeTimeout
    * (state is O(active users), the SCALING.md claim) — they simply
    * re-warm if they return. */
  def anomalies(events: Dataset[Event], factor: Double = 3.0, minEvents: Int = 3,
                idleEvictionMs: Long = 3600000L): Dataset[Alert] = {
    val evictMillis = idleEvictionMs
    val f = (userId: Long, it: Iterator[Event], state: GroupState[RunningStats]) => {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        var st = state.getOption.getOrElse(RunningStats(0L, 0.0))
        // Sort the micro-batch slice for deterministic within-batch order.
        val batch = it.toSeq.sortBy(e => (e.ts.getTime, e.value))
        val out = batch.flatMap { e =>
          val alert =
            if (st.n >= minEvents && e.value > factor * (st.sum / st.n))
              Some(Alert(userId, e.ts, e.value, st.sum / st.n))
            else None
          st = RunningStats(st.n + 1, st.sum + e.value)
          alert
        }
        state.update(st)
        if (batch.nonEmpty)
          state.setTimeoutTimestamp(batch.map(_.ts.getTime).max + evictMillis)
        out.iterator
      }
    }
    events
      .withWatermark("ts", millisAsDelay(idleEvictionMs))
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(f)(
        Encoders.product[RunningStats], Encoders.product[Alert])
  }

  final case class TypedEvent(user_id: Long, ts: Timestamp, event_type: String)

  /** Funnel progress: (stages completed so far, ms deadline for the
    * next stage). Constant-size per user. */
  final case class FunnelState(stage: Int, deadline: Long)
  final case class StageAdvance(user_id: Long, stage: Int, ts: Timestamp)

  /** Streaming conversion funnel — the incremental twin of q71: a user
    * advances from stage i to i+1 on the first `stages(i)` event
    * strictly after the previous stage's time and within `withinMs` of
    * it; the first stage has no deadline. Emits one StageAdvance per
    * advance, as it happens. The stage windows are fixed at
    * (t_i, t_i + withinMs] (single-shot, q71's semantics), so a
    * past-deadline event simply never advances — it does NOT
    * terminate the user, which keeps the machine correct when an
    * in-window event arrives LATER than a past-deadline one within
    * the watermark's allowed lateness.
    *
    * Per-user state is two fields; EventTimeTimeout drops users idle
    * past the watermark + eviction horizon, so state is O(active
    * users). The bounded-state tradeoff: batch-equivalence to q71
    * holds for users whose funnel activity gaps stay inside
    * `idleEvictionMs` — a user evicted and returning is treated as
    * new (and can re-emit stage advances). Size the horizon to the
    * funnel span, or accept horizon-approximate totals; exact totals
    * over unbounded idleness would need unbounded state. Events are
    * processed in event-time order within each micro-batch (sorted);
    * an event at exactly the previous stage's timestamp neither
    * advances nor closes anything (strictly-after semantics).
    */
  def funnel(events: Dataset[TypedEvent], stages: Seq[String],
             withinMs: Long = 3600000L,
             idleEvictionMs: Long = 3600000L): Dataset[StageAdvance] = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be non-empty and distinct, got $stages")
    val nStages = stages.size
    val f = (userId: Long, it: Iterator[TypedEvent], state: GroupState[FunnelState]) => {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        var st = state.getOption.getOrElse(FunnelState(0, 0L))
        // null event_type cannot advance any stage but must not NPE the
        // sort's tie-break either
        val batch = it.toSeq.sortBy(e => (e.ts.getTime, Option(e.event_type).getOrElse("")))
        val out = Seq.newBuilder[StageAdvance]
        batch.foreach { e =>
          if (st.stage < nStages) {
            if (st.stage == 0) {
              if (e.event_type == stages.head) {
                st = FunnelState(1, e.ts.getTime + withinMs)
                out += StageAdvance(userId, 1, e.ts)
              }
            } else if (e.event_type == stages(st.stage)) {
              val tPrev = st.deadline - withinMs
              if (e.ts.getTime > tPrev && e.ts.getTime <= st.deadline) {
                st = FunnelState(st.stage + 1, e.ts.getTime + withinMs)
                out += StageAdvance(userId, st.stage, e.ts)
              }
              // outside (tPrev, deadline]: no advance, window stays
              // fixed — late in-window arrivals can still convert
            }
          }
        }
        state.update(st)
        if (batch.nonEmpty)
          state.setTimeoutTimestamp(batch.map(_.ts.getTime).max + idleEvictionMs)
        out.result().iterator
      }
    }
    events
      .withWatermark("ts", millisAsDelay(idleEvictionMs))
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(f)(
        Encoders.product[FunnelState], Encoders.product[StageAdvance])
  }

  /** Watermark delay string for an ms horizon, rounded UP so the
    * watermark never drops events the ms-precise timeout considers
    * in-bounds (integer /1000 truncation would). */
  private def millisAsDelay(ms: Long): String = s"${(ms + 999) / 1000} seconds"

  final case class Bucket(key: Long, ts: Timestamp, n: Long)
  final case class FilledBucket(key: Long, ts: Timestamp, n: Long, carried: Long)
  /** (ms of the last emitted bucket, last positive value seen). */
  final case class GapState(lastMs: Long, carried: Long)

  /** Streaming twin of [[graft.operators.TimeSeries.gapFill]]: emits a
    * DENSE per-key series from a sparse stream of aggregated buckets.
    * Gap buckets (value 0, carried = last positive value) are emitted
    * LAZILY when the next observation arrives — the batch operator
    * only fills between observations, so no event-time timers are
    * needed.
    *
    * PRECONDITION: buckets must arrive per-key in event-time order
    * (e.g. produced by an upstream windowed aggregation that emits
    * finalized windows as the watermark passes); one row per
    * (key, bucket). Under that precondition the incremental output
    * equals the batch output row for row (tested in StatefulSpec).
    * The requirement is inherent to append-mode output, not an
    * implementation shortcut: once a zero gap row is emitted it cannot
    * be retracted, so a bucket arriving BEHIND the key's last emitted
    * bucket is unprocessable and is dropped (it would contradict
    * already-emitted rows).
    *
    * State is two longs per key, EventTimeTimeout-evicted after
    * `idleEvictionMs` — an evicted key's next bucket starts a new
    * dense segment rather than filling an unbounded idle span, which
    * is also the memory-safety argument: gap emission per event is
    * bounded by span/step, state by active keys. */
  def gapFillStream(buckets: Dataset[Bucket], stepMs: Long = 3600000L,
                    idleEvictionMs: Long = 86400000L): Dataset[FilledBucket] = {
    require(stepMs > 0, s"stepMs must be positive, got $stepMs")
    val f = (key: Long, it: Iterator[Bucket], state: GroupState[GapState]) => {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        var st = state.getOption.getOrElse(GapState(Long.MinValue, 0L))
        val batch = it.toSeq.sortBy(b => (b.ts.getTime, b.n))
        val out = Seq.newBuilder[FilledBucket]
        batch.foreach { b =>
          val t = b.ts.getTime
          if (t > st.lastMs) {
            if (st.lastMs != Long.MinValue) {
              var g = st.lastMs + stepMs
              while (g < t) {
                out += FilledBucket(key, new Timestamp(g), 0L, st.carried)
                g += stepMs
              }
            }
            val carried = if (b.n > 0) b.n else st.carried
            out += FilledBucket(key, b.ts, b.n, carried)
            st = GapState(t, carried)
          } // else: behind the emitted frontier — unprocessable in
            // append mode (see scaladoc precondition), dropped
        }
        state.update(st)
        // Arm the eviction timer from the EMITTED frontier, not the
        // batch max: a batch of only behind-frontier rows must not
        // rewind the timer and evict the key early. Clamp above the
        // current watermark — Spark rejects timeouts at or below it.
        // (In batch execution there is no watermark and the accessor
        // throws; timeouts never fire there, so the clamp is moot.)
        if (st.lastMs != Long.MinValue) {
          val wm = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(Long.MinValue)
          state.setTimeoutTimestamp(math.max(st.lastMs + idleEvictionMs, wm + 1))
        }
        out.result().iterator
      }
    }
    buckets
      .withWatermark("ts", millisAsDelay(idleEvictionMs))
      .groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(f)(
        Encoders.product[GapState], Encoders.product[FilledBucket])
  }

  final case class Versioned(user_id: Long, event_type: String, ts: Timestamp,
                             event_id: Long, value: Double)
  /** Champion version per key: (ts ms, event_id) is q83's total order. */
  final case class ChampState(tsMs: Long, eventId: Long, value: Double)

  /** Streaming CDC upsert compaction — the incremental twin of q83:
    * per (user_id, event_type) key, keep the LATEST version under the
    * total order (ts DESC, event_id DESC) and emit the new champion
    * row each time it changes. Consuming the stream into an upsert
    * sink (keyed overwrite) therefore converges to exactly q83's
    * survivor set; StreamingSpec gates that against the batch query.
    * A stale version arriving after a newer one emits NOTHING — the
    * redelivery/out-of-order case CDC ingest must absorb.
    *
    * State is one (ts, event_id, value) triple per key, EventTime-
    * Timeout-evicted after `idleEvictionMs` like the other operators
    * here — O(active keys), the property that survives unbounded
    * streams. The bounded-state tradeoff: a version arriving for an
    * evicted key re-seeds the champion, so exactness holds for keys
    * whose update gaps stay inside the horizon (size it to the
    * redelivery window; a compacted downstream table keyed on
    * (user_id, event_type) stays correct either way because older
    * re-emissions lose the upsert by the same total order).
    */
  def latestVersion(events: Dataset[Versioned],
                    idleEvictionMs: Long = 3600000L): Dataset[Versioned] = {
    val f = (key: (Long, String), it: Iterator[Versioned],
             state: GroupState[ChampState]) => {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        var st = state.getOption.orNull
        val batch = it.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
        val out = Seq.newBuilder[Versioned]
        batch.foreach { e =>
          val t = e.ts.getTime
          if (st == null || t > st.tsMs || (t == st.tsMs && e.event_id > st.eventId)) {
            st = ChampState(t, e.event_id, e.value)
            out += Versioned(key._1, key._2, e.ts, e.event_id, e.value)
          }
        }
        if (st != null) {
          state.update(st)
          val wm = scala.util.Try(state.getCurrentWatermarkMs()).getOrElse(Long.MinValue)
          state.setTimeoutTimestamp(math.max(st.tsMs + idleEvictionMs, wm + 1))
        }
        out.result().iterator
      }
    }
    events
      .withWatermark("ts", millisAsDelay(idleEvictionMs))
      .groupByKey(e => (e.user_id, e.event_type))(
        Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(f)(
        Encoders.product[ChampState], Encoders.product[Versioned])
  }
}
