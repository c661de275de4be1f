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
      .withWatermark("ts", s"${idleEvictionMs / 1000} seconds")
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(f)(
        Encoders.product[RunningStats], Encoders.product[Alert])
  }

  final case class TypedEvent(user_id: Long, ts: Timestamp, event_type: String)

  /** Funnel progress: (stage completed so far, ms deadline for the
    * next stage, terminal flag). Constant-size per user. */
  final case class FunnelState(stage: Int, deadline: Long, dead: Boolean)
  final case class StageAdvance(user_id: Long, stage: Int, ts: Timestamp)

  /** Streaming conversion funnel — the incremental twin of q71: a user
    * advances from stage i to i+1 on the first `stages(i)` event
    * strictly after the previous stage's time and within `withinMs` of
    * it; the first stage has no deadline. Emits one StageAdvance per
    * advance, as it happens — counting rows per stage reproduces the
    * batch funnel's stage totals (tested equivalent to q71).
    *
    * Per-user state is three fields; EventTimeTimeout drops users idle
    * past the watermark + eviction horizon, so state is O(active
    * users). Events are processed in event-time order WITHIN each
    * micro-batch (sorted); cross-batch order is the source's
    * responsibility up to the watermark, as with every append-mode
    * state machine. A window-missing stage event marks the user
    * terminal (the funnel is single-shot, matching q71's fixed
    * (t_i, t_i + withinMs] windows); an event at exactly the previous
    * stage's timestamp neither advances nor kills (strictly-after
    * semantics).
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
        var st = state.getOption.getOrElse(FunnelState(0, 0L, dead = false))
        val batch = it.toSeq.sortBy(e => (e.ts.getTime, e.event_type))
        val out = Seq.newBuilder[StageAdvance]
        batch.foreach { e =>
          if (!st.dead && st.stage < nStages) {
            if (st.stage == 0) {
              if (e.event_type == stages.head) {
                st = FunnelState(1, e.ts.getTime + withinMs, dead = false)
                out += StageAdvance(userId, 1, e.ts)
              }
            } else if (e.event_type == stages(st.stage)) {
              val tPrev = st.deadline - withinMs
              if (e.ts.getTime > tPrev && e.ts.getTime <= st.deadline) {
                st = FunnelState(st.stage + 1, e.ts.getTime + withinMs, dead = false)
                out += StageAdvance(userId, st.stage, e.ts)
              } else if (e.ts.getTime > st.deadline) {
                st = st.copy(dead = true) // window closed — single-shot funnel
              } // ts == tPrev: not strictly after, keep waiting
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
      .withWatermark("ts", s"${idleEvictionMs / 1000} seconds")
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(f)(
        Encoders.product[FunnelState], Encoders.product[StageAdvance])
  }
}
