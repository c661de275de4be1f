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
}
