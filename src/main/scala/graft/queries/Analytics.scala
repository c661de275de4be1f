package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.operators.Windows
import graft.sources.Tables

/** Streaming-shaped analytics in batch form (SURVEY.md §2 q32-q34).
  * Each has a Structured Streaming twin (`window`, `window` with
  * slide, `session_window`) — see graft.streaming; the batch
  * formulations here are the oracle-checkable semantics.
  */
object Analytics {

  def queries: Map[String, Queries.QueryFn] = Map(

    // Tumbling 1h window == group by the truncated hour. Streaming
    // twin: window($"ts", "1 hour") + watermark.
    "q32_window_tumbling" -> ((s, dir) => {
      Tables.load(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("win_start"), col("event_type"))
        .agg(count(lit(1)).as("n"),
             sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
        .orderBy("win_start", "event_type")
        .limit(200)
    }),

    // Sliding 1h/15min window: each event belongs to 4 windows —
    // explode the 4 offsets, then one hash aggregate. All arithmetic
    // in integer epoch-seconds (tz/struct-free, SURVEY.md §2 q33).
    // Streaming twin: window($"ts", "1 hour", "15 minutes").
    "q33_window_sliding" -> ((s, dir) => {
      val ems = unix_millis(col("ts"))
      Tables.load(s, dir, "events")
        .select(col("event_type"), ems.as("ems"),
                explode(sequence(lit(0), lit(3))).as("k"))
        .withColumn("win_start_s",
          (floor(col("ems") / 900000).cast("long") - col("k")) * 900)
        .filter(col("ems") >= col("win_start_s") * 1000 &&
                col("ems") < (col("win_start_s") + 3600) * 1000)
        .groupBy("win_start_s", "event_type")
        .agg(count(lit(1)).as("n"))
        .orderBy("win_start_s", "event_type")
        .limit(200)
    }),

    // 30-min-gap sessionization via the Windows operator, then
    // per-user session stats. Streaming twin: session_window(ts, "30
    // minutes") with mapGroupsWithState for custom session payloads.
    "q34_sessionize" -> ((s, dir) => {
      val sessions = Windows.sessionize(
        Tables.load(s, dir, "events").select("user_id", "ts", "event_id"),
        col("user_id"), col("ts"), col("event_id"), gapMs = 1800000L)
      sessions
        .groupBy("user_id")
        .agg(countDistinct(col("session_id")).as("n_sessions"),
             count(lit(1)).as("n_events"),
             round(count(lit(1)).cast(DecimalType(18, 6)) / countDistinct(col("session_id")), 6)
               .cast("double").as("events_per_session"))
        .orderBy("user_id")
    })
  )
}
