package graft.examples

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.{StatefulOps, StreamingAnalytics}

/** Consumer of the streaming API: feeds micro-batches through
  * in-memory sources and prints each incremental result to the console
  * sink. Run: `sbt "runMain graft.examples.StreamingDemo"`.
  *
  * Two demos:
  *   1. windowed aggregation (tumblingCounts) in COMPLETE output mode
  *      — every micro-batch reprints the whole updated result;
  *   2. the custom state-store operator (StatefulOps.anomalies) in
  *      APPEND output mode — the only mode flatMapGroupsWithState
  *      alerts can use (an emitted alert is a fact, never retracted)
  *      — including the late-data path: an event stamped older than
  *      the CURRENT WATERMARK (= max event time seen - the 1h
  *      watermark delay) is dropped by the state machinery and never
  *      reaches the detector.
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val ctx = spark.sqlContext

    def ts(s: String) = Timestamp.valueOf(s)

    println("=== 1. tumblingCounts, COMPLETE mode: full result per micro-batch ===")
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")

    val query = StreamingAnalytics.tumblingCounts(events)
      .writeStream.format("console").outputMode("complete").start()

    mem.addData((ts("2024-01-01 00:10:00"), "click", 1.0),
                (ts("2024-01-01 00:20:00"), "click", 2.0))
    query.processAllAvailable()
    mem.addData((ts("2024-01-01 00:40:00"), "click", 3.0),
                (ts("2024-01-01 01:10:00"), "view", 4.0))
    query.processAllAvailable()
    query.stop()

    println("=== 2. StatefulOps.anomalies, APPEND mode: alerts as they fire ===")
    // per-user running-mean detector: alert when value > 3x the mean
    // after a 3-event warm-up; state evicted after 1h idle
    val amem = MemoryStream[(Long, Timestamp, Double)]
    val aevents = amem.toDF().toDF("user_id", "ts", "value")
      .as[StatefulOps.Event]
    val alerts = StatefulOps.anomalies(aevents, factor = 3.0, minEvents = 3)
      .writeStream.format("console").outputMode("append").start()

    println("--- batch 1: warm-up (3 normal events, no alert expected) ---")
    amem.addData((1L, ts("2024-01-01 00:00:00"), 10.0),
                 (1L, ts("2024-01-01 00:05:00"), 12.0),
                 (1L, ts("2024-01-01 00:10:00"), 11.0))
    alerts.processAllAvailable()

    println("--- batch 2: value 99 vs running mean 11 -> ONE alert row ---")
    amem.addData((1L, ts("2024-01-01 00:15:00"), 99.0))
    alerts.processAllAvailable()

    println("--- batch 3: advance the watermark ~2h past the spike ---")
    amem.addData((2L, ts("2024-01-01 02:30:00"), 5.0))
    alerts.processAllAvailable()

    println("--- batch 4: LATE data — user 1 spike stamped 00:20, behind the")
    println("--- current watermark (02:30 - 1h = 01:30): dropped before the")
    println("--- detector, NO alert ---")
    amem.addData((1L, ts("2024-01-01 00:20:00"), 500.0))
    alerts.processAllAvailable()

    alerts.stop()
    spark.stop()
    println("done: 1 alert total — the batch-2 spike; the batch-4 late spike was dropped")
  }
}
