package graft

import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StatefulOps
import graft.streaming.StatefulOps.{Alert, Event}

/** flatMapGroupsWithState: per-key running state across micro-batches. */
class StatefulSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("anomaly state carries across micro-batches and respects warm-up") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = StatefulOps.anomalies(mem.toDS(), factor = 3.0, minEvents = 3)
      .writeStream.format("memory").queryName("anomaly_test").outputMode("append").start()
    try {
      // batch 1: three normal events build the baseline (mean 10)
      mem.addData(
        Event(1L, ts("2024-01-01 00:00:01"), 10.0),
        Event(1L, ts("2024-01-01 00:00:02"), 10.0),
        Event(1L, ts("2024-01-01 00:00:03"), 10.0))
      q.processAllAvailable()
      assert(spark.table("anomaly_test").count() == 0) // warm-up, no alerts

      // batch 2: spike (100 > 3*10) then normal; other user still warming up
      mem.addData(
        Event(1L, ts("2024-01-01 00:00:04"), 100.0),
        Event(1L, ts("2024-01-01 00:00:05"), 11.0),
        Event(2L, ts("2024-01-01 00:00:06"), 999.0))
      q.processAllAvailable()
      val alerts = spark.table("anomaly_test").as[Alert].collect()
      assert(alerts.length == 1)
      assert(alerts.head.user_id == 1L && alerts.head.value == 100.0)
      assert(math.abs(alerts.head.running_mean - 10.0) < 1e-9)
    } finally q.stop()
  }

  test("slidingCounts runs incrementally (q33 twin over MemoryStream)") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val events = mem.toDF().toDF("ts", "event_type", "value")
    val q = graft.streaming.StreamingAnalytics.slidingCounts(events)
      .writeStream.format("memory").queryName("sliding_test").outputMode("complete").start()
    try {
      mem.addData((ts("2024-01-01 00:20:00"), "click", 1.0))
      q.processAllAvailable()
      val wins = spark.table("sliding_test")
        .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
      // event at 00:20 belongs to 4 sliding windows starting 23:30..00:15
      assert(wins.map(_._1) ==
        Set(ts("2023-12-31 23:30:00"), ts("2023-12-31 23:45:00"),
            ts("2024-01-01 00:00:00"), ts("2024-01-01 00:15:00"))
          .map(_.getTime / 1000))
      assert(wins.forall(_._2 == 1L))
    } finally q.stop()
  }
}
