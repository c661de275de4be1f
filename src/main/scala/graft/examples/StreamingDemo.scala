package graft.examples

import java.sql.Timestamp
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.StreamingAnalytics

/** Minimal consumer of the streaming API: feeds micro-batches through
  * an in-memory source and prints each incremental result to the
  * console sink. Run: `sbt "runMain graft.examples.StreamingDemo"`.
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
    spark.stop()
  }
}
