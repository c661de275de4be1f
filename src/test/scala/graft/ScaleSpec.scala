package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Windows

/** Order-of-magnitude smoke: the core operator shapes on 5-10M
  * generated rows (50-100x the sf0.1 bench tables) in local mode —
  * evidence the plans don't degenerate (driver collects, quadratic
  * blowups) when the data is two orders bigger than the fixtures.
  * Assertions are on exact results (closed-form ground truth), not
  * timing.
  */
class ScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("10M-row partial+final aggregate with exact closed-form check") {
    val n = 10_000_000L
    val agg = spark.range(n)
      .select((col("id") % 1000).as("k"), col("id").as("v"))
      .groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .agg(sum("s").as("total"), sum("c").as("rows"), count(lit(1)).as("groups"))
      .collect().head
    assert(agg.getLong(0) == n * (n - 1) / 2)
    assert(agg.getLong(1) == n && agg.getLong(2) == 1000L)
  }

  test("5M-row window (sessionize shape) stays per-key linear") {
    // 50k users x 100 events; every 10th event starts a new session
    // (gap 10x the threshold) -> exactly 10 sessions per user.
    val df = spark.range(5_000_000L)
      .select((col("id") % 50000).as("user_id"),
        expr("timestamp_micros((id DIV 50000) * 60000000 + " +
          "((id DIV 50000) DIV 10) * 700000000)").as("ts"),
        col("id").as("event_id"))
    val sessions = Windows.sessionize(df, col("user_id"), col("ts"), col("event_id"), 600000L)
      .groupBy("user_id").agg(countDistinct(col("session_id")).as("n"))
      .groupBy("n").count().collect()
    assert(sessions.length == 1 && sessions.head.getLong(0) == 10L
      && sessions.head.getLong(1) == 50000L)
  }

  test("5M x broadcast join keeps exact row counts") {
    val big = spark.range(5_000_000L).select((col("id") % 100).as("k"), col("id").as("v"))
    val dim = spark.range(100L).select(col("id").as("k"), concat(lit("d"), col("id")).as("name"))
    val out = big.join(broadcast(dim), "k")
    assert(out.count() == 5_000_000L)
    assert(out.filter(col("name") === "d7").count() == 50_000L)
  }
}
