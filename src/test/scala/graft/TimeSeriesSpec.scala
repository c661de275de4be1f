package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.TimeSeries

/** TimeSeries.gapFill invariants: dense grid, zero-fill, carry-forward. */
class TimeSeriesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def ts(s: String) = Timestamp.valueOf(s)

  test("gapFill densifies, zero-fills, and carries the last non-zero value") {
    import spark.implicits._
    val series = Seq(
      ("u1", ts("2024-01-01 00:00:00"), 5L),
      ("u1", ts("2024-01-01 03:00:00"), 2L), // 2 missing hours before
      ("u2", ts("2024-01-01 10:00:00"), 7L)
    ).toDF("k", "h", "n")
    val out = TimeSeries.gapFill(series, "k", "h", "n")
      .orderBy("k", "h")
      .as[(String, Timestamp, Long, Long)].collect().toSeq
    assert(out == Seq(
      ("u1", ts("2024-01-01 00:00:00"), 5L, 5L),
      ("u1", ts("2024-01-01 01:00:00"), 0L, 5L),
      ("u1", ts("2024-01-01 02:00:00"), 0L, 5L),
      ("u1", ts("2024-01-01 03:00:00"), 2L, 2L),
      ("u2", ts("2024-01-01 10:00:00"), 7L, 7L)))
  }

  test("gapFill strict mode fails loudly on off-grid observations") {
    import spark.implicits._
    val misaligned = Seq(
      ("u1", ts("2024-01-01 00:00:00"), 5L),
      ("u1", ts("2024-01-01 00:30:00"), 2L) // not on the 1-hour grid
    ).toDF("k", "h", "n")
    // default (lenient): the 00:30 value silently vanishes — the
    // documented hazard strict mode exists to catch
    val lenient = TimeSeries.gapFill(misaligned, "k", "h", "n").collect()
    assert(lenient.length == 1 && lenient.head.getLong(2) == 5L)
    val e = intercept[IllegalArgumentException] {
      TimeSeries.gapFill(misaligned, "k", "h", "n", strict = true)
    }
    assert(e.getMessage.contains("silently dropped"))
    // aligned input passes strict untouched
    val aligned = Seq(
      ("u1", ts("2024-01-01 00:00:00"), 5L),
      ("u1", ts("2024-01-01 02:00:00"), 2L)
    ).toDF("k", "h", "n")
    assert(TimeSeries.gapFill(aligned, "k", "h", "n", strict = true).count() == 3)
  }

  test("gapFill rejects inputs carrying reserved column names") {
    import spark.implicits._
    val bad = Seq(("u1", ts("2024-01-01 00:00:00"), 1L, 9L)).toDF("k", "h", "n", "carried")
    intercept[IllegalArgumentException] { TimeSeries.gapFill(bad, "k", "h", "n") }
  }

  test("gapFill row count is span-bounded, never event-bounded") {
    import spark.implicits._
    // 1000 events inside one hour collapse to one bucket => one row
    val many = (1 to 1000).map(i => ("u", ts("2024-01-01 00:00:00"), 1L))
      .toDF("k", "h", "n")
      .groupBy("k", "h").agg(sum("n").as("n"))
    assert(TimeSeries.gapFill(many, "k", "h", "n").count() == 1)
  }
}
