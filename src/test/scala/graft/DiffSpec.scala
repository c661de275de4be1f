package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Diff

/** Keyed snapshot diff: status semantics, null-vs-empty separation,
  * multi-column keys/content, partitioning invariance. */
class DiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("snapshotDiff classifies added/removed/changed/unchanged") {
    val old = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val neu = Seq((2L, "b"), (3L, "C"), (4L, "d")).toDF("k", "v")
    val out = Diff.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .select("k", "status").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("null content and empty string are different versions") {
    val old = Seq((1L, null.asInstanceOf[String]), (2L, "")).toDF("k", "v")
    val neu = Seq((1L, ""), (2L, null.asInstanceOf[String])).toDF("k", "v")
    val statuses = Diff.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .select("status").collect().map(_.getString(0)).toSeq
    assert(statuses == Seq("changed", "changed"))
  }

  test("null and the literal string of the sentinel's word are different versions") {
    // the null sentinel is control-char-prefixed, so real data that
    // happens to SAY "null" can never collide with an actual NULL
    val old = Seq((1L, "null")).toDF("k", "v")
    val neu = Seq((1L, null.asInstanceOf[String])).toDF("k", "v")
    val st = Diff.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .select("status").collect().map(_.getString(0))
    assert(st.toSeq == Seq("changed"))
  }

  test("content-hash column boundaries don't collide across columns") {
    // (ab, c) vs (a, bc): same concatenation without a separator
    val old = Seq((1L, "ab", "c")).toDF("k", "x", "y")
    val neu = Seq((1L, "a", "bc")).toDF("k", "x", "y")
    val st = Diff.snapshotDiff(old, neu, Seq("k"), Seq("x", "y"))
      .select("status").collect().map(_.getString(0))
    assert(st.toSeq == Seq("changed"))
  }

  test("diff result is invariant to input partitioning") {
    val old = (1L to 300L).map(i => (i, s"v$i")).toDF("k", "v")
    val neu = (101L to 400L).map(i => (i, if (i % 10 == 0) s"V$i" else s"v$i"))
      .toDF("k", "v")
    val expected = Diff.snapshotDiff(old.repartition(1), neu.repartition(1),
      Seq("k"), Seq("v")).collect().map(_.toString).sorted.toSeq
    val got = Diff.snapshotDiff(old.repartition(13), neu.repartition(7),
      Seq("k"), Seq("v")).collect().map(_.toString).sorted.toSeq
    assert(got == expected)
    // sanity on the mix: overlap 101..300, of which 20 multiples of 10
    val byStatus = Diff.snapshotDiff(old, neu, Seq("k"), Seq("v"))
      .groupBy("status").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStatus == Map("removed" -> 100L, "added" -> 100L,
      "changed" -> 20L, "unchanged" -> 180L))
  }
}
