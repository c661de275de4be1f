package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing

/** Concat-and-split sequence packing: exact window spans, partitioning
  * invariance, loud rejection of degenerate lengths. */
class PackingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def rootMsg(t: Throwable): String = {
    var c: Throwable = t
    val sb = new StringBuilder
    while (c != null) { sb.append(c.getMessage).append('\n'); c = c.getCause }
    sb.toString
  }

  test("concatPack lays docs head-to-tail per group and cuts every capacity tokens") {
    val docs = Seq(("a", 1L, 300L), ("a", 2L, 300L), ("a", 3L, 100L),
      ("b", 1L, 512L), ("b", 2L, 1500L)).toDF("src", "id", "n")
    val out = Packing.concatPack(docs, "src", "id", "n", 512L)
      .select("src", "id", "start", "bin_first", "bin_last", "n_boundary")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(out == Set(
      ("a", 1L, 0L, 0L, 0L, 0L),     // [0,299] fits window 0
      ("a", 2L, 300L, 0L, 1L, 1L),   // [300,599] cut once at 512
      ("a", 3L, 600L, 1L, 1L, 0L),   // [600,699] fits window 1
      ("b", 1L, 0L, 0L, 0L, 0L),     // exactly one full window
      ("b", 2L, 512L, 1L, 3L, 2L)))  // [512,2011] cut at 1024 and 1536
  }

  test("concatPack is invariant to input partitioning") {
    val docs = (1L to 400L).map(i => (s"s${i % 7}", i, (i % 90) + 1))
      .toDF("src", "id", "n")
    val expected = Packing.concatPack(docs.repartition(1), "src", "id", "n", 128L)
      .collect().map(_.toString).sorted.toSeq
    Seq(4, 19).foreach { p =>
      val got = Packing.concatPack(docs.repartition(p), "src", "id", "n", 128L)
        .collect().map(_.toString).sorted.toSeq
      assert(got == expected, s"repartition($p)")
    }
  }

  test("a zero or null length fails loudly naming the doc") {
    val zero = Seq(("a", 1L, 10L), ("a", 2L, 0L)).toDF("src", "id", "n")
    val e1 = intercept[Throwable] {
      Packing.concatPack(zero, "src", "id", "n", 64L).collect()
    }
    assert(rootMsg(e1).contains("n of 2 is 0"), rootMsg(e1))
    val nul = Seq(("a", 7L, null.asInstanceOf[java.lang.Long]))
      .toDF("src", "id", "n")
    val e2 = intercept[Throwable] {
      Packing.concatPack(nul, "src", "id", "n", 64L).collect()
    }
    assert(rootMsg(e2).contains("n of 7 is null"), rootMsg(e2))
    // even when the bad row is the LAST in its group (its length never
    // enters any successor's cumsum) the check must still fire
    val last = Seq(("a", 1L, 10L), ("a", 9L, 0L)).toDF("src", "id", "n")
    val e3 = intercept[Throwable] {
      Packing.concatPack(last, "src", "id", "n", 64L).collect()
    }
    assert(rootMsg(e3).contains("n of 9 is 0"), rootMsg(e3))
  }

  test("reserved output columns are rejected on the input") {
    val bad = Seq(("a", 1L, 10L)).toDF("src", "start", "n")
    val e = intercept[IllegalArgumentException] {
      Packing.concatPack(bad, "src", "start", "n", 64L)
    }
    assert(e.getMessage.contains("reserved"))
  }
}
