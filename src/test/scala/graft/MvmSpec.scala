package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.operators.Mvm

/** Incremental materialized-view maintenance: the incremental result
  * must be row-identical to a full recompute under every mutation
  * shape (insert / delete / in-place change / group birth / group
  * death), deltas must be delta-sized, and the reserved-column and
  * maintained-column contracts must fail loudly. */
class MvmSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val keys = Seq("g")
  private val sums = Seq("sv" -> col("v"))

  private def view(base: DataFrame) = Mvm.compute(base, keys, "n", sums)

  private def asSet(df: DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet

  private def maintained(oldB: DataFrame, newB: DataFrame) =
    Mvm.applyDelta(view(oldB), Mvm.delta(oldB, newB, Seq("g", "v")),
      keys, "n", sums)

  test("applyDelta equals recompute under mixed insert/delete/change") {
    val base = Seq(("a", 1L), ("a", 2L), ("b", 5L), ("c", 7L)).toDF("g", "v")
    // a: one row changed; b: deleted entirely (group death);
    // c: untouched; d: new group (group birth)
    val neu = Seq(("a", 1L), ("a", 9L), ("c", 7L), ("d", 4L)).toDF("g", "v")
    assert(asSet(maintained(base, neu)) == asSet(view(neu)))
  }

  test("group death leaves the view (count reaches 0)") {
    val base = Seq(("a", 1L), ("b", 2L)).toDF("g", "v")
    val neu = Seq(("a", 1L)).toDF("g", "v")
    val out = asSet(maintained(base, neu))
    assert(out == Set(("a", 1L, 1L)))
  }

  test("insert-then-delete round-trips to the original view exactly") {
    val base = Seq(("a", 1L), ("b", 2L)).toDF("g", "v")
    val grown = Seq(("a", 1L), ("b", 2L), ("b", 3L), ("z", 9L)).toDF("g", "v")
    val d1 = Mvm.delta(base, grown, Seq("g", "v"))
    val d2 = Mvm.delta(grown, base, Seq("g", "v"))
    val back = Mvm.applyDelta(
      Mvm.applyDelta(view(base), d1, keys, "n", sums), d2, keys, "n", sums)
    assert(asSet(back) == asSet(view(base)))
  }

  test("delta is delta-sized: unchanged rows never appear") {
    val base = Seq(("a", 1L), ("b", 2L), ("c", 3L)).toDF("g", "v")
    val neu = Seq(("a", 1L), ("b", 2L), ("c", 4L)).toDF("g", "v")
    val d = Mvm.delta(base, neu, Seq("g", "v")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(d == Set(("c", 4L, 1L), ("c", 3L, -1L)))
  }

  test("duplicate rows maintain with bag semantics") {
    val base = Seq(("a", 1L), ("a", 1L)).toDF("g", "v")
    val neu = Seq(("a", 1L)).toDF("g", "v")
    assert(asSet(maintained(base, neu)) == Set(("a", 1L, 1L)))
  }

  test("a 20-step random mutation walk never drifts from recompute") {
    val rnd = new scala.util.Random(42)
    var rows = Vector.tabulate(30)(i => (s"g${i % 5}", (i % 7).toLong))
    var mv = view(rows.toDF("g", "v")).localCheckpoint()
    for (_ <- 1 to 20) {
      val next = rnd.nextInt(3) match {
        case 0 => rows :+ (s"g${rnd.nextInt(7)}", rnd.nextInt(10).toLong)
        case 1 if rows.nonEmpty => rows.patch(rnd.nextInt(rows.size), Nil, 1)
        case _ if rows.nonEmpty =>
          val i = rnd.nextInt(rows.size)
          rows.updated(i, (rows(i)._1, rows(i)._2 + 100))
        case _ => rows
      }
      val d = Mvm.delta(rows.toDF("g", "v"), next.toDF("g", "v"), Seq("g", "v"))
      mv = Mvm.applyDelta(mv, d, keys, "n", sums).localCheckpoint()
      rows = next
    }
    assert(asSet(mv) == asSet(view(rows.toDF("g", "v"))))
  }

  private val minsMaxs = (Seq("mn" -> col("v")), Seq("mx" -> col("v")))

  private def viewExt(base: DataFrame) =
    Mvm.compute(base, keys, "n", sums, minsMaxs._1, minsMaxs._2)

  private def maintainedExt(oldB: DataFrame, newB: DataFrame) =
    Mvm.applyDeltaExtrema(viewExt(oldB), Mvm.delta(oldB, newB, Seq("g", "v")),
      newB, keys, "n", sums, minsMaxs._1, minsMaxs._2)

  private def asSetExt(df: DataFrame) =
    df.collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
      r.getLong(3), r.getLong(4))).toSet

  test("MIN/MAX maintain under inserts and delete-repair a removed extremum") {
    val base = Seq(("a", 1L), ("a", 5L), ("a", 3L), ("b", 7L)).toDF("g", "v")
    // insert-only: no repair path needed, extrema fold in
    val ins = base.union(Seq(("a", 0L), ("b", 9L), ("c", 4L)).toDF("g", "v"))
    assert(asSetExt(maintainedExt(base, ins)) == asSetExt(viewExt(ins)))
    // the hard case: delete a's MIN (1) and MAX (5) in one mutation —
    // the new extrema (3, 3) are NOT derivable from the view + delta,
    // only from the repaired per-group recompute
    val del = Seq(("a", 3L), ("b", 7L)).toDF("g", "v")
    assert(asSetExt(maintainedExt(base, del)) == asSetExt(viewExt(del)))
    assert(asSetExt(maintainedExt(base, del))
      .contains(("a", 1L, 3L, 3L, 3L)), asSetExt(maintainedExt(base, del)))
    // delete a non-extremum: no repair needed, result still exact
    val del2 = Seq(("a", 1L), ("a", 5L), ("b", 7L)).toDF("g", "v")
    assert(asSetExt(maintainedExt(base, del2)) == asSetExt(viewExt(del2)))
    // group death and rebirth in one delta
    val churn = Seq(("b", 2L), ("c", 11L)).toDF("g", "v")
    assert(asSetExt(maintainedExt(base, churn)) == asSetExt(viewExt(churn)))
  }

  test("a 20-step random mutation walk never drifts extrema from recompute") {
    val rnd = new scala.util.Random(260814L)
    var rows = Vector("a" -> 3L, "b" -> 8L, "c" -> 1L)
    var mv = viewExt(rows.toDF("g", "v")).localCheckpoint()
    (1 to 20).foreach { _ =>
      val next = rnd.nextInt(3) match {
        case 0 => rows :+ (s"${('a' + rnd.nextInt(4)).toChar}" -> rnd.nextLong(20))
        case 1 if rows.nonEmpty => rows.patch(rnd.nextInt(rows.size), Nil, 1)
        case _ if rows.nonEmpty =>
          val i = rnd.nextInt(rows.size)
          rows.updated(i, rows(i)._1 -> rnd.nextLong(20))
        case _ => rows
      }
      val newB = next.toDF("g", "v")
      mv = Mvm.applyDeltaExtrema(mv,
          Mvm.delta(rows.toDF("g", "v"), newB, Seq("g", "v")),
          newB, keys, "n", sums, minsMaxs._1, minsMaxs._2)
        .localCheckpoint()
      rows = next
      assert(asSetExt(mv) == asSetExt(viewExt(rows.toDF("g", "v"))),
        s"drift at state $rows")
    }
  }

  test("reserved multiplicity column and missing maintained column fail loudly") {
    val base = Seq(("a", 1L)).toDF("g", "v")
    assertThrows[IllegalArgumentException] {
      Mvm.delta(base, base, Seq("g", Mvm.MultCol))
    }
    assertThrows[IllegalArgumentException] {
      Mvm.applyDelta(base.toDF("g", "other"),
        Mvm.delta(base, base, Seq("g", "v")), keys, "n", sums)
    }
  }
}
