package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.{Skew, Windows}

class AsOfSkewSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("asOfJoin attaches latest prior right row per key, inclusive at ties") {
    val trades = Seq(
      (1L, ts("2024-01-01 10:00:05"), 100.0),
      (1L, ts("2024-01-01 10:00:20"), 101.0),
      (2L, ts("2024-01-01 10:00:10"), 200.0)
    ).toDF("sym", "ts", "price")
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:00"), 99.5),
      (1L, ts("2024-01-01 10:00:20"), 100.5), // tie with trade 2 -> inclusive
      (2L, ts("2024-01-01 10:00:30"), 199.0)  // after the trade -> no match
    ).toDF("sym", "ts", "bid")

    val out = Windows.asOfJoin(trades, quotes, "sym", "ts")
      .select(col("sym"), col("price"), col("asof.bid").as("bid"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), Option(r.get(2)))).toSet
    assert(out == Set(
      (1L, 100.0, Some(99.5)),
      (1L, 101.0, Some(100.5)),
      (2L, 200.0, None)))
  }

  test("asOfJoin rightTiebreak makes equal-(key,ts) right rows deterministic") {
    val trades = Seq((1L, ts("2024-01-01 10:00:20"), 101.0)).toDF("sym", "ts", "price")
    // two quotes at the SAME (sym, ts): without a tiebreak the attached
    // row is partition-order-dependent; with one, the LAST in tiebreak
    // order must win — every repartitioning agrees.
    val quotes = Seq(
      (1L, ts("2024-01-01 10:00:20"), 100.5, 7L),
      (1L, ts("2024-01-01 10:00:20"), 100.9, 9L)
    ).toDF("sym", "ts", "bid", "qid")
    (1 to 4).foreach { n =>
      val out = Windows.asOfJoin(trades, quotes.repartition(n), "sym", "ts",
          rightTiebreak = Seq("qid"))
        .select(col("asof.qid")).collect().map(_.getLong(0)).toSeq
      assert(out == Seq(9L), s"repartition($n)")
    }
  }

  test("saltedJoin returns exactly the plain equi-join's rows") {
    val big = (1 to 500).map(i => (i % 3L, i.toLong)).toDF("k", "v")   // hot keys 0,1,2
    val small = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("k", "tag")
    val plain = big.join(small, "k").select("k", "v", "tag")
      .collect().map(_.toString).sorted
    val salted = Skew.saltedJoin(big, small, "k", salts = 8, saltBy = col("v"))
      .select("k", "v", "tag").collect().map(_.toString).sorted
    assert(salted.toSeq == plain.toSeq)
  }

  test("graft_dot and graft_cosine are callable from the SQL surface") {
    graft.sources.Tables.registerAll(spark, TestSpark.sf0001)
    val r = spark.sql(
      """SELECT graft_dot(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                 array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d,
        |       graft_cosine(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
        |                    array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT))) AS c
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 11.0)
    assert(math.abs(r.getDouble(1) - 1.0) < 1e-12)
  }

  test("graft_sqdist is callable from the SQL surface") {
    graft.sources.Tables.registerAll(spark, TestSpark.sf0001)
    val r = spark.sql(
      """SELECT graft_sqdist(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)),
        |                    array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS d
        |""".stripMargin).collect().head
    assert(r.getDouble(0) == 8.0)
  }
}
