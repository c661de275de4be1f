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

  test("profile reports hot-key mass and the salt factor saltedJoin needs") {
    // 64 rows: key 7 holds 32 (50%), key 8 holds 16 (25%), keys 100-115
    // hold 1 each — at partitions=8 the ideal slice is 8 rows, so key 7
    // needs ceil(32*8/64)=4 salts, key 8 needs 2, cold keys 1.
    val rows = Seq.fill(32)(7L) ++ Seq.fill(16)(8L) ++ (100L to 115L)
    val df = rows.map(k => (k, "x")).toDF("k", "payload")
    val out = Skew.profile(df, "k", partitions = 8, topK = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(out.length == 3)
    assert(out(0) == ((7L, 32L, 500000L, 18L, 4L)))
    assert(out(1) == ((8L, 16L, 250000L, 18L, 2L)))
    // third row: count-1 ties broken by key asc -> key 100, salts 1
    assert(out(2) == ((100L, 1L, 15625L, 18L, 1L)))
  }

  test("profile refuses key names that collide with its own output columns") {
    val df = Seq((1L, "x")).toDF("n_rows", "payload")
    val e = intercept[IllegalArgumentException] {
      Skew.profile(df, "n_rows", partitions = 8)
    }
    assert(e.getMessage.contains("collides"), e.getMessage)
  }

  test("profile top-k output is the same under any input partitioning") {
    val rows = (1L to 200L).flatMap(k => Seq.fill((k % 5).toInt + 1)(k))
    val df = rows.map(k => (k, k * 2)).toDF("k", "v")
    val expected = Skew.profile(df.repartition(1), "k", partitions = 32)
      .collect().map(_.toString).toSeq
    Seq(3, 17).foreach { n =>
      val got = Skew.profile(df.repartition(n), "k", partitions = 32)
        .collect().map(_.toString).toSeq
      assert(got == expected, s"repartition($n)")
    }
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
