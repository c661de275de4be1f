package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Queries, QueryTexts, QueryTextsExt}

/** Differential testing: every native DataFrame implementation must
  * return exactly the rows its validated Spark-SQL text returns (same
  * engine, independent formulation). This catches native-vs-contract
  * drift without needing the DuckDB oracle, and runs in CI via sbt
  * test.
  */
class DifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  // CI runs at sf0.001 (fast); GRAFT_DIFF_SF points the same triangle
  // at a bigger scale for one-off deep gates (e.g. sf0.01 — the
  // driver's own gate scale) without a second spec
  private val sfDir = sys.env.getOrElse("GRAFT_DIFF_SF", TestSpark.sf0001)

  test("q150's positionsBelow closure matches direct position enumeration") {
    // the systematic sampler's count-of-midpoints-below-x closes to
    // LEAST(k, ((2k·x − 1) DIV W + 1) DIV 2) — exercised over domains
    // chosen to hit every boundary (x at/adjacent to each midpoint,
    // W not divisible by 2k, W < k, single-row W). A truncate-vs-floor
    // divergence (Spark DIV vs DuckDB //) or an off-by-one here flips
    // sample membership silently at the gate.
    import spark.implicits._
    val k = 7
    for (w <- Seq(1L, 3L, k.toLong, 50L, 51L, 1000L, 999983L)) {
      val midpoints = (0 until k).map(i => (2L * i + 1) * w / (2 * k))
      def direct(x: Long) = midpoints.count(_ < x)
      val xs = (0L to math.min(w, 60L)) ++
        midpoints.flatMap(p => Seq(p - 1, p, p + 1)).filter(x => x >= 0 && x <= w)
      val got = xs.distinct.sorted.toDF("x")
        .selectExpr("x", s"CASE WHEN x <= 0 THEN 0L ELSE LEAST(${k}L, " +
          s"((2 * $k * x - 1) DIV $w + 1) DIV 2) END AS below")
        .as[(Long, Long)].collect().toMap
      xs.distinct.foreach { x =>
        assert(got(x) == direct(x), s"W=$w x=$x: got ${got(x)} want ${direct(x)}")
      }
      // total draws over the full weight range is exactly k: every
      // midpoint sits strictly below W, so belowCount(W) = k
      assert(direct(w) == k, s"W=$w")
    }
  }

  QueryTexts.spark.keys.toSeq.sorted.foreach { key =>
    test(s"$key: native == SQL text") {
      val nativeDf = Queries.all(key)(spark, sfDir)
      val sqlDf = Queries.sql(key)(spark, sfDir)
      // schema too: Row.toString alone would mask type/name drift
      // (LONG vs INT, DECIMAL vs DOUBLE) that the oracle gate catches late
      assert(nativeDf.schema.map(f => (f.name, f.dataType)) ==
        sqlDf.schema.map(f => (f.name, f.dataType)),
        s"schema drift: ${nativeDf.schema.simpleString} vs ${sqlDf.schema.simpleString}")
      assert(nativeDf.collect().map(_.toString).toSeq ==
        sqlDf.collect().map(_.toString).toSeq)
    }
  }

  // the hand-written extension surface (QueryTextsExt): same triangle,
  // adapted from the waves' validated DuckDB oracle formulations
  QueryTextsExt.spark.keys.toSeq.sorted.foreach { key =>
    test(s"$key: native == SQL text (ext)") {
      val nativeDf = Queries.all(key)(spark, sfDir)
      val sqlDf = {
        graft.sources.Tables.registerAll(spark, sfDir)
        spark.sql(QueryTextsExt.spark(key))
      }
      // schema too: Row.toString alone would mask type/name drift
      // (LONG vs INT, DECIMAL vs DOUBLE) that the oracle gate catches late
      assert(nativeDf.schema.map(f => (f.name, f.dataType)) ==
        sqlDf.schema.map(f => (f.name, f.dataType)),
        s"schema drift: ${nativeDf.schema.simpleString} vs ${sqlDf.schema.simpleString}")
      assert(nativeDf.collect().map(_.toString).toSeq ==
        sqlDf.collect().map(_.toString).toSeq)
    }
  }
}
