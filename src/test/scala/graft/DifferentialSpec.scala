package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{Queries, QueryTexts}

/** Differential testing: every native DataFrame implementation must
  * return exactly the rows its validated Spark-SQL text returns (same
  * engine, independent formulation). This catches native-vs-contract
  * drift without needing the DuckDB oracle, and runs in CI via sbt
  * test.
  */
class DifferentialSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  QueryTexts.spark.keys.toSeq.sorted.foreach { key =>
    test(s"$key: native == SQL text") {
      val nativeDf = Queries.all(key)(spark, TestSpark.sf0001)
      val sqlDf = Queries.sql(key)(spark, TestSpark.sf0001)
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
