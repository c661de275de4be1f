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
      val native = Queries.all(key)(spark, TestSpark.sf0001)
        .collect().map(_.toString)
      val viaSql = Queries.sql(key)(spark, TestSpark.sf0001)
        .collect().map(_.toString)
      assert(native.toSeq == viaSql.toSeq)
    }
  }
}
