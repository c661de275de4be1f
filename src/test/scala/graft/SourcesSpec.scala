package graft

import java.nio.file.Files
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.sources.Tables

/** Ingestion paths: CSV and JSON-lines with declared schemas round-trip
  * the same rows (the reference's schema-declared ingestion surface),
  * and the parquet catalog serves every table with its expected schema.
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("score", DoubleType)))

  test("csv ingestion with declared schema") {
    val dir = Files.createTempDirectory("graft_csv").toFile
    val f = new java.io.File(dir, "t.csv")
    Files.writeString(f.toPath, "id,name,score\n1,alpha,1.5\n2,beta,2.5\n")
    val df = Tables.loadAs(spark, f.getPath, "csv", schema)
    assert(df.schema == schema)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet ==
      Set((1L, "alpha", 1.5), (2L, "beta", 2.5)))
  }

  test("json-lines ingestion with declared schema") {
    val dir = Files.createTempDirectory("graft_json").toFile
    val f = new java.io.File(dir, "t.json")
    Files.writeString(f.toPath, """{"id":1,"name":"alpha","score":1.5}""" + "\n" +
      """{"id":2,"name":"beta","score":2.5}""" + "\n")
    val df = Tables.loadAs(spark, f.getPath, "json", schema)
    assert(df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet ==
      Set((1L, "alpha", 1.5), (2L, "beta", 2.5)))
  }

  test("unsupported format is rejected with a clear error") {
    val e = intercept[IllegalArgumentException] {
      Tables.loadAs(spark, "/tmp/x", "xml", schema)
    }
    assert(e.getMessage.contains("unsupported format"))
  }

  test("catalog serves all ten tables; events.ts is a usable timestamp") {
    Tables.names.foreach { n =>
      val df = Tables.load(spark, TestSpark.sf0001, n)
      assert(df.columns.nonEmpty, n)
    }
    val events = Tables.load(spark, TestSpark.sf0001, "events")
    assert(events.schema("ts").dataType == TimestampType)
  }
}
