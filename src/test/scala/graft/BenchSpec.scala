package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.util.Json

/** The bench artifact ship-gate: a graded BENCH_r{N} record that is
  * truncated, partially-run, or mis-escaped must fail at the PRODUCER
  * (Bench exits nonzero) — r02 shipped a `parsed: null` artifact and
  * this class of failure must never recur. Exercises the exact record
  * builder main uses, against the real contract keyset.
  */
class BenchSpec extends AnyFunSuite {

  private val allKeys = SparkEntry.queries.keySet
  private def fullRecord(keys: Iterable[String] = allKeys.toSeq.sorted) =
    Bench.record(keys.map(_ -> 0.123).toSeq, Nil,
      "/root/testdata/sf0.1", 0.5, 7.8)

  test("a full-battery record is valid JSON and covers the whole contract") {
    val rec = fullRecord()
    assert(Json.isValid(rec), rec.take(200))
    assert(Bench.artifactProblems(rec, allKeys).isEmpty)
  }

  test("record survives hostile sfDir paths (quotes, backslashes)") {
    val rec = Bench.record(Seq("q01_x" -> 1.0), Seq("q01_x"),
      "/tmp/we\"ird\\dir", 1.5, 2.0)
    assert(Json.isValid(rec), rec)
  }

  test("a truncated record is rejected") {
    val rec = fullRecord()
    val cut = rec.substring(0, rec.length / 2)
    val problems = Bench.artifactProblems(cut, allKeys)
    assert(problems.exists(_.contains("not parseable")), problems)
    assert(problems.exists(_.contains("missing from record")), problems)
  }

  test("a partial run shipped as the full battery is rejected") {
    val dropped = allKeys.toSeq.sorted.drop(3)
    val problems = Bench.artifactProblems(fullRecord(dropped), allKeys)
    assert(problems.exists(p => p.contains("missing from record") &&
      allKeys.toSeq.sorted.take(3).forall(p.contains)), problems)
  }

  test("a record with queries the contract doesn't declare is rejected") {
    val problems = Bench.artifactProblems(
      fullRecord(allKeys.toSeq :+ "q999_phantom"), allKeys)
    assert(problems.exists(_.contains("q999_phantom")), problems)
  }

  test("Json.isValid accepts the shapes we emit and rejects broken ones") {
    assert(Json.isValid("""{"a":1,"b":[1,2.5e-3,-4],"c":"x\"y","d":null}"""))
    assert(Json.isValid("""{"empty":{},"arr":[]}"""))
    assert(!Json.isValid("""{"a":1"""))      // unclosed object
    assert(!Json.isValid("""{"a":1} extra""")) // trailing garbage
    assert(!Json.isValid("""{"a":}"""))      // missing value
    assert(!Json.isValid("""{"a":"unterminated}"""))
    assert(!Json.isValid("""{'a':1}"""))     // single quotes
  }

  test("every contract query also has an oracle entry (or is knowingly exempt)") {
    // the driver records a weaker rows-only check for queries without
    // oracle SQL — the repo's policy is that NONE are exempt
    assert(SparkEntry.oracleSql.keySet == allKeys,
      s"diff: ${(allKeys diff SparkEntry.oracleSql.keySet) ++
        (SparkEntry.oracleSql.keySet diff allKeys)}")
  }
}
