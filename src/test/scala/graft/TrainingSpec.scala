package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.Text
import graft.sources.Tables

/** Internal-consistency properties of the q115–q120 wave — invariants
  * that hold at ANY scale factor, complementing the oracle hash gate
  * (which pins exact values at one SF).
  */
class TrainingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = TestSpark.sf0001

  private def run(name: String) = SparkEntry.queries(name)(spark, dir)

  test("q115: every rule's pass count is bounded by n_docs, pass_all by each rule") {
    val rows = run("q115_gopher_rules").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val n = r.getAs[Long]("n_docs")
      val passes = Seq("pass_len", "pass_mwl", "pass_stop", "pass_rep").map(r.getAs[Long])
      assert(passes.forall(p => p >= 0 && p <= n), r.toString)
      assert(passes.forall(_ >= r.getAs[Long]("pass_all")), r.toString)
    }
  }

  test("q116: dup bigram mass never exceeds the total; a doc's dup occurrences are never 1") {
    for (r <- run("q116_intradoc_repeat").collect()) {
      assert(r.getAs[Long]("dup_bigrams") <= r.getAs[Long]("total_bigrams"), r.toString)
      assert(r.getAs[Long]("dup_ppm") <= 1000000L, r.toString)
    }
  }

  test("q117: covered positions bounded by total tokens; affected docs by corpus size") {
    val r = run("q117_span_dedup").collect().head
    assert(r.getAs[Long]("covered_tokens") <= r.getAs[Long]("total_tokens"), r.toString)
    val nDocs = Tables.load(spark, dir, "documents").count()
    assert(r.getAs[Long]("docs_affected") <= nDocs, r.toString)
    assert(r.getAs[Long]("covered_ppm") <= 1000000L, r.toString)
  }

  test("q118: z2 is non-negative and the 10 rows arrive in ranked order") {
    val z = run("q118_user_anomaly").collect().map(_.getAs[Double]("z2"))
    assert(z.length == 10)
    assert(z.forall(_ >= 0.0))
    assert(z.sameElements(z.sortBy(-_)), z.mkString(","))
  }

  test("q119: scrub is idempotent and its accounting is self-consistent") {
    val docs = Tables.load(spark, dir, "documents")
    val once = docs.select(Text.scrub(col("text"), Seq("the", "a")).as("t"))
    val twice = once.select(Text.scrub(col("t"), Seq("the", "a")).as("t"))
    assert(once.exceptAll(twice).count() == 0 && twice.exceptAll(once).count() == 0)
    for (r <- run("q119_stopword_scrub").collect()) {
      assert(r.getAs[Long]("toks_removed") <= r.getAs[Long]("n_toks"), r.toString)
      // each removed token surrenders its characters and (at least) one
      // joining space, except when a doc loses ALL its tokens
      assert(r.getAs[Long]("chars_removed") >= r.getAs[Long]("toks_removed"), r.toString)
    }
  }

  test("q122: per-source nll stats are ordered and strictly positive") {
    val rows = run("q122_perplexity").collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (lo, mean, hi) = (r.getAs[Double]("min_nll"),
        r.getAs[Double]("mean_nll"), r.getAs[Double]("max_nll"))
      assert(lo > 0 && lo <= mean + 1e-6 && mean <= hi + 1e-6, r.toString)
    }
  }

  test("q123: leakage is bounded by the split size and reports held-out splits only") {
    val rows = run("q123_split_leakage").collect()
    assert(rows.map(_.getAs[String]("split")).sorted.toSeq == Seq("test", "val"))
    for (r <- rows) {
      assert(r.getAs[Long]("n_leaked") <= r.getAs[Long]("n_docs"), r.toString)
      assert(r.getAs[Long]("leaked_ppm") <= 1000000L, r.toString)
    }
  }

  test("q120: cumulative users is monotone and converges to the distinct-user total") {
    val rows = run("q120_cumulative_users").collect()
    val cums = rows.map(_.getAs[Long]("cum_users"))
    assert(cums.sameElements(cums.sorted), "cumulative count must be monotone")
    assert(rows.map(_.getAs[Long]("n_new")).sum == cums.last)
    val users = Tables.load(spark, dir, "events").select("user_id").distinct().count()
    assert(cums.last == users)
    for (r <- rows)
      assert(r.getAs[Long]("dau") <= r.getAs[Long]("cum_users"), r.toString)
  }
}
