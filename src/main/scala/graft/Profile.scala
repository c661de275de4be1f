package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Dev-only stage profiler for the dedup pipeline: times each stage of
  * the q50/q57 chain in isolation (each stage's inputs pre-materialized
  * via localCheckpoint so a stage's number is ITS cost, not its
  * lineage's). Usage: runMain graft.Profile <sfDir>
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val docs = Tables.load(spark, dir, "documents")
    time("shingles (cold)")(Dedup.shingles(docs).localCheckpoint())
    val sh = time("shingles (warm)")(Dedup.shingles(docs).localCheckpoint())
    val preDistinct = docs
      .select(col("doc_id"), split(lower(col("text")), " ").as("l"))
      .filter(size(col("l")) >= 3)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(1, size(l) - 2), i -> concat(element_at(l, i), ' ', element_at(l, i + 1), ' ', element_at(l, i + 2)))")).as("sh"))
    time("shingles no-distinct")(preDistinct.queryExecution.toRdd.count())
    time("tokenize only")(docs.select(col("doc_id"),
      explode(split(lower(col("text")), " ")).as("sh")).queryExecution.toRdd.count())
    val sig = time("minhash k=8")(Dedup.minhashSignature(sh, 8).localCheckpoint())
    val cand = time("lsh bands")(Dedup.lshCandidates(sig,
      Seq(Seq(1, 2, 3, 4), Seq(5, 6, 7, 8))).localCheckpoint())
    val pairs = time("jaccard verify")(Dedup.jaccardVerify(cand, sh)
      .filter(col("jc") >= 0.7).select("i", "j").localCheckpoint())
    time("connected components")(Dedup.connectedComponents(pairs).count())
    time("q42 jaccardAllPairs")(Dedup.jaccardAllPairs(sh).count())
    spark.stop()
  }
}
