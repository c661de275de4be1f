package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Stage-by-stage timing of the shingle/MinHash/LSH dedup pipeline —
  * dev tool for locating the hot stage at a given scale factor. */
object ProfileDedup {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"  $name%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    spark.range(1000).selectExpr("sum(id)").collect()
    for (round <- 1 to 2) {
      println(s"-- round $round")
      val docs = Tables.load(spark, sfDir, "documents")
      val arr = time("shingle arrays (ckpt)") {
        val a = Dedup.shingleArrays(docs).localCheckpoint(); a.count(); a
      }
      val sh = arr.select(col("doc_id"), explode(col("shs")).as("sh"))
      val sig = time("minhash sig inline (count)") {
        val s = Dedup.minhashSignatureFromArrays(arr, 8).localCheckpoint(); s.count(); s
      }
      val cand = time("lsh candidates (count)") {
        val c = Dedup.lshCandidates(sig, Seq(Seq(1, 2, 3, 4), Seq(5, 6, 7, 8)))
          .localCheckpoint(); c.count(); c
      }
      val pairs = time("jaccard verify (count)") {
        val p = Dedup.jaccardVerify(cand, sh).filter(col("jc") >= 0.7)
          .select("i", "j").localCheckpoint(); p.count(); p
      }
      time("connected components") {
        Dedup.connectedComponents(pairs).count()
      }
      time("q42 jaccardAllPairs agg") {
        // maxDf matches the graded q42 exactly — profiling a different
        // plan than the contract runs would mislead stage attribution
        Dedup.jaccardAllPairs(sh, maxDf = 1000).filter(col("jc") >= 0.2)
          .agg(count(lit(1))).collect()
      }
    }
    spark.stop()
  }
}
