package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Operator-level plan evidence: queries that localCheckpoint their
  * training rounds (the ANN/PQ family) hide the interesting aggregates
  * behind a LogicalRDD in the query-level dump, so this dumps
  * `.explain("formatted")` of the OPERATOR frames directly —
  * currently AnnSearch.centroids (= the shared meanCentroids shape)
  * over the sf embeddings table.
  *
  * args: <suffix> <outDir> [sfDir]
  */
object DumpOpPlans {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DumpOpPlans <suffix> <outDir> [sfDir]")
    val suffix = args(0)
    val outDir = java.nio.file.Paths.get(args(1))
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(outDir)
    val emb = graft.sources.Tables.load(spark, sfDir, "embeddings")
    def dump(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      java.nio.file.Files.writeString(outDir.resolve(s"${name}_$suffix.txt"), p)
      println(s"wrote $outDir/${name}_$suffix.txt")
    }
    dump("op_meanCentroids", graft.operators.AnnSearch.centroids(emb, dims = 64))
    spark.stop()
  }
}
