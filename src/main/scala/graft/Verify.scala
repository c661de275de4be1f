package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_STATS=1: same A/B switch as Bench — the correctness
    // gate must stay 268/268 green with the stats planner reshaping
    // joins, or a planner "win" is a wrong answer delivered faster.
    if (sys.env.get("SPARK_GRAFT_STATS").contains("1")) {
      graft.plans.StatsJoinPlanner.install(spark)
      // the Graft session shape also includes the manifest-skipping
      // rule (a no-op here: the battery's plain parquet tables never
      // populate the FileSkip registry) — installed for faithfulness
      graft.plans.FileSkipScan.install(spark)
      graft.sources.Tables.names.foreach { n =>
        graft.sources.TableStatistics.analyzeParquet(
          spark, s"$sfDir/$n.parquet",
          graft.sources.Tables.load(spark, sfDir, n)): Unit
      }
    }
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=q42,q101_ivfpq — iterate on a subset (same
    // contract as Bench); the dumped oracle_sql.json is filtered to
    // match so tools/check.py checks exactly what was run.
    // an all-whitespace filter means "no filter" (Bench's startsWith("")
    // semantics), and a typo that matches nothing fails LOUDLY instead
    // of silently writing an empty oracle_sql.json that checks nothing
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .filter(_.nonEmpty)
    def selected(name: String): Boolean =
      only.forall(o => o(name) || o.exists(p => name.startsWith(p)))
    val queries = SparkEntry.queries.filter(kv => selected(kv._1))
    require(only.isEmpty || queries.nonEmpty,
      s"SPARK_GRAFT_ONLY=${only.get.mkString(",")} matches no query")
    queries.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    def q(s: String): String = graft.util.Json.escape(s)
    val json = SparkEntry.oracleSql.filter(kv => selected(kv._1))
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
