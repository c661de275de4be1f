package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC") // bench the verified semantics
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Initialize Spark machinery (codegen compiler, shuffle, scheduler)
    // outside any query's timing; queries themselves still run cold, in
    // deterministic key order so runs are comparable.
    spark.range(1000).selectExpr("sum(id)").collect()
    // SPARK_GRAFT_ONLY=q42,q57 — comma-separated name prefixes to time a
    // subset while iterating; unset = the full graded battery.
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    var failed = List.empty[String]
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
    // A filter that matches nothing would emit a normal-looking
    // {"total":0} record — fail fast on the typo instead.
    require(selected.nonEmpty,
      s"SPARK_GRAFT_ONLY=${only.get.mkString(",")} matches no query")
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() }
      catch { case e: Throwable =>
        failed ::= name
        System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    // a failed query must be visible in the output, not a fast "success"
    val errs = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"errors":$errs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
