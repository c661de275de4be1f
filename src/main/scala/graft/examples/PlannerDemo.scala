package graft.examples

import org.apache.spark.sql.SparkSession
import graft.server.SqlRouter

/** Consumer of the statistics-driven planner: creates a star of
  * managed tables, shows the join plan BEFORE statistics (written
  * order, file-size broadcasts only), ANALYZEs, and shows the plan
  * re-ordered and broadcast-hinted from the collected ndv/histograms
  * — then flips the table sizes and shows the order flipping with the
  * stats. Run: `sbt "runMain graft.examples.PlannerDemo"`.
  */
object PlannerDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val r = new SqlRouter(spark)
    val base = java.nio.file.Files.createTempDirectory("graft_plannerdemo").toString

    r.execute(s"CREATE MANAGED TABLE fact (k1 BIGINT, k2 BIGINT, v BIGINT) LOCATION '$base/fact'")
    r.execute(s"CREATE MANAGED TABLE dim_small (k1 BIGINT, a BIGINT) LOCATION '$base/ds'")
    r.execute(s"CREATE MANAGED TABLE dim_big (k2 BIGINT, b BIGINT) LOCATION '$base/db'")
    r.execute("INSERT INTO fact SELECT id % 50 AS k1, id % 40 AS k2, id AS v FROM range(20000)")
    r.execute("INSERT INTO dim_small SELECT id AS k1, id AS a FROM range(5)")
    r.execute("INSERT INTO dim_big SELECT id AS k2, id AS b FROM range(5000)")

    val q = "SELECT fact.v, dim_small.a, dim_big.b FROM fact " +
      "JOIN dim_small ON fact.k1 = dim_small.k1 " +
      "JOIN dim_big ON fact.k2 = dim_big.k2"
    def leafOrder(): String = {
      import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
      r.execute(q).queryExecution.optimizedPlan.collect {
        case l: LogicalRelation => l.relation match {
          case h: HadoopFsRelation =>
            val p = h.location.rootPaths.head.toUri.getPath
            Seq("fact", "ds", "db").find(t => p.contains(s"/$t/")).getOrElse("?")
          case _ => "?"
        }
      }.mkString(" -> ")
    }

    println(s"\n== no statistics: planner leaves the written order ==")
    println(s"   join order: ${leafOrder()}")

    Seq("fact", "dim_small", "dim_big").foreach(t => r.execute(s"ANALYZE TABLE $t"))
    println(s"\n== after ANALYZE: greedy order from estimated cardinalities ==")
    println(s"   join order: ${leafOrder()}  (5-row dim first)")
    println("\n== SHOW STATS dim_big ==")
    r.execute("SHOW STATS dim_big").show(truncate = false)

    // flip the sizes; DML invalidates the stats, re-ANALYZE re-plans
    r.execute("DELETE FROM dim_small")
    r.execute("INSERT INTO dim_small SELECT id AS k1, id AS a FROM range(5000)")
    r.execute("DELETE FROM dim_big")
    r.execute("INSERT INTO dim_big SELECT id AS k2, id AS b FROM range(5)")
    Seq("fact", "dim_small", "dim_big").foreach(t => r.execute(s"ANALYZE TABLE $t"))
    println(s"\n== after the sizes (and stats) flip ==")
    println(s"   join order: ${leafOrder()}  (now the other dim leads)")

    println("\n== full plan with the stats-driven broadcast hints ==")
    println(r.execute(q).queryExecution.executedPlan.toString.take(1600))
    spark.stop()
  }
}
