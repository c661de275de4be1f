package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, Join, LeafNode, LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Battery-level evidence for the Selinger DP: which contract
  * queries' OPTIMIZED join trees actually change when the exhaustive
  * DP replaces the greedy chain builder (stats-on, the mode where the
  * planner acts), and what those changes cost/buy in wall time.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.DpAudit"
  *
  * Per query: optimize the plan twice — DP enabled (shipped default)
  * and greedy-forced (StatsJoinPlanner.dpDisabled) — and compare a
  * join-tree SIGNATURE (nested join shape over table-named leaves;
  * expression ids and non-join operators normalized away). Queries
  * whose signature differs are then timed under both modes (3 reps,
  * min) in the same session. "The DP changes nothing on this battery"
  * is also a result — BASELINE.md records whichever it is.
  */
object DpAudit {

  /** Canonical join-tree signature of an optimized plan: join nodes
    * keep their type and nesting; scan leaves render as their table
    * directory name; everything else is transparent (unary) or a
    * bracketed binary. */
  private def sig(p: LogicalPlan): String = p match {
    case j: Join =>
      s"(${sig(j.left)} JOIN<${j.joinType}> ${sig(j.right)})"
    case l: LogicalRelation => l.relation match {
      case h: HadoopFsRelation =>
        // normalize run-specific names (temp-written parquet parts,
        // uuid dirs) to a fixed token — two runs of the same query
        // write fresh temps, and a name-level diff is not a PLAN diff
        h.location.rootPaths.headOption.map { p =>
          val n = p.getName
          if (n.matches("part-.*\\.parquet") || n.matches("[0-9a-f-]{16,}") ||
              n.matches(".*[0-9]{8,}.*")) "tmp" else n
        }.getOrElse("scan")
      case _ => "rel"
    }
    case u: UnaryNode => sig(u.child)
    case b: BinaryNode => s"${b.nodeName}[${sig(b.left)},${sig(b.right)}]"
    case _: LeafNode => "leaf"
    case other => other.nodeName
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.plans.StatsJoinPlanner.install(spark)
    graft.plans.FileSkipScan.install(spark)
    graft.sources.Tables.names.foreach { n =>
      graft.sources.TableStatistics.analyzeParquet(
        spark, s"$sfDir/$n.parquet",
        graft.sources.Tables.load(spark, sfDir, n)): Unit
    }
    val changed = Seq.newBuilder[(String, String, String)]
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        graft.plans.StatsJoinPlanner.dpDisabled = false
        val dpSig = sig(fn(spark, sfDir).queryExecution.optimizedPlan)
        graft.plans.StatsJoinPlanner.dpDisabled = true
        val grSig = sig(fn(spark, sfDir).queryExecution.optimizedPlan)
        graft.plans.StatsJoinPlanner.dpDisabled = false
        if (dpSig != grSig) {
          changed += ((name, dpSig, grSig))
          println(s"DIFF $name")
          println(s"  dp:     $dpSig")
          println(s"  greedy: $grSig")
        }
      } catch { case e: Throwable =>
        println(s"ERR $name: ${e.getMessage}")
      }
    }
    val diffs = changed.result()
    println(s"== join-tree diffs: ${diffs.size} of ${SparkEntry.queries.size}")
    // controlled singles on the changed set: same session, 3 reps, min
    def timeMin(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double =
      (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).count(): Unit
        (System.nanoTime() - t0) / 1e9
      }.min
    diffs.foreach { case (name, _, _) =>
      val fn = SparkEntry.queries(name)
      graft.plans.StatsJoinPlanner.dpDisabled = false
      val dpSec = timeMin(fn)
      graft.plans.StatsJoinPlanner.dpDisabled = true
      val grSec = timeMin(fn)
      graft.plans.StatsJoinPlanner.dpDisabled = false
      println(f"TIME $name dp=$dpSec%.3f greedy=$grSec%.3f ratio=${dpSec / grSec}%.2f")
    }
    spark.stop()
  }
}
