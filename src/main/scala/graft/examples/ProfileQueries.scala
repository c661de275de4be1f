package graft.examples

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query cost attribution for the bench battery (dev tool).
  *
  * The battery's per-query wall time at sf0.1 is dominated by FIXED
  * scheduling cost — barrier count × per-stage latency (BASELINE.md,
  * round 8 AQE attribution) — so the lever that matters is the number
  * of sequential jobs/stages a query schedules, not the bytes it
  * touches. This main measures exactly that: for every query (or a
  * SPARK_GRAFT_ONLY subset) it runs the same `fn(spark, dir).count()`
  * action Bench times, with a listener counting jobs, stages, tasks
  * and summed task time. Output is one TSV line per query to stdout
  * (wall, jobs, stages, tasks, taskSec) — sort by wall and read the
  * jobs/stages columns to find the barrier-heavy plans worth
  * restructuring.
  */
object ProfileQueries {
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

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskNanos = new AtomicLong(0L)
    val verbose = sys.env.get("PROFILE_VERBOSE").contains("1")
    // verbose mode also prints each job's wall duration (start→end) so
    // per-job fixed overhead is attributable without the UI
    val jobStartNanos = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) {
          jobStartNanos.put(j.jobId, System.nanoTime())
          val cs = Option(j.properties)
            .map(_.getProperty("callSite.short", "?")).getOrElse("?")
          System.err.println(s"[job] ${j.jobId} stages=${j.stageInfos.size} at $cs")
        }
      }
      override def onJobEnd(e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        if (verbose) Option(jobStartNanos.remove(e.jobId)).foreach { t0 =>
          System.err.println(f"[job] ${e.jobId} done ${(System.nanoTime() - t0) / 1e9}%.3fs")
        }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(): Unit }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        Option(t.taskMetrics).foreach(m => taskNanos.addAndGet(m.executorRunTime * 1000000L): Unit)
      }
    })

    // same warmup shape as Bench so the first query is comparable
    locally {
      import org.apache.spark.sql.functions._
      val t = spark.range(10000).selectExpr("id", "id % 7 AS k", "CAST(id AS STRING) AS s")
      val dim = spark.range(7).selectExpr("id AS k", "id * 2 AS v")
      t.join(broadcast(dim), "k").groupBy("k").agg(sum("id")).collect()
      t.join(dim.hint("merge"), "k").selectExpr("k", "id").orderBy("id").collect()
    }

    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(',').toSeq)
    val selected = graft.SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.exists(name.startsWith)) }
    println("query\twall_s\tplan_s\tjobs\tstages\ttasks\ttask_s")
    selected.foreach { case (name, fn) =>
      // settle listener events from the previous query before resetting
      Thread.sleep(120) // let listener events from the previous query drain
      jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0L)
      val t0 = System.nanoTime()
      var planSec = 0.0
      try {
        val df = fn(spark, sfDir)
        // analysis + optimization, before any execution (AQE re-plans
        // later; this isolates the driver-side Catalyst cost); note a
        // query builder may itself run jobs (localCheckpoint legs),
        // which land in plan_s — the jobs column tells them apart
        df.queryExecution.optimizedPlan
        planSec = (System.nanoTime() - t0) / 1e9
        df.count(): Unit
      }
      catch { case e: Throwable => System.err.println(s"[profile] $name FAILED: ${e.getMessage}") }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(120) // let listener events from the previous query drain
      println(f"$name\t$wall%.3f\t$planSec%.3f\t${jobs.get}\t${stages.get}\t${tasks.get}\t${taskNanos.get / 1e9}%.2f")
    }
    spark.stop()
  }
}
