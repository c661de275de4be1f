package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.sources.Tables

/** The engine facade a reference user switches to: one object that
  * owns a correctly-configured session (UTC, AQE, ns-timestamp read,
  * right shuffle width), the table catalog, the SQL entry point with
  * graft functions registered, and the named contract queries.
  */
final class Graft(val spark: SparkSession, val dataDir: String,
                  stopOnClose: Boolean = true) {
  Tables.registerAll(spark, dataDir)
  // statistics-driven join planning for every SELECT through this
  // engine — a no-op until a managed table is ANALYZEd (the registry
  // only ever holds managed-table roots, so contract queries over
  // plain parquet are untouched)
  graft.plans.StatsJoinPlanner.install(spark)
  // manifest-level data skipping for managed-table scans — a no-op
  // until a managed read registers its stats sidecar (plain parquet
  // contract tables never populate the registry)
  graft.plans.FileSkipScan.install(spark)

  /** The embedded statement router — the facade's SQL surface IS the
    * engine's: managed-table DDL/DML, materialized views (with query
    * rewrite), constraints, transactions, CDC, time travel, EXPLAIN.
    * In-memory catalog; embed a durable one via `server.SqlRouter`
    * directly when restarts must reattach tables. */
  lazy val router: graft.server.SqlRouter = new graft.server.SqlRouter(spark)

  /** SQL entry point over the registered tables (+ graft_* functions).
    * Full engine SQL, not just Spark SQL: statements the router
    * recognizes (CREATE MANAGED TABLE, UPSERT, CREATE MATERIALIZED
    * VIEW, BEGIN...COMMIT, ...) run the engine's implementations;
    * everything else goes to `spark.sql` unchanged. */
  def sql(text: String): DataFrame = router.execute(text)

  /** A catalog table as a DataFrame. */
  def table(name: String): DataFrame = Tables.load(spark, dataDir, name)

  /** A named contract query (SURVEY.md §2). */
  def query(key: String): DataFrame = SparkEntry.queries(key)(spark, dataDir)

  /** Stops the SparkContext only if this engine created it (a
    * newSession()-derived engine must not kill its siblings). */
  def close(): Unit = if (stopOnClose) spark.stop()
}

object Graft {
  /** Local engine with the session configuration every entry point
    * needs; `cores` also sizes shuffle parallelism (small local runs
    * should not default to 200 reducers).
    *
    * One SparkContext exists per JVM: the first engine sets
    * master/cores; later engines get an ISOLATED session (own temp
    * views + session confs) over the shared context via newSession(),
    * so two engines on different data dirs never clobber each other's
    * catalogs. `close()` stops the shared context only for the engine
    * that created it.
    */
  def local(dataDir: String, cores: Int = Runtime.getRuntime.availableProcessors()): Graft = {
    val existing = SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
    val (spark, ownsContext) = existing match {
      case Some(s) =>
        val ns = s.newSession()
        Seq("spark.sql.shuffle.partitions" -> cores.toString,
          "spark.sql.session.timeZone" -> "UTC",
          "spark.sql.legacy.parquet.nanosAsLong" -> "true")
          .foreach { case (k, v) => ns.conf.set(k, v) }
        (ns, false)
      case None =>
        val s = SparkSession.builder()
          .master(s"local[$cores]")
          .appName("graft")
          .config("spark.sql.shuffle.partitions", cores)
          .config("spark.sql.session.timeZone", "UTC")
          .config("spark.sql.legacy.parquet.nanosAsLong", "true")
          .config("spark.ui.enabled", "false")
          .getOrCreate()
        (s, true)
    }
    spark.sparkContext.setLogLevel("WARN")
    new Graft(spark, dataDir, stopOnClose = ownsContext)
  }
}
