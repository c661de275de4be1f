package graft.server

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets.UTF_8
import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.apache.spark.sql.Row
import graft.Graft

/** SQL-over-HTTP surface matching the reference's access pattern
  * (queries submitted to an HTTP service, rows returned) — built on
  * the JDK's HttpServer, zero extra dependencies.
  *
  * Endpoints:
  *   - `GET  /health`          -> `{"status":"ok"}`
  *   - `POST /query` (SQL body) -> `{"columns":[...],"rows":[[...]],"n":N}`
  *   - `POST /query?limit=N`    -> cap returned rows (default 1000)
  *
  * The driver-side collect is capped by `limit` — the server is a
  * query front-end, not a bulk-export path; large results belong in
  * `df.write` to storage. Errors return HTTP 400 with the analysis
  * message (never a stack trace).
  */
final class QueryServer(engine: Graft, port: Int,
                        bindHost: String = "127.0.0.1") {

  /** Statement router: DML on managed tables -> [[SqlRouter]] /
    * ManagedTable; everything else -> spark.sql. Exposed so an
    * embedding host can pre-register managed tables. */
  val router = new SqlRouter(engine.spark)

  // Loopback by default: the endpoint executes arbitrary SQL with no
  // authentication, so exposing it beyond the host must be an explicit
  // caller decision (bindHost = "0.0.0.0").
  private val server = HttpServer.create(new InetSocketAddress(bindHost, port), 0)

  // Without an executor every handler runs on the single dispatcher
  // thread — one long query would block /health and all other
  // requests. A small pool keeps the front-end responsive; Spark
  // itself schedules the heavy work.
  private val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
  server.setExecutor(pool)

  /** Actual bound port (useful when constructed with port 0). */
  def boundPort: Int = server.getAddress.getPort

  private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
    val bytes = body.getBytes(UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def jsonStr(s: String): String = graft.util.Json.escape(s)

  private def jsonValue(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case n @ (_: Int | _: Long | _: Short | _: Byte) => n.toString
    case d: Double => if (d.isNaN || d.isInfinite) jsonStr(d.toString) else d.toString
    // render the FLOAT's shortest form: widening 0.1f to double first
    // would emit 0.10000000149011612
    case f: Float => if (f.isNaN || f.isInfinite) jsonStr(f.toString) else f.toString
    case d: java.math.BigDecimal => d.toPlainString
    case d: scala.math.BigDecimal => d.bigDecimal.toPlainString
    case r: Row => r.toSeq.map(jsonValue).mkString("[", ",", "]")
    case s: collection.Seq[_] => s.map(jsonValue).mkString("[", ",", "]")
    case m: collection.Map[_, _] =>
      m.map { case (k, x) => jsonStr(String.valueOf(k)) + ":" + jsonValue(x) }
        .mkString("{", ",", "}")
    case b: Array[Byte] => jsonStr(java.util.Base64.getEncoder.encodeToString(b))
    case other => jsonStr(other.toString) // timestamps, dates, strings
  }

  server.createContext("/health", (ex: HttpExchange) =>
    respond(ex, 200, """{"status":"ok"}"""))

  server.createContext("/query", (ex: HttpExchange) => {
    if (ex.getRequestMethod != "POST") respond(ex, 405, """{"error":"POST only"}""")
    else {
      val sql = new String(ex.getRequestBody.readAllBytes(), UTF_8)
      val limit = Option(ex.getRequestURI.getQuery)
        .flatMap(_.split("&").collectFirst {
          case kv if kv.startsWith("limit=") => kv.drop(6) })
        .flatMap(_.toIntOption) // malformed limit -> default, not a dropped connection
        .getOrElse(1000)
      try {
        val df = router.execute(sql)
        val rows = df.limit(limit).collect()
        val cols = df.columns.map(jsonStr).mkString("[", ",", "]")
        val data = rows.map(r => r.toSeq.map(jsonValue).mkString("[", ",", "]"))
          .mkString("[", ",", "]")
        respond(ex, 200, s"""{"columns":$cols,"rows":$data,"n":${rows.length}}""")
      } catch {
        case e: Exception =>
          val msg = Option(e.getMessage).toSeq
            .flatMap(_.linesIterator).map(_.trim).find(_.nonEmpty)
            .getOrElse(e.getClass.getSimpleName)
          // client errors (bad SQL) are 400; engine/executor failures
          // are 500 so retrying clients can tell them apart.
          // ParseException is an AnalysisException subclass, so one
          // case covers both parse and analysis errors.
          val code = e match {
            case _: org.apache.spark.sql.AnalysisException => 400
            // router statement-shape errors (unknown table, malformed
            // assignment, bad arity) are client errors too
            case _: IllegalArgumentException => 400
            case _ => 500
          }
          respond(ex, code, s"""{"error":${jsonStr(msg)}}""")
      }
    }
  })

  def start(): Unit = server.start()
  def stop(): Unit = { server.stop(0); pool.shutdown() }
}

/** Standalone entry point:
  * `sbt "runMain graft.server.QueryServer <dataDir> [port]"` */
object QueryServer {
  def main(args: Array[String]): Unit = {
    val dataDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val port = if (args.length > 1) args(1).toInt else 8090
    val engine = Graft.local(dataDir)
    val srv = new QueryServer(engine, port)
    srv.start()
    println(s"graft query server listening on :${srv.boundPort} over $dataDir")
    Thread.currentThread.join()
  }
}
