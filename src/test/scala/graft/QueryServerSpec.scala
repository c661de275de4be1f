package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.scalatest.funsuite.AnyFunSuite
import graft.server.QueryServer

/** SQL-over-HTTP surface: health, query rows, limit cap, error path —
  * through a real socket. */
class QueryServerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val server = {
    val s = new QueryServer(new Graft(spark, TestSpark.sf0001), port = 0)
    s.start(); s
  }
  private lazy val base = s"http://127.0.0.1:${server.boundPort}"
  private val client = HttpClient.newHttpClient()

  private def post(path: String, body: String): HttpResponse[String] =
    client.send(HttpRequest.newBuilder(URI.create(base + path))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString())

  test("health endpoint") {
    val r = client.send(HttpRequest.newBuilder(URI.create(base + "/health")).GET().build(),
      HttpResponse.BodyHandlers.ofString())
    assert(r.statusCode() == 200 && r.body().contains("\"ok\""))
  }

  test("query returns columns and rows as JSON") {
    val r = post("/query", "SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey")
    assert(r.statusCode() == 200)
    assert(r.body().contains("\"columns\":[\"r_regionkey\",\"r_name\"]"))
    assert(r.body().contains("[0,\"AFRICA\"]"))
    assert(r.body().contains("\"n\":5"))
  }

  test("graft functions are available over HTTP") {
    val r = post("/query",
      "SELECT ROUND(graft_cosine(embedding, embedding), 6) c FROM embeddings WHERE vec_id = 0")
    assert(r.statusCode() == 200 && r.body().contains("[1.0]"), r.body())
  }

  test("limit caps returned rows") {
    val r = post("/query?limit=3", "SELECT o_orderkey FROM orders ORDER BY o_orderkey")
    assert(r.statusCode() == 200 && r.body().contains("\"n\":3"))
  }

  test("bad SQL returns a clean 400 error, not a stack trace") {
    val r = post("/query", "SELECT FROM nope")
    assert(r.statusCode() == 400)
    assert(r.body().startsWith("{\"error\":"))
    assert(!r.body().contains("at org.apache"))
  }
}
