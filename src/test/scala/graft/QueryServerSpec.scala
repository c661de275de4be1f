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

  test("DML statements run over HTTP: create, insert, update, select") {
    val root = java.nio.file.Files.createTempDirectory("graft_httpdml").toString + "/t"
    val c = post("/query",
      s"CREATE MANAGED TABLE http_t (id BIGINT, v DOUBLE) LOCATION '$root'")
    assert(c.statusCode() == 200 && c.body().contains("\"create\""), c.body())
    assert(post("/query", "INSERT INTO http_t VALUES (1, 1.5), (2, 2.5)").statusCode() == 200)
    assert(post("/query", "UPDATE http_t SET v = v + 10 WHERE id = 2").statusCode() == 200)
    val q = post("/query", "SELECT id, v FROM http_t ORDER BY id")
    assert(q.statusCode() == 200 && q.body().contains("[2,12.5]"), q.body())
    // DML on an unmanaged name surfaces as a clean client error
    val bad = post("/query", "DELETE FROM never_registered WHERE 1=1")
    assert(bad.statusCode() == 400, bad.body())
  }
}
