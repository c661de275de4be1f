package graft.examples

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import org.apache.spark.sql.SparkSession
import graft.Graft
import graft.server.QueryServer

/** The curation loop end-to-end, over a real HTTP socket — the story a
  * data-engineering team runs every day, composed from the engine's
  * own pieces:
  *
  *   1. CREATE a constrained corpus table (PK + NOT NULL + CHECK,
  *      violations QUARANTINED, never silently dropped);
  *   2. CREATE a live MATERIALIZED VIEW dashboard over it;
  *   3. POST /ingest row batches (some dirty — watch them divert);
  *   4. SYNC TABLE a follower replica (CDC cursor, replay-idempotent);
  *   5. run the dashboard SELECT — served from the VIEW via the query
  *      rewrite (EXPLAIN proves it), including the WHERE-on-keys shape;
  *   6. audit: SHOW QUARANTINE / SHOW HISTORY / SHOW STATS.
  *
  * CurationLoopSpec asserts the same composition's invariants; this
  * main narrates it. Run:
  *   sbt "runMain graft.examples.CurationLoop"
  */
object CurationLoop {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dataDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val engine = new Graft(spark, dataDir)
    val server = new QueryServer(engine, port = 0)
    server.start()
    val base = s"http://127.0.0.1:${server.boundPort}"
    val client = HttpClient.newHttpClient()
    def post(path: String, body: String): String =
      client.send(HttpRequest.newBuilder(URI.create(base + path))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString()).body()
    def sql(stmt: String): String = post("/query", stmt)
    def step(title: String)(body: => String): Unit = {
      println(s"\n== $title")
      println(body.take(400))
    }

    val dir = java.nio.file.Files.createTempDirectory("graft_loop_demo").toString

    step("1. constrained corpus table (violations quarantine)") {
      sql(s"CREATE MANAGED TABLE docs (doc_id BIGINT, lang STRING, " +
        s"score DOUBLE, PRIMARY KEY (doc_id), NOT NULL (lang), " +
        s"CHECK (score >= 0)) LOCATION '$dir/docs' ON VIOLATION QUARANTINE")
    }
    step("2. live dashboard view (count + sum per language)") {
      sql(s"CREATE MATERIALIZED VIEW docs_mv OVER docs KEY (lang) " +
        s"COUNT n SUM (score AS s_score) LOCATION '$dir/docs_mv'")
    }
    step("3. HTTP ingest: 8 clean rows, 1 NULL lang, 1 negative score") {
      post("/ingest/docs",
        """{"columns":["doc_id","lang","score"],"keys":["doc_id"],
          |"rows":[[1,"en",0.9],[2,"en",0.5],[3,"de",0.7],[4,"de",0.2],
          |[5,"fr",0.8],[6,"en",0.4],[7,"fr",0.6],[8,"de",0.3],
          |[9,null,0.5],[10,"en",-1.0]]}""".stripMargin)
    }
    step("3b. the dirty rows were DIVERTED, not dropped") {
      sql("SHOW QUARANTINE FOR docs")
    }
    step("4. bootstrap a follower replica (CDC cursor)") {
      sql(s"SYNC TABLE docs_copy FROM docs KEY (doc_id) LOCATION '$dir/docs_copy'")
    }
    step("4b. mutate upstream, re-sync: the follower drains the delta") {
      sql("UPDATE docs SET score = score + 1.0 WHERE lang = 'de'")
      sql("DELETE FROM docs WHERE doc_id = 6")
      sql("SYNC TABLE docs_copy FROM docs KEY (doc_id)")
    }
    step("5. the dashboard query — WHERE on a view key, GROUP BY key") {
      sql("SELECT lang, count(*) AS n, sum(score) AS s FROM docs " +
        "WHERE lang = 'de' GROUP BY lang")
    }
    step("5b. EXPLAIN: the router serves it from the VIEW, not the base") {
      sql("EXPLAIN SELECT lang, count(*) AS n, sum(score) AS s FROM docs " +
        "WHERE lang = 'de' GROUP BY lang")
    }
    step("6. audit surfaces") {
      sql("SHOW HISTORY FOR docs") + "\n" +
        sql("ANALYZE TABLE docs") + "\n" +
        sql("SHOW STATS FOR docs")
    }
    step("follower == upstream (row counts)") {
      sql("SELECT (SELECT count(*) FROM docs) AS upstream, " +
        "(SELECT count(*) FROM docs_copy) AS follower")
    }
    server.stop()
    spark.stop()
  }
}
