package graft.examples

import java.nio.file.Files
import org.apache.spark.sql.SparkSession
import graft.server.SqlRouter

/** Walkthrough of the round-8 engine surface, pure SQL text through
  * the router (the same path the HTTP server serves). Run:
  * `sbt "runMain graft.examples.CdcDemo"`.
  *
  * The story: a constrained source table takes writes (bad rows
  * quarantined, multi-statement batches atomic), a follower table
  * replicates it by CDC deltas, and time travel + SHOW CHANGES answer
  * "what changed, when" — the reference database's daily UX,
  * lake-native.
  */
object CdcDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val router = new SqlRouter(spark)
    val base = Files.createTempDirectory("graft_cdc_demo").toString
    def run(sql: String): Unit = {
      println(s"\ngraft> ${sql.linesIterator.mkString(" ").trim}")
      try router.execute(sql).show(20, truncate = false)
      catch { case e: Exception =>
        println(s"  REFUSED: ${e.getMessage.linesIterator.next()}") }
    }

    // 1. a constrained table: PK + domain rule, bad rows diverted
    run(s"""CREATE MANAGED TABLE accounts (id BIGINT, owner STRING, balance BIGINT,
           |PRIMARY KEY (id), NOT NULL (owner), CHECK (balance >= 0))
           |LOCATION '$base/accounts' ON VIOLATION QUARANTINE""".stripMargin)
    run("INSERT INTO accounts VALUES (1, 'ada', 100), (2, 'bob', 50), (3, NULL, -7)")
    run("SHOW QUARANTINE accounts")   // the NULL-owner negative row
    run("SHOW CONSTRAINTS accounts")

    // 2. a multi-statement transaction: both mutations or neither
    run(s"CREATE MANAGED TABLE audit (id BIGINT, note STRING) LOCATION '$base/audit'")
    run("""BEGIN;
          |UPDATE accounts SET balance = balance - 30 WHERE id = 1;
          |INSERT INTO audit VALUES (1, 'transfer out 30');
          |COMMIT""".stripMargin)
    run("SELECT * FROM accounts ORDER BY id")

    // 3. the CDC read side and a follower that drains it
    run("SHOW CHANGES accounts FROM 1 KEY (id)")
    run(s"SYNC TABLE accounts_replica FROM accounts KEY (id) LOCATION '$base/replica'")
    run("UPDATE accounts SET balance = 99 WHERE id = 2")
    run("SYNC TABLE accounts_replica FROM accounts KEY (id)")
    run("SELECT * FROM accounts_replica ORDER BY id")

    // 4. time travel: the balance before the transaction, in one query
    run("SELECT id, balance FROM accounts VERSION AS OF 1 ORDER BY id")
    run("""SELECT c.id, o.balance AS before, c.balance AS now
          |FROM accounts c JOIN accounts VERSION AS OF 1 o ON c.id = o.id
          |WHERE c.balance != o.balance ORDER BY c.id""".stripMargin)

    spark.stop()
  }
}
