package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.operators.GraphOps

/** Integer-ppb PageRank: hand-computed fixed points, dangling and
  * isolated nodes, out-degree splitting, parallel edges, and
  * partitioning invariance. */
class GraphOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def ranks(nodes: Seq[String], edges: Seq[(String, String)],
                    iters: Int): Map[String, Long] =
    GraphOps.pagerankPpb(nodes.toDF("id"),
        edges.toDF("src", "dst"), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("iters=0 is the uniform distribution") {
    assert(ranks(Seq("a", "b", "c", "d"), Seq("a" -> "b"), 0)
      == Map("a" -> 250000000L, "b" -> 250000000L,
        "c" -> 250000000L, "d" -> 250000000L))
  }

  test("a 3-cycle conserves rank; the isolated node drops to base") {
    // n=4: base = 15*10^7 DIV 4 = 37_500_000; cycle nodes:
    // 37_500_000 + 85 * 250_000_000 DIV 100 = 250_000_000 (fixed point)
    val r = ranks(Seq("a", "b", "c", "d"),
      Seq("a" -> "b", "b" -> "c", "c" -> "a"), 3)
    assert(r == Map("a" -> 250000000L, "b" -> 250000000L,
      "c" -> 250000000L, "d" -> 37500000L))
  }

  test("out-degree splits contributions; sinks keep what they receive") {
    // n=4, a -> b and a -> c: after iter1
    //   base = 37_500_000; a gets base (no inbound)
    //   b,c get base + 85 * (250_000_000 DIV 2) DIV 100 = 143_750_000
    //   d isolated -> base
    val r = ranks(Seq("a", "b", "c", "d"), Seq("a" -> "b", "a" -> "c"), 1)
    assert(r == Map("a" -> 37500000L, "b" -> 143750000L,
      "c" -> 143750000L, "d" -> 37500000L))
  }

  test("parallel edges count toward out-degree and carry separately") {
    // a -> b twice, n=2: od(a)=2, inc(b) = 2 * (500_000_000 DIV 2)
    // base = 15*10^7 DIV 2 = 75_000_000
    // r1(b) = 75_000_000 + 85 * 500_000_000 DIV 100 = 500_000_000
    val r = ranks(Seq("a", "b"), Seq("a" -> "b", "a" -> "b"), 1)
    assert(r == Map("a" -> 75000000L, "b" -> 500000000L))
  }

  test("result is invariant to input partitioning") {
    val nodes = (1 to 50).map(i => s"n$i")
    val edges = (1 to 49).map(i => s"n$i" -> s"n${i + 1}") ++
      Seq("n50" -> "n1", "n1" -> "n25", "n10" -> "n3")
    val a = GraphOps.pagerankPpb(nodes.toDF("id"),
        edges.toDF("src", "dst").repartition(1), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = GraphOps.pagerankPpb(nodes.toDF("id").repartition(7),
        edges.toDF("src", "dst").repartition(5), 3)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a == b)
  }

  test("a PageRank round's only exchange is the contribution agg on dst") {
    // nds is checkpointed hash(id), eod hash(src), and the rank frame
    // comes out of the previous round hash(id) — so the round plan
    // must shuffle exactly ONCE (the inherent dst-keyed contribution
    // move). A second hash exchange means co-partitioning broke and
    // the edge relation re-shuffles every iteration — the scale
    // regression the r5 SCALING sweep flagged (1.81x/doubling).
    val nodes = (1L to 200L).toDF("id")
    val edges = (1L to 199L).map(i => i -> (i + 1)).toDF("src", "dst")
    val (nds, n1, eod) = GraphOps.prepare(nodes, edges)
    val r0 = nds.crossJoin(org.apache.spark.sql.functions.broadcast(n1))
      .selectExpr("id", "CAST(1000000000 DIV n AS BIGINT) AS r")
      .localCheckpoint()
    val round = GraphOps.step(nds, n1, eod, r0, 85)
    // tree walk, not text: InMemoryRelation PRINTS its one-time build
    // exchanges inside the leaf scan's string, but they are not part
    // of the per-round execution
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    def exchanges(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
      case s: ShuffleExchangeLike
          if s.outputPartitioning.toString.contains("hashpartitioning") =>
        s +: s.children.flatMap(exchanges)
      case other => other.children.flatMap(exchanges)
    }
    val found = exchanges(round.queryExecution.executedPlan)
    assert(found.size == 1,
      s"want 1 hash exchange, got ${found.size}:\n${round.queryExecution.executedPlan}")
    // and the round still computes the right thing end-to-end
    val full = GraphOps.pagerankPpb(nodes, edges, 2)
    assert(full.count() == 200)
  }

  test("pagerankPpbOver on bucketed tables matches pagerankPpb; buckets feed the rounds unshuffled") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val nodes = (1L to 300L).toDF("id")
    val edges = ((1L to 299L).map(i => i -> (i + 1)) ++
      Seq(300L -> 1L, 1L -> 150L, 10L -> 3L)).toDF("src", "dst")
    val expected = GraphOps.pagerankPpb(nodes, edges, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // the caller-owned layout: out-degrees derived once, both sides
    // persisted as bucketed tables (buckets = the session's shuffle
    // partitions, so agg output and bucket scans are co-partitioned)
    val eod = edges
      .join(edges.groupBy("src").agg(count(lit(1)).as("od")), "src")
      .select(col("src"), col("dst"), col("od"))
    // idempotent across suite runs: DROP TABLE alone leaves the
    // warehouse directory behind once the catalog entry is gone (new
    // session, same ./spark-warehouse) and saveAsTable then dies with
    // LOCATION_ALREADY_EXISTS — clear both before writing
    Seq("g_t_nodes", "g_t_eod").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir")
          .stripPrefix("file:"), t)
      def rm(x: java.io.File): Unit = {
        Option(x.listFiles).foreach(_.foreach(rm)); x.delete(): Unit
      }
      if (loc.exists) rm(loc)
    }
    graft.sources.Tables.writeBucketed(nodes, "g_t_nodes", 4, Seq("id"))
    graft.sources.Tables.writeBucketed(eod, "g_t_eod", 4, Seq("src"))
    val bNodes = spark.table("g_t_nodes")
    val bEod = spark.table("g_t_eod")
    val got = GraphOps.pagerankPpbOver(bNodes, bEod, 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)
    // Layout claim: with broadcast off (ranks too big to ship at real
    // scale), a round over the bucketed relations shuffles exactly
    // twice — the rank frame to the eod buckets and the inherent dst
    // contribution agg. Neither BUCKETED relation re-shuffles; plain
    // parquet inputs would add an exchange per scan per round.
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val n1 = bNodes.agg(count(lit(1)).as("n"))
      val r0 = bNodes.select("id").crossJoin(org.apache.spark.sql.functions.broadcast(n1))
        .selectExpr("id", "CAST(1000000000 DIV n AS BIGINT) AS r")
        .localCheckpoint()
      val round = GraphOps.step(bNodes.select("id"), n1,
        bEod.select("src", "dst", "od"), r0, 85)
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
      import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
      def exchanges(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => exchanges(a.executedPlan)
        case s: ShuffleExchangeLike
            if s.outputPartitioning.toString.contains("hashpartitioning") =>
          s +: s.children.flatMap(exchanges)
        case other => other.children.flatMap(exchanges)
      }
      val found = exchanges(round.queryExecution.executedPlan)
      assert(found.size <= 2,
        s"want <=2 hash exchanges over bucketed inputs, got ${found.size}:\n${round.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("invalid budgets fail loudly") {
    assertThrows[IllegalArgumentException] {
      GraphOps.pagerankPpb(Seq("a").toDF("id"),
        Seq("a" -> "a").toDF("src", "dst"), -1)
    }
    assertThrows[IllegalArgumentException] {
      GraphOps.pagerankPpb(Seq("a").toDF("id"),
        Seq("a" -> "a").toDF("src", "dst"), 1, dampPct = 101)
    }
  }

  private def levels(edges: Seq[(String, String)], seeds: Seq[String],
                     depth: Int): Map[String, Long] =
    GraphOps.bfsLevels(edges.toDF("src", "dst"), seeds.toDF("id"), depth)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("bfsLevels: each node at its FIRST level only, depth respected") {
    // a -> b -> c -> d, plus a shortcut a -> c: c is level 1, not 2
    val e = Seq("a" -> "b", "b" -> "c", "c" -> "d", "a" -> "c")
    assert(levels(e, Seq("a"), 3)
      == Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L))
    assert(levels(e, Seq("a"), 1) == Map("a" -> 0L, "b" -> 1L, "c" -> 1L))
    assert(levels(e, Seq("a"), 0) == Map("a" -> 0L))
  }

  test("bfsLevels: multi-source frontier, duplicate seeds collapse") {
    val e = Seq("a" -> "x", "b" -> "x", "x" -> "y")
    assert(levels(e, Seq("a", "b", "a"), 2)
      == Map("a" -> 0L, "b" -> 0L, "x" -> 1L, "y" -> 2L))
  }

  test("bfsLevels: an exhausted frontier makes later rounds no-ops") {
    // whole graph reached at depth 1; rounds 2..4 must add nothing
    // (and not error on the empty frontier)
    assert(levels(Seq("a" -> "b"), Seq("a"), 4)
      == Map("a" -> 0L, "b" -> 1L))
  }

  test("bfsLevels: a cycle back into visited territory terminates") {
    val e = Seq("a" -> "b", "b" -> "a")
    assert(levels(e, Seq("a"), 3) == Map("a" -> 0L, "b" -> 1L))
  }

  test("bfsLevels: invalid depth fails loudly") {
    assertThrows[IllegalArgumentException] {
      GraphOps.bfsLevels(Seq("a" -> "b").toDF("src", "dst"),
        Seq("a").toDF("id"), -1)
    }
  }
}
