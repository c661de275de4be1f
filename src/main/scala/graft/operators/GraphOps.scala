package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Iterative graph propagation in exact integer arithmetic — the
  * link-analysis companion to [[Dedup.connectedComponents]]'s
  * min-label propagation.
  *
  * Ranks are held in integer PPB (parts-per-billion of the total rank
  * mass) and every step is integer DIV, so the fixed point is
  * bit-identical on any engine and any partitioning — the same
  * portability rule as the repo's ppm scores (SURVEY.md §5). The
  * dangling-mass variant is the simple one (mass at sinks is dropped,
  * not redistributed); documented because published PageRank variants
  * differ exactly here.
  *
  * Scale shape: each iteration is one edges-to-ranks equi-join keyed
  * on src, one hash aggregate keyed on dst, and one left join back to
  * the node set — all hash-partitionable on node ids; with edges and
  * nodes co-bucketed on id the per-round shuffles collapse. Rounds are
  * the explicit `iters` budget (rank queries run a fixed handful), and
  * each round is checkpointed so lineage stays flat — the
  * connectedComponents discipline.
  */
object GraphOps {

  /** `iters` rounds of damped PageRank over `edges` (directed
    * (src, dst); parallel edges count toward out-degree and carry
    * separately) on the node set `nodes` (one `id` column; isolated
    * nodes keep the base rank). Returns (id, r) with r in integer ppb:
    *   r'(v) = (100-dampPct)·10^7 DIV n  +  dampPct · Σ_{u→v} (r(u) DIV od(u)) DIV 100
    */
  def pagerankPpb(nodes: DataFrame, edges: DataFrame, iters: Int,
                  dampPct: Int = 85): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(dampPct >= 0 && dampPct <= 100, "dampPct must be in [0,100]")
    val (nds, n1, eod) = prepare(nodes, edges)
    try rounds(nds, n1, eod, iters, dampPct)
      // each round checkpointed eagerly, so the returned frame no
      // longer references the cached inputs — release them (a bench
      // session runs many queries; pinned edge caches would accumulate)
    finally { nds.unpersist(); eod.unpersist(): Unit }
  }

  /** Bring-your-own-layout PageRank: the same rounds as
    * [[pagerankPpb]], but over a caller-provided node set `nds` (one
    * `id` column) and PRE-DERIVED contribution relation `eod`
    * ((src, dst, od) — od = out-degree of src over the WHOLE edge
    * set, parallel edges carried separately). No repartition, no
    * cache: the inputs' own physical layout is trusted as-is.
    *
    * This is the persisted-graph entry for data that outgrows an
    * in-session cache: store both sides as bucketed tables
    * ([[graft.sources.Tables.writeBucketed]] — nodes on `id`, eod on
    * `src`, bucket count = `spark.sql.shuffle.partitions`) and every
    * round's src-side join and the final id-keyed left join consume
    * pre-partitioned buckets straight from disk; the only exchange
    * left is the dst contribution aggregation, PageRank's inherent
    * communication. ScaleBench's `g_pr_*` A/B (SCALING.md round 8)
    * measures this layout against [[pagerankPpb]]'s
    * repartition+cache. */
  def pagerankPpbOver(nds: DataFrame, eod: DataFrame, iters: Int,
                      dampPct: Int = 85): DataFrame = {
    require(iters >= 0, "iters must be >= 0")
    require(dampPct >= 0 && dampPct <= 100, "dampPct must be in [0,100]")
    val nodes = nds.select(col("id"))
    val n1 = nodes.agg(count(lit(1)).as("n"))
    rounds(nodes, n1, eod.select(col("src"), col("dst"), col("od")),
      iters, dampPct)
  }

  /** The damped-iteration loop shared by both entries: uniform start,
    * `iters` [[step]]s, ONE checkpoint at the end.
    *
    * Round-11: the per-ROUND localCheckpoint was dropped — each rank
    * frame is consumed exactly once (by the next round), so the chain
    * is a linear plan, and a checkpoint's LogicalRDD comes back
    * `UnknownPartitioning` under AQE, which re-shuffled the rank side
    * of every round's src join (prepare's cache keeps the EDGE side
    * partitioned; this keeps the rank side flowing hash-partitioned
    * through the whole chain — guide §2.4). The single final
    * checkpoint still (a) materializes the ranks while the callers'
    * caches are alive — pagerankPpb unpersists nds/eod on return, so a
    * fully-lazy result would recompute the edge relation per consumer
    * — and (b) keeps the consumer's plan flat. */
  private def rounds(nds: DataFrame, n1: DataFrame, eod: DataFrame,
                     iters: Int, dampPct: Int): DataFrame = {
    val uniform = nds.crossJoin(broadcast(n1))
      .selectExpr("id", "CAST(1000000000 DIV n AS BIGINT) AS r")
    (1 to iters).foldLeft(uniform) { (r, _) =>
      step(nds, n1, eod, r, dampPct)
    }.localCheckpoint()
  }

  /** CO-PARTITIONED once-materialized inputs: the node set hashed on
    * `id` and the (src, dst, od) contribution edges hashed on `src`.
    * `cache()` rather than `localCheckpoint()`: an InMemoryRelation
    * REPORTS the cached plan's partitioning to every consumer, while
    * a checkpoint's LogicalRDD comes back `UnknownPartitioning` under
    * AQE (measured on Spark 4.1) and would re-shuffle the edge
    * relation — the dominant one — every round. The explicit partition
    * count keeps AQE from coalescing the map output to a count no join
    * requirement matches. Net: each [[step]]'s only exchange is the
    * contribution aggregation on `dst` — the inherent PageRank
    * communication — which GraphOpsSpec pins by counting Exchange
    * nodes in the round plan.
    */
  private[graft] def prepare(nodes: DataFrame,
                             edges: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val np = nodes.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    val nds = nodes.select(col("id")).repartition(np, col("id")).cache()
    val n1 = nds.agg(count(lit(1)).as("n"))
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("od"))
    val eod = edges.join(deg, "src").select(col("src"), col("dst"), col("od"))
      .repartition(np, col("src")).cache()
    // no eager materialization: round 1 fills both caches as a side
    // effect (two extra count() jobs here measurably slowed the
    // 1x bench cell for nothing)
    (nds, n1, eod)
  }

  /** One un-checkpointed PageRank round over the [[prepare]]d inputs.
    * Rank frames come out hash(id)-partitioned (the nds join key), so
    * the next round's edges-to-ranks join on `src` needs no exchange
    * on either side; contributions shuffle once on `dst`. */
  private[graft] def step(nds: DataFrame, n1: DataFrame, eod: DataFrame,
                          r: DataFrame, dampPct: Int): DataFrame = {
    val inc = eod.join(r.withColumnRenamed("id", "src"), "src")
      .selectExpr("dst AS id", "r DIV od AS c")
      .groupBy("id").agg(sum(col("c")).as("m"))
    nds.join(inc, Seq("id"), "left").crossJoin(broadcast(n1))
      .selectExpr("id",
        s"CAST((${100 - dampPct} * 10000000 DIV n) + $dampPct * coalesce(m, 0L) DIV 100 AS BIGINT) AS r")
  }

  /** Breadth-first reachability with an explicit `depth` budget:
    * returns (id, level) for every node reached within `depth` hops of
    * `seeds` (one `id` column; level 0 = the seeds themselves, each
    * node reported at its FIRST level only).
    *
    * Scale shape: each round is one edges-to-frontier equi-join keyed
    * on src, one distinct on the expanded frontier, and one anti join
    * against the visited set — all hash-partitionable on node ids.
    * The frontier is checkpointed per round (flat lineage; visited
    * stays a union of already-checkpointed frontiers, so the anti
    * join's lineage is one union deep). Depth is a fixed report
    * budget, so no per-round count() barrier probes for an empty
    * frontier — an empty round just makes later rounds no-ops.
    */
  def bfsLevels(edges: DataFrame, seeds: DataFrame, depth: Int): DataFrame = {
    require(depth >= 0, "depth must be >= 0")
    // NOT cached: measured negative result (SCALING.md round 6) — at
    // the typical 3-hop budget the one-shot cache build of the edge
    // relation costs more than three scan+shuffle reuses save (10x
    // cell regressed 7.5 s → 10.7 s cached). PageRank's prepare keeps
    // its cache because its per-round reuse is higher and measured to
    // win (tail slope 1.81x → 1.19x); deeper BFS budgets should
    // pre-cache the edges themselves.
    val e = edges.select(col("src"), col("dst"))
    val f0 = seeds.select(col("id")).distinct().localCheckpoint()
    val (out, _, _) = (1 to depth).foldLeft(
      (f0.withColumn("level", lit(0).cast("long")), f0, f0)) {
      case ((acc, frontier, visited), l) =>
        val next = e.join(frontier.withColumnRenamed("id", "src"), "src")
          .select(col("dst").as("id")).distinct()
          .join(visited, Seq("id"), "left_anti")
          .localCheckpoint()
        (acc.unionByName(next.withColumn("level", lit(l).cast("long"))),
          next, visited.unionByName(next))
    }
    out
  }
}
