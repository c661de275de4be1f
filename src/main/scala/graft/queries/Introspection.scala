package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.GraphOps
import graft.sources.Tables

/** Storage & planner introspection wave (q144–q147, round 5): the
  * reports an engine operator runs about ITS OWN storage layout and
  * statistics — graph reachability with a hop budget, zone-map
  * pruning effectiveness across layouts, a measured bloom-filter
  * pre-join, and the equi-depth histogram a cost-based planner keeps
  * per column. The q142/q143 theme continued: the engine measures the
  * machinery it ships (zone maps in `Tables.compact`/`zorder`, the
  * histogram feeding q143's cardinality estimates) instead of
  * asserting it.
  *
  * Same t2 gate as every wave: DuckDB oracles in [[oracle]],
  * prototyped at sf0.01/sf0.1 before the natives; determinism per
  * SURVEY.md §5 — every figure is an exact integer (counts, integer
  * DIV ppm), and the bloom hash is the repo's content-addressed md5
  * (identical hex in both engines), so no float and no engine RNG
  * ever enters a compare.
  */
object Introspection {

  private def cnt = count(lit(1))

  def queries: Map[String, Queries.QueryFn] = Map(

    // Multi-source BFS over the part<->supplier trading graph (q142's
    // edge set) from the deterministic seed cohort sk % 7 = 0, with a
    // 3-hop budget: per level, how many new nodes become reachable
    // and on which side of the bipartite graph they sit. Levels
    // alternate sides by construction (parts at odd hops, suppliers
    // at even) — the report pins that plus the reach counts. Scale
    // shape: GraphOps.bfsLevels — per round one keyed join + distinct
    // + anti join, frontier checkpointed; depth is the fixed budget
    // of a reachability REPORT, not an open-ended traversal.
    "q144_bfs_reach" -> ((s, dir) => {
      // Node ids stay INTEGERS through every BFS shuffle (part = +pk,
      // supplier = -sk-1, both injective) — long hashing/compares beat
      // string keys in every per-round join; the 'p…'/'s…' labels the
      // oracle sees are minted only on the final ~node-count report.
      val pe = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"))
        .distinct().localCheckpoint()
      val edges = pe.select(col("pk").as("src"), (-col("sk") - 1).as("dst"))
        .unionByName(pe.select((-col("sk") - 1).as("src"), col("pk").as("dst")))
      val seeds = pe.filter(col("sk") % 7 === 0).select((-col("sk") - 1).as("id"))
      GraphOps.bfsLevels(edges, seeds, depth = 3)
        .withColumn("label", when(col("id") >= 0,
            concat(lit("p"), col("id").cast("string")))
          .otherwise(concat(lit("s"), (-col("id") - 1).cast("string"))))
        .groupBy("level")
        .agg(cnt.as("n_reached"),
          sum(when(col("id") >= 0, 1L).otherwise(0L)).as("n_parts"),
          sum(when(col("id") < 0, 1L).otherwise(0L)).as("n_sups"),
          min(col("label")).as("first_node"))
        .orderBy("level")
    }),

    // Zone-map pruning effectiveness, the q-zorder effect measured
    // relationally: documents blocked two ways — the NATURAL insert
    // order (doc_id DIV 50) and a layout CLUSTERED on the predicate
    // column (n_chars DIV 64) — with per-block min/max zone stats,
    // then three range predicates evaluated against the stats alone.
    // Natural blocks prune 0 ppm (every block's span covers every
    // predicate); the clustered layout prunes ~2/3 of blocks — the
    // measured argument for Tables.compact/zorder's clustered writes.
    // Scale shape: zone stats are one hash agg keyed on (layout,
    // block); the predicate table is 3 literal rows broadcast; the
    // match recount is one conditional agg over the same scan.
    "q145_zone_prune" -> ((s, dir) => {
      import s.implicits._
      val d = Tables.load(s, dir, "documents").select(col("doc_id"), col("n_chars"))
      val lay = d.select(lit("natural").as("layout"),
          expr("doc_id DIV 50").as("blk"), col("n_chars"))
        .unionByName(d.select(lit("clustered").as("layout"),
          expr("n_chars DIV 64").as("blk"), col("n_chars")))
        .localCheckpoint() // read twice: zone stats + match recount
      val zs = lay.groupBy("layout", "blk")
        .agg(min("n_chars").as("zmin"), max("n_chars").as("zmax"), cnt.as("n_rows"))
      val pr = Seq(("p1_ge_450", 450L, Long.MaxValue),
        ("p2_le_150", 0L, 150L), ("p3_mid_250_350", 250L, 350L))
        .toDF("pred", "lo", "hi")
      val e = zs.crossJoin(broadcast(pr))
        .withColumn("pruned",
          when(col("zmax") < col("lo") || col("zmin") > col("hi"), 1L).otherwise(0L))
      val agg = e.groupBy("layout", "pred")
        .agg(cnt.as("blocks_total"), sum("pruned").as("blocks_pruned"),
          sum(when(col("pruned") === 0, col("n_rows")).otherwise(0L)).as("rows_scanned"))
      val m = lay.crossJoin(broadcast(pr))
        .filter(col("n_chars") >= col("lo") && col("n_chars") <= col("hi"))
        .groupBy("layout", "pred").agg(cnt.as("n_match"))
      agg.join(m, Seq("layout", "pred"), "left")
        .select(col("layout"), col("pred"), col("blocks_total"),
          col("blocks_pruned"), col("rows_scanned"),
          coalesce(col("n_match"), lit(0L)).as("rows_matched"),
          expr("blocks_pruned * 1000000 DIV blocks_total").as("prune_ppm"))
        .orderBy("layout", "pred")
    }),

    // A bloom-filter pre-join measured end-to-end: build an
    // 8-bits-per-key, k=3 filter over the urgent orders' keys (bit
    // positions = md5 positions mod m, m sized FROM the build count
    // so the fill factor — and hence the ~3% theoretical FPR of
    // (1-e^(-3/8))^3 — is scale-invariant), probe every distinct
    // lineitem key through it, and report the measured false-positive
    // ppm next to the exact semi-join truth. Scale shape: the filter
    // IS a relation of occupied positions (≤ 3·|build| rows,
    // broadcast); the probe is one projection + one broadcast join +
    // one keyed count — the runtime-filter pattern Spark itself uses,
    // here with its error measured under the gate.
    "q146_bloom_join" -> ((s, dir) => {
      val bkeys = Tables.load(s, dir, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
        .select(col("o_orderkey").as("k")).distinct().localCheckpoint()
      val mm = bkeys.agg((cnt * 8).as("m"))
      def positions(df: DataFrame): DataFrame =
        df.crossJoin(broadcast(mm))
          .select(col("k"), explode(expr("array(1, 2, 3)")).as("i"), col("m"))
          .selectExpr("k",
            "CAST(conv(substr(md5(concat('b', i, ':', CAST(k AS STRING))), 1, 8), 16, 10) AS BIGINT) % m AS p")
      val pos = positions(bkeys).select("p").distinct().localCheckpoint()
      val probe = Tables.load(s, dir, "lineitem")
        .select(col("l_orderkey").as("k")).distinct().localCheckpoint()
      val pass = positions(probe).join(broadcast(pos), "p")
        .groupBy("k").agg(cnt.as("nh")).filter(col("nh") === 3)
      // round-11: n_probe / n_pass / n_true come from ONE pass over the
      // probe keys (two key-multiplicity-1 left joins — bkeys and pass
      // are both distinct on k — then one count/sum aggregate) instead
      // of three separate agg legs, and n_build/m_bits share one
      // aggregate over the checkpointed build keys (guide §2.4;
      // identical values — a left join against a distinct key set
      // counts exactly what the semi join counted).
      val probeStats = probe
        .join(pass.select(col("k"), lit(1L).as("_pass")), Seq("k"), "left")
        .join(bkeys.select(col("k"), lit(1L).as("_true")), Seq("k"), "left")
        .agg(cnt.as("n_probe"),
          coalesce(sum("_pass"), lit(0L)).as("n_pass"),
          coalesce(sum("_true"), lit(0L)).as("n_true"))
      bkeys.agg(cnt.as("n_build"), (cnt * 8).as("m_bits"))
        .crossJoin(pos.agg(cnt.as("n_bits_set")))
        .crossJoin(probeStats)
        .selectExpr("n_build", "m_bits", "n_bits_set", "n_probe", "n_pass",
          "n_true", "n_pass - n_true AS n_false_pos",
          "CASE WHEN n_probe - n_true = 0 THEN 0L " +
            "ELSE (n_pass - n_true) * 1000000 DIV (n_probe - n_true) END AS fp_ppm")
    }),

    // The equi-depth histogram a cost-based planner keeps per column
    // (the statistic q143's estimates would read), built WITHOUT a
    // global sort: values collapse to an ndv-sized (value, count)
    // relation first, the cumulative rank runs over THAT (a window
    // over ndv rows, never the fact table), and a value-group lands
    // in the bucket where its exclusive cumulative count starts — so
    // buckets hold ~n/8 rows each however skewed the raw rows are.
    // Two columns with different ndv/skew profiles share one plan via
    // a tagged union. All-integer: values are integral by fixture
    // contract (cast checked by the oracle's own cast), counts exact.
    "q147_equi_depth_hist" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
        .select(lit("l_quantity").as("col_name"), col("l_quantity").cast("long").as("v"))
      val pt = Tables.load(s, dir, "part")
        .select(lit("p_size").as("col_name"), col("p_size").cast("long").as("v"))
      val vc = li.unionByName(pt).groupBy("col_name", "v").agg(cnt.as("c"))
      // the cumulative rank used to be a window PARTITIONED by
      // col_name — keyed, but one task per COLUMN, so a high-ndv
      // column funnels its whole (value, count) relation through one
      // core. The bucketed two-level prefix sum parallelizes within
      // each column; per-column totals come from a hash agg broadcast
      // back (not an unbounded window).
      val tots = vc.groupBy("col_name").agg(sum("c").as("total"))
      graft.operators.Windows.prefixSum(vc, Seq("col_name"), "v", "c",
          "cum_ex", exclusive = true)
        .join(broadcast(tots), Seq("col_name"))
        .withColumn("bucket", expr("cum_ex * 8 DIV total"))
        .groupBy("col_name", "bucket")
        .agg(min("v").as("lo"), max("v").as("hi"),
          sum("c").as("n_rows"), cnt.as("n_distinct"))
        .orderBy("col_name", "bucket")
    })
  )

  /** DuckDB oracles (validated at sf0.01 and sf0.1 before the natives). */
  val oracle: Map[String, String] = Map(
    "q144_bfs_reach" -> """
WITH pe AS (SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
edges AS (SELECT 'p' || CAST(p AS VARCHAR) AS src, 's' || CAST(s AS VARCHAR) AS dst FROM pe
          UNION ALL
          SELECT 's' || CAST(s AS VARCHAR), 'p' || CAST(p AS VARCHAR) FROM pe),
f0 AS (SELECT DISTINCT 's' || CAST(s AS VARCHAR) AS id FROM pe WHERE s % 7 = 0),
v0 AS (SELECT id FROM f0),
f1 AS (SELECT DISTINCT e.dst AS id FROM edges e JOIN f0 ON f0.id = e.src
       WHERE e.dst NOT IN (SELECT id FROM v0)),
v1 AS (SELECT id FROM v0 UNION ALL SELECT id FROM f1),
f2 AS (SELECT DISTINCT e.dst AS id FROM edges e JOIN f1 ON f1.id = e.src
       WHERE e.dst NOT IN (SELECT id FROM v1)),
v2 AS (SELECT id FROM v1 UNION ALL SELECT id FROM f2),
f3 AS (SELECT DISTINCT e.dst AS id FROM edges e JOIN f2 ON f2.id = e.src
       WHERE e.dst NOT IN (SELECT id FROM v2)),
lv AS (SELECT CAST(0 AS BIGINT) AS level, id FROM f0
       UNION ALL SELECT 1, id FROM f1
       UNION ALL SELECT 2, id FROM f2
       UNION ALL SELECT 3, id FROM f3)
SELECT level, COUNT(*) AS n_reached,
  CAST(SUM(CASE WHEN id LIKE 'p%' THEN 1 ELSE 0 END) AS BIGINT) AS n_parts,
  CAST(SUM(CASE WHEN id LIKE 's%' THEN 1 ELSE 0 END) AS BIGINT) AS n_sups,
  MIN(id) AS first_node
FROM lv GROUP BY level ORDER BY level""",

    "q145_zone_prune" -> """
WITH lay AS (
  SELECT 'natural' AS layout, doc_id // 50 AS blk, n_chars FROM documents
  UNION ALL
  SELECT 'clustered', n_chars // 64, n_chars FROM documents),
zs AS (SELECT layout, blk, MIN(n_chars) AS zmin, MAX(n_chars) AS zmax,
              COUNT(*) AS n_rows FROM lay GROUP BY ALL),
pr AS (SELECT * FROM (VALUES ('p1_ge_450', 450, 9223372036854775807),
                             ('p2_le_150', 0, 150),
                             ('p3_mid_250_350', 250, 350)) AS t(pred, lo, hi)),
e AS (SELECT p.pred, z.layout, z.blk, z.n_rows,
        CASE WHEN z.zmax < p.lo OR z.zmin > p.hi THEN 1 ELSE 0 END AS pruned
      FROM zs z CROSS JOIN pr p),
m AS (SELECT l.layout, p.pred, COUNT(*) AS n_match
      FROM lay l CROSS JOIN pr p WHERE l.n_chars BETWEEN p.lo AND p.hi
      GROUP BY ALL)
SELECT e.layout, e.pred, COUNT(*) AS blocks_total,
  CAST(SUM(e.pruned) AS BIGINT) AS blocks_pruned,
  CAST(SUM(CASE WHEN e.pruned = 0 THEN e.n_rows ELSE 0 END) AS BIGINT) AS rows_scanned,
  CAST(COALESCE(MIN(m.n_match), 0) AS BIGINT) AS rows_matched,
  CAST(SUM(e.pruned) AS BIGINT) * 1000000 // COUNT(*) AS prune_ppm
FROM e LEFT JOIN m ON m.layout = e.layout AND m.pred = e.pred
GROUP BY e.layout, e.pred ORDER BY e.layout, e.pred""",

    "q146_bloom_join" -> """
WITH bkeys AS (SELECT DISTINCT o_orderkey AS k FROM orders WHERE o_orderpriority = '1-URGENT'),
mm AS (SELECT COUNT(*) * 8 AS m FROM bkeys),
pos AS (SELECT DISTINCT ('0x' || substr(md5('b' || CAST(h.i AS VARCHAR) || ':' || CAST(k AS VARCHAR)), 1, 8))::BIGINT % m AS p
        FROM bkeys CROSS JOIN (VALUES (1),(2),(3)) AS h(i) CROSS JOIN mm),
probe AS (SELECT DISTINCT l_orderkey AS k FROM lineitem),
pp AS (SELECT probe.k, ('0x' || substr(md5('b' || CAST(h.i AS VARCHAR) || ':' || CAST(probe.k AS VARCHAR)), 1, 8))::BIGINT % m AS p
       FROM probe CROSS JOIN (VALUES (1),(2),(3)) AS h(i) CROSS JOIN mm),
hits AS (SELECT pp.k, COUNT(*) AS nh FROM pp JOIN pos ON pos.p = pp.p GROUP BY pp.k),
pass AS (SELECT k FROM hits WHERE nh = 3),
tru  AS (SELECT DISTINCT probe.k FROM probe JOIN bkeys ON bkeys.k = probe.k),
s AS (SELECT (SELECT COUNT(*) FROM bkeys) AS n_build,
             (SELECT m FROM mm) AS m_bits,
             (SELECT COUNT(*) FROM pos) AS n_bits_set,
             (SELECT COUNT(*) FROM probe) AS n_probe,
             (SELECT COUNT(*) FROM pass) AS n_pass,
             (SELECT COUNT(*) FROM tru) AS n_true)
SELECT n_build, m_bits, n_bits_set, n_probe, n_pass, n_true,
  n_pass - n_true AS n_false_pos,
  CASE WHEN n_probe - n_true = 0 THEN 0
       ELSE (n_pass - n_true) * 1000000 // (n_probe - n_true) END AS fp_ppm
FROM s""",

    "q147_equi_depth_hist" -> """
WITH src AS (
  SELECT 'l_quantity' AS col_name, CAST(l_quantity AS BIGINT) AS v FROM lineitem
  UNION ALL
  SELECT 'p_size', CAST(p_size AS BIGINT) FROM part),
vc AS (SELECT col_name, v, COUNT(*) AS c FROM src GROUP BY ALL),
cu AS (SELECT col_name, v, c,
         SUM(c) OVER (PARTITION BY col_name ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cum_ex,
         SUM(c) OVER (PARTITION BY col_name) AS total
       FROM vc),
b AS (SELECT col_name, COALESCE(cum_ex, 0) * 8 // total AS bucket, v, c FROM cu)
SELECT col_name, CAST(bucket AS BIGINT) AS bucket, MIN(v) AS lo, MAX(v) AS hi,
  CAST(SUM(c) AS BIGINT) AS n_rows, COUNT(*) AS n_distinct
FROM b GROUP BY col_name, bucket ORDER BY col_name, bucket"""
  ).map { case (k, v) => k -> v.trim }
}
