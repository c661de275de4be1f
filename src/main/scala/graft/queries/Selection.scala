package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Selection-tuning & shift wave (q161–q165, round 6): the dials a
  * curation deployment actually turns — the LSH banding (b × r)
  * tradeoff measured as candidate recall/precision against
  * exact-Jaccard truth (q161), decimal-exact revenue-by-discount (the
  * TPC-H-flavored decision report with NO float arithmetic anywhere —
  * q162), the quality×length grid that shows whether a length filter
  * silently acts as a quality filter (q163), the temporal split drift
  * report with exact rank-picked medians (q164), and supplier revenue
  * concentration (q165).
  *
  * Same t2 gate (strict_check at sf0.01 AND sf0.1 before commit).
  * q161's truth threshold is the INTEGER form 10·∩ ≥ 7·∪ — unlike
  * q50's float compare, no division ever happens; q162 runs entirely
  * in DECIMAL (doubles cast to their exact 2-decimal values first, so
  * products and sums are exact and order-independent).
  */
object Selection {

  private def cnt = count(lit(1))

  def queries: Map[String, Queries.QueryFn] = Map(

    // The LSH banding curve: ONE 8-component minhash signature (q50's
    // md5 hex-window components), grouped three ways — 2 bands × 4
    // rows, 4 × 2, 8 × 1 — and each banding's candidate set scored
    // against exact-Jaccard ≥ 0.7 truth: recall rises and precision
    // falls as bands narrow, and this table is how (b, r) gets chosen.
    // Scale shape: signatures are one hash agg per doc; each banding's
    // candidates come from bucket self-joins keyed on (band index,
    // band value) — pair volume scales with true duplicate density;
    // truth reuses the q42 shingle-sharing kernel with the integer
    // threshold, never an all-pairs product.
    "q161_lsh_band_curve" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), expr("filter(split(lower(text), ' '), x -> x != '')").as("l"))
        .filter(size(col("l")) >= 3)
      val t = d.select(col("doc_id"), explode(expr(
          "transform(sequence(0, size(l) - 3), i -> concat(l[i], ' ', l[i+1], ' ', l[i+2]))"))
          .as("sh")).distinct()
        .localCheckpoint() // feeds signatures, cards, and the inter join
      val sigAggs = (1 to 8).map(i =>
        min(expr(s"substr(md5(sh), ${(i - 1) * 4 + 1}, 4)")).as(s"h$i"))
      val sig = t.groupBy("doc_id")
        .agg(sigAggs.head, sigAggs.tail: _*)
        .localCheckpoint() // read once per banding leg
      val bandDefs: Seq[(String, Seq[Seq[String]])] = Seq(
        ("2x4", Seq(Seq("h1", "h2", "h3", "h4"), Seq("h5", "h6", "h7", "h8"))),
        ("4x2", Seq(Seq("h1", "h2"), Seq("h3", "h4"), Seq("h5", "h6"), Seq("h7", "h8"))),
        ("8x1", (1 to 8).map(i => Seq(s"h$i"))))
      val bands = bandDefs.flatMap { case (cfg, bs) =>
        bs.zipWithIndex.map { case (cs, bi) =>
          sig.select(lit(cfg).as("cfg"), col("doc_id"),
            lit(bi + 1).as("bi"), concat(cs.map(col): _*).as("bv")) }
      }.reduce(_ unionByName _)
      val cand = bands.toDF("cfg", "i", "bi", "bv")
        .join(bands.toDF("cfg2", "j", "bi2", "bv2"),
          col("cfg") === col("cfg2") && col("bi") === col("bi2") &&
            col("bv") === col("bv2") && col("i") < col("j"))
        .select("cfg", "i", "j").distinct()
      // single consumer below (one left join scores candidates AND
      // counts them) — no checkpoint needed
      // truth kernel under the q42 hot-shingle cap (maxDf = 1000,
      // modeled identically in the oracle): a boilerplate shingle
      // shared by m docs costs m²/2 join rows in one reducer — the
      // cap bounds that blowup, and cardinalities are computed over
      // the SAME capped shingle set so the Jaccard stays consistent
      val tk = t.join(t.groupBy("sh").agg(cnt.as("df"))
          .filter(col("df") <= 1000).select("sh"), "sh")
        .localCheckpoint() // cards + the pair join
      val card = tk.groupBy("doc_id").agg(cnt.as("nt"))
      val truth = tk.select(col("doc_id").as("i"), col("sh"))
        .join(tk.select(col("doc_id").as("j"), col("sh").as("sh2")),
          col("sh") === col("sh2") && col("i") < col("j"))
        .groupBy("i", "j").agg(cnt.as("ci"))
        .join(card.toDF("i", "na"), "i").join(card.toDF("j", "nb"), "j")
        .filter(expr("10 * ci >= 7 * (na + nb - ci)"))
        .select("i", "j")
        .localCheckpoint() // counted once, joined per config
      val nt = truth.agg(cnt.as("n_true_total"))
      // ONE pass scores and counts: candidate count + true-candidate
      // count come from the same left join against the truth set
      // (previously a separate count agg and an inner-join agg over a
      // checkpointed candidate relation — two stages more)
      val scored = cand
        .join(truth.withColumn("_t", lit(1L)), Seq("i", "j"), "left")
        .groupBy("cfg").agg(cnt.as("n_candidates"),
          sum(coalesce(col("_t"), lit(0L))).as("n_true_candidates"))
      scored.crossJoin(broadcast(nt))
        .selectExpr("cfg", "n_candidates", "n_true_candidates",
          "n_true_total",
          "n_true_candidates * 1000000 DIV GREATEST(n_true_total, 1L) AS recall_ppm",
          "n_true_candidates * 1000000 DIV GREATEST(n_candidates, 1L) AS precision_ppm")
        .orderBy("cfg")
    }),

    // Revenue by discount bucket, DECIMAL-exact: prices and discounts
    // are stored as DOUBLEs holding 2-decimal values — cast each to
    // its exact DECIMAL first, then every product and sum is exact
    // integer arithmetic in disguise (order-independent, engine-
    // portable; summing the raw doubles would be partitioning-
    // dependent). One hash agg over the fact scan.
    "q162_discount_revenue" -> ((s, dir) => {
      Tables.load(s, dir, "lineitem")
        .selectExpr(
          "CAST(ROUND(l_discount * 100, 0) AS BIGINT) AS disc_pct",
          "CAST(l_extendedprice AS DECIMAL(14,2)) AS gross_d",
          "CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS net_d")
        .groupBy("disc_pct")
        .agg(cnt.as("n_items"),
          sum("gross_d").as("gross"), sum("net_d").as("net"))
        .selectExpr("disc_pct", "n_items",
          "CAST(gross AS DOUBLE) AS gross_revenue",
          "CAST(net AS DOUBLE) AS net_revenue",
          "CAST(gross - net AS DOUBLE) AS discount_given")
        .orderBy("disc_pct")
    }),

    // Temporal split drift: cut the event stream at its midpoint date
    // and compare each event type's volume and EXACT lower-median
    // value across the halves — the "did the stream shift across the
    // deployment" report. Medians are picked by rank (no arithmetic
    // on the double values, so they hash exactly); the rank windows
    // are keyed per (type, half). Scale shape: one keyed window pass
    // + two hash aggs; the midpoint is a broadcast 1-row aggregate.
    "q164_temporal_split_drift" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val ev = Tables.load(s, dir, "events")
      val mid = ev.agg(expr(
        "timestamp_micros(CAST((unix_micros(min(ts)) + unix_micros(max(ts))) DIV 2 AS BIGINT)) AS mid"))
      val tagged = ev.crossJoin(broadcast(mid))
        .withColumn("half", when(col("ts") < col("mid"), "before").otherwise("after"))
      val w = Window.partitionBy("event_type", "half")
        .orderBy(col("value"), col("event_id"))
      val med = tagged
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type", "half")))
        .filter(expr("rn = (n + 1) DIV 2"))
        .select(col("event_type"), col("half"), col("value").as("median_value"))
      val counts = tagged.groupBy("event_type", "half").agg(cnt.as("n"))
      def side(df: org.apache.spark.sql.DataFrame, h: String, out: Seq[(String, String)]) =
        df.filter(col("half") === h)
          .select(col("event_type") +: out.map { case (c, o) => col(c).as(o) }: _*)
      side(counts, "before", Seq("n" -> "n_before"))
        .join(side(counts, "after", Seq("n" -> "n_after")), "event_type")
        .join(broadcast(side(med, "before", Seq("median_value" -> "median_before"))), "event_type")
        .join(broadcast(side(med, "after", Seq("median_value" -> "median_after"))), "event_type")
        .selectExpr("event_type", "n_before", "n_after",
          "n_after * 1000000 DIV n_before AS rate_ratio_ppm",
          "median_before", "median_after",
          "CAST(CASE WHEN median_after > median_before THEN 1 " +
            "WHEN median_after < median_before THEN -1 ELSE 0 END AS BIGINT) AS value_shift")
        .orderBy("event_type")
    }),

    // Supplier revenue concentration: each supplier's decimal-exact
    // net revenue (the q162 discipline), the top-10 suppliers by
    // revenue (rank ties broken by key), and their cumulative share
    // of total revenue — the "how concentrated is the supply base"
    // report. Scale shape: one hash agg per supplier, top-10 via
    // TakeOrdered, shares against a broadcast 1-row total.
    "q165_supplier_concentration" -> ((s, dir) => {
      val rev = Tables.load(s, dir, "lineitem")
        .selectExpr("l_suppkey AS supplier",
          "CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) AS net_d")
        .groupBy("supplier").agg(sum("net_d").as("rev_d"), cnt.as("n_items"))
        .localCheckpoint() // read twice: total + top-10
      val tot = rev.agg(sum("rev_d").as("total_d"))
      rev.orderBy(desc("rev_d"), col("supplier")).limit(10)
        .crossJoin(broadcast(tot))
        .selectExpr("supplier", "n_items",
          "CAST(rev_d AS DOUBLE) AS net_revenue",
          "CAST(CAST(rev_d * 10000 AS DECIMAL(19,0)) * 1000000 DIV CAST(total_d * 10000 AS DECIMAL(19,0)) AS BIGINT) AS revenue_share_ppm")
        .orderBy(desc("net_revenue"), col("supplier"))
    }),

    // Quality × length grid: does a length cutoff silently act as a
    // quality filter? Type-token-ratio quality buckets against
    // 64-char length blocks (the q145 blocking convention), each cell
    // with its share of the length block — the 2D histogram read
    // before setting either threshold. Two hash aggs and a broadcast
    // join on the ~blocks-sized totals; nothing leaves the executor
    // until the bounded grid.
    "q163_quality_length_grid" -> ((s, dir) => {
      val t = Tables.load(s, dir, "documents")
        .select(col("n_chars"), expr("filter(split(lower(text), ' '), x -> x != '')").as("toks"))
        .filter(size(col("toks")) > 0)
        .selectExpr("n_chars DIV 64 AS len_block",
          "CAST(size(array_distinct(toks)) AS BIGINT) * 1000000 DIV size(toks) DIV 100000 AS q_bucket")
      val grid = t.groupBy("len_block", "q_bucket").agg(cnt.as("n_docs"))
      val totals = t.groupBy("len_block").agg(cnt.as("block_total"))
      grid.join(broadcast(totals), Seq("len_block"))
        .selectExpr("len_block", "q_bucket", "n_docs",
          "n_docs * 1000000 DIV block_total AS block_share_ppm")
        .orderBy("len_block", "q_bucket")
    })
  )

  /** DuckDB oracles — SUM/product-derived outputs CAST to BIGINT. */
  val oracle: Map[String, String] = Map(
    "q161_lsh_band_curve" -> """
WITH d AS (SELECT doc_id, list_filter(string_split(lower(text), ' '), x -> x <> '') l FROM documents),
s AS (SELECT doc_id, unnest(generate_series(1, len(l) - 2)) i, l FROM d WHERE len(l) >= 3),
t AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] sh FROM s),
sig AS (SELECT doc_id,
  MIN(substr(md5(sh), 1, 4)) h1, MIN(substr(md5(sh), 5, 4)) h2,
  MIN(substr(md5(sh), 9, 4)) h3, MIN(substr(md5(sh), 13, 4)) h4,
  MIN(substr(md5(sh), 17, 4)) h5, MIN(substr(md5(sh), 21, 4)) h6,
  MIN(substr(md5(sh), 25, 4)) h7, MIN(substr(md5(sh), 29, 4)) h8
  FROM t GROUP BY doc_id),
bands AS (
  SELECT '2x4' cfg, doc_id, 1 bi, h1||h2||h3||h4 bv FROM sig
  UNION ALL SELECT '2x4', doc_id, 2, h5||h6||h7||h8 FROM sig
  UNION ALL SELECT '4x2', doc_id, 1, h1||h2 FROM sig
  UNION ALL SELECT '4x2', doc_id, 2, h3||h4 FROM sig
  UNION ALL SELECT '4x2', doc_id, 3, h5||h6 FROM sig
  UNION ALL SELECT '4x2', doc_id, 4, h7||h8 FROM sig
  UNION ALL SELECT '8x1', doc_id, 1, h1 FROM sig
  UNION ALL SELECT '8x1', doc_id, 2, h2 FROM sig
  UNION ALL SELECT '8x1', doc_id, 3, h3 FROM sig
  UNION ALL SELECT '8x1', doc_id, 4, h4 FROM sig
  UNION ALL SELECT '8x1', doc_id, 5, h5 FROM sig
  UNION ALL SELECT '8x1', doc_id, 6, h6 FROM sig
  UNION ALL SELECT '8x1', doc_id, 7, h7 FROM sig
  UNION ALL SELECT '8x1', doc_id, 8, h8 FROM sig),
cand AS (SELECT DISTINCT a.cfg, a.doc_id i, b.doc_id j
         FROM bands a JOIN bands b
           ON a.cfg = b.cfg AND a.bi = b.bi AND a.bv = b.bv AND a.doc_id < b.doc_id),
tk AS (SELECT t.doc_id, t.sh FROM t
       JOIN (SELECT sh FROM t GROUP BY sh HAVING COUNT(*) <= 1000) k ON k.sh = t.sh),
card AS (SELECT doc_id, COUNT(*) nt FROM tk GROUP BY doc_id),
inter AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) ci
          FROM tk a JOIN tk b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
truth AS (SELECT x.i, x.j FROM inter x
          JOIN card ca ON ca.doc_id = x.i JOIN card cb ON cb.doc_id = x.j
          WHERE 10 * x.ci >= 7 * (ca.nt + cb.nt - x.ci)),
nt AS (SELECT COUNT(*) n_true_total FROM truth),
nc AS (SELECT cfg, COUNT(*) n_candidates FROM cand GROUP BY cfg),
nv AS (SELECT c.cfg, COUNT(*) n_true_candidates
       FROM cand c JOIN truth tr ON tr.i = c.i AND tr.j = c.j GROUP BY c.cfg)
SELECT nc.cfg, nc.n_candidates,
  CAST(COALESCE(nv.n_true_candidates, 0) AS BIGINT) n_true_candidates,
  CAST(nt.n_true_total AS BIGINT) n_true_total,
  CAST(COALESCE(nv.n_true_candidates, 0) * 1000000 // GREATEST(nt.n_true_total, 1) AS BIGINT) recall_ppm,
  CAST(COALESCE(nv.n_true_candidates, 0) * 1000000 // GREATEST(nc.n_candidates, 1) AS BIGINT) precision_ppm
FROM nc LEFT JOIN nv ON nv.cfg = nc.cfg CROSS JOIN nt
ORDER BY nc.cfg""",

    "q162_discount_revenue" -> """
WITH li AS (SELECT CAST(ROUND(l_discount * 100, 0) AS BIGINT) disc_pct,
              CAST(l_extendedprice AS DECIMAL(14,2)) gross_d,
              CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) net_d
            FROM lineitem)
SELECT disc_pct, COUNT(*) n_items,
  CAST(SUM(gross_d) AS DOUBLE) gross_revenue,
  CAST(SUM(net_d) AS DOUBLE) net_revenue,
  CAST(SUM(gross_d) - SUM(net_d) AS DOUBLE) discount_given
FROM li GROUP BY disc_pct ORDER BY disc_pct""",

    "q164_temporal_split_drift" -> """
WITH mid AS (SELECT epoch_us(MIN(ts)) mn, epoch_us(MAX(ts)) mx FROM events),
tagged AS (SELECT event_type, event_id, value,
    CASE WHEN epoch_us(ts) < (mn + mx) // 2 THEN 'before' ELSE 'after' END half
  FROM events CROSS JOIN mid),
ranked AS (SELECT event_type, half, value,
    ROW_NUMBER() OVER (PARTITION BY event_type, half ORDER BY value, event_id) rn,
    COUNT(*) OVER (PARTITION BY event_type, half) n
  FROM tagged),
med AS (SELECT event_type, half, value FROM ranked WHERE rn = (n + 1) // 2),
counts AS (SELECT event_type, half, COUNT(*) n FROM tagged GROUP BY event_type, half)
SELECT cb.event_type, cb.n AS n_before, ca.n AS n_after,
  CAST(ca.n * 1000000 // cb.n AS BIGINT) rate_ratio_ppm,
  mb.value AS median_before, ma.value AS median_after,
  CAST(CASE WHEN ma.value > mb.value THEN 1
            WHEN ma.value < mb.value THEN -1 ELSE 0 END AS BIGINT) value_shift
FROM counts cb
JOIN counts ca ON ca.event_type = cb.event_type AND cb.half = 'before' AND ca.half = 'after'
JOIN med mb ON mb.event_type = cb.event_type AND mb.half = 'before'
JOIN med ma ON ma.event_type = cb.event_type AND ma.half = 'after'
ORDER BY cb.event_type""",

    "q165_supplier_concentration" -> """
WITH rev AS (SELECT l_suppkey supplier,
    SUM(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) rev_d,
    COUNT(*) n_items
  FROM lineitem GROUP BY l_suppkey),
tot AS (SELECT SUM(rev_d) total_d FROM rev),
top AS (SELECT * FROM rev ORDER BY rev_d DESC, supplier LIMIT 10)
SELECT t.supplier, t.n_items,
  CAST(t.rev_d AS DOUBLE) net_revenue,
  CAST(CAST(t.rev_d * 10000 AS HUGEINT) * 1000000 // CAST(tot.total_d * 10000 AS HUGEINT) AS BIGINT) revenue_share_ppm
FROM top t CROSS JOIN tot
ORDER BY net_revenue DESC, t.supplier""",

    "q163_quality_length_grid" -> """
WITH d AS (SELECT n_chars, list_filter(string_split(lower(text), ' '), x -> x <> '') toks FROM documents),
t AS (SELECT n_chars // 64 len_block,
        CAST(len(list_distinct(toks)) AS BIGINT) * 1000000 // len(toks) // 100000 q_bucket
      FROM d WHERE len(toks) > 0),
grid AS (SELECT len_block, q_bucket, COUNT(*) n_docs FROM t GROUP BY len_block, q_bucket),
tot AS (SELECT len_block, COUNT(*) block_total FROM t GROUP BY len_block)
SELECT g.len_block, g.q_bucket, g.n_docs,
  CAST(g.n_docs * 1000000 // tt.block_total AS BIGINT) block_share_ppm
FROM grid g JOIN tot tt ON tt.len_block = g.len_block
ORDER BY g.len_block, g.q_bucket"""
  ).map { case (k, v) => k -> v.trim }
}
