package graft.queries

import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Selection-tuning wave (q161–q163, round 6): the dials a curation
  * deployment actually turns — the LSH banding (b × r) tradeoff
  * measured as candidate recall/precision against exact-Jaccard truth
  * (q161), decimal-exact revenue-by-discount (the TPC-H-flavored
  * decision report with NO float arithmetic anywhere — q162), and the
  * quality×length grid that shows whether a length filter silently
  * acts as a quality filter (q163).
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
        .localCheckpoint() // counted and truth-joined
      val card = t.groupBy("doc_id").agg(cnt.as("nt"))
      val truth = t.toDF("i", "sh").join(t.toDF("j", "sh2"),
          col("sh") === col("sh2") && col("i") < col("j"))
        .groupBy("i", "j").agg(cnt.as("ci"))
        .join(card.toDF("i", "na"), "i").join(card.toDF("j", "nb"), "j")
        .filter(expr("10 * ci >= 7 * (na + nb - ci)"))
        .select("i", "j")
        .localCheckpoint() // counted once, joined per config
      val nt = truth.agg(cnt.as("n_true_total"))
      val nc = cand.groupBy("cfg").agg(cnt.as("n_candidates"))
      val nv = cand.join(truth, Seq("i", "j"))
        .groupBy("cfg").agg(cnt.as("n_true_candidates"))
      nc.join(nv, Seq("cfg"), "left").crossJoin(broadcast(nt))
        .selectExpr("cfg", "n_candidates",
          "coalesce(n_true_candidates, 0L) AS n_true_candidates",
          "n_true_total",
          "coalesce(n_true_candidates, 0L) * 1000000 DIV GREATEST(n_true_total, 1L) AS recall_ppm",
          "coalesce(n_true_candidates, 0L) * 1000000 DIV GREATEST(n_candidates, 1L) AS precision_ppm")
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
card AS (SELECT doc_id, COUNT(*) nt FROM t GROUP BY doc_id),
inter AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) ci
          FROM t a JOIN t b ON a.sh = b.sh AND a.doc_id < b.doc_id
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
