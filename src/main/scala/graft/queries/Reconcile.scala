package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.sources.Tables

/** Reconciliation & affinity wave (q197–q204, round 7): the
  * cross-record consistency audits and co-occurrence structures no
  * earlier wave touches — the order-header vs line-detail money
  * reconciliation (q197), within-order brand affinity with lift
  * (q198), per-part supply concentration (q199), return-rate drivers
  * by brand (q200), the line-position revenue decay (q201), the
  * document metadata audit with word-shape census (q202), the
  * label-centroid confusion matrix over embeddings (q203), and the
  * first-vs-last value ladder per user (q204).
  *
  * Same t2 gate (strict_check at sf0.01 AND sf0.1 before commit).
  * Money stays exact: scale-6 integer micro-dollars for the
  * price×(1−disc)×(1+tax) product (every decimal digit of the three
  * scale-2 factors is retained, so CAST AS BIGINT drops nothing and
  * the Spark-truncates / DuckDB-rounds divergence cannot arise).
  * The affinity pair join replicates rows only WITHIN an order
  * (≤ C(13,2) pairs at this generator), never across the fact
  * table; centroid cosines are ratios of exact DECIMAL sums with
  * the only float ops (÷, √, round) applied per-row to identical
  * exact inputs in both engines; ladder comparisons compare doubles
  * but never aggregate them arithmetically.
  */
object Reconcile {

  private def cnt = count(lit(1))

  /** price × (1−discount) × (1+tax) in exact micro-dollars: the three
    * factors carry 2 decimal digits each, so scale 6 is lossless. */
  private val microExpr =
    "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2))) * 1000000 AS BIGINT)"

  /** net price × (1−discount) in exact 10⁻⁴ dollars (the q195 form). */
  private val cents4Expr =
    "CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)"

  def queries: Map[String, Queries.QueryFn] = Map(

    // Order-header vs line-detail reconciliation: does o_totalprice
    // equal the sum of its lines' gross amounts? Per (status, band):
    // how many orders sit over/under/exact/lineless and by how much.
    // One shuffle onto the order key; headers without lines survive
    // the left join as their own band.
    "q197_order_reconciliation" -> ((s, dir) => {
      val line = Tables.load(s, dir, "lineitem")
        .selectExpr("l_orderkey", s"$microExpr AS micro")
        .groupBy("l_orderkey").agg(sum("micro").as("line_micro"))
      Tables.load(s, dir, "orders")
        .selectExpr("o_orderkey", "o_orderstatus",
          "CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) * 10000 AS total_micro")
        .join(line, col("o_orderkey") === col("l_orderkey"), "left")
        .selectExpr("o_orderstatus",
          "coalesce(line_micro, 0L) - total_micro AS diff",
          """CASE WHEN line_micro IS NULL THEN 'no_lines'
                  WHEN line_micro > total_micro THEN 'over'
                  WHEN line_micro < total_micro THEN 'under'
                  ELSE 'exact' END AS band""")
        .groupBy("o_orderstatus", "band")
        .agg(cnt.as("n_orders"), sum(abs(col("diff"))).as("abs_diff_micro"),
          max(abs(col("diff"))).as("max_abs_diff_micro"))
        .orderBy("o_orderstatus", "band")
    }),

    // Within-order brand affinity: which brand PAIRS co-occur in one
    // order more than independence predicts? The pair join keys on the
    // order — fan-out is bounded by that order's distinct brands
    // (≤ 13 lines here), never by the table. Lift in ppm against the
    // per-brand order frequencies; 25 brands → ≤ 300 result rows.
    "q198_basket_affinity" -> ((s, dir) => {
      val pb = Tables.load(s, dir, "part").selectExpr("p_partkey", "p_brand")
      val ob = Tables.load(s, dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .join(broadcast(pb), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("b"))
        .distinct()
        .localCheckpoint() // both pair legs + brand counts + the universe
      val nOrders = ob.agg(countDistinct("ok").as("n_orders"))
      val nb = ob.groupBy("b").agg(cnt.as("n_b"))
      val l = ob.select(col("ok"), col("b").as("b1"))
      val r = ob.select(col("ok"), col("b").as("b2"))
      l.join(r, "ok").filter(col("b1") < col("b2"))
        .groupBy("b1", "b2").agg(cnt.as("n_pair"))
        .join(broadcast(nb.select(col("b").as("b1"), col("n_b").as("n_b1"))), "b1")
        .join(broadcast(nb.select(col("b").as("b2"), col("n_b").as("n_b2"))), "b2")
        .crossJoin(broadcast(nOrders))
        .selectExpr("b1", "b2", "n_pair", "n_b1", "n_b2",
          "n_pair * n_orders * 1000000 DIV (n_b1 * n_b2) AS lift_ppm")
        .orderBy("b1", "b2")
    }),

    // Supply concentration: per part, how many suppliers actually ship
    // it and what share the top one takes — then the census grid over
    // (n_suppliers, top-share decile). Two stacked aggs; the argmax is
    // a MAX over the already-reduced (part, supplier) relation.
    "q199_dual_sourcing" -> ((s, dir) => {
      val ps = Tables.load(s, dir, "lineitem")
        .selectExpr("l_partkey", "l_suppkey", s"$cents4Expr AS c4")
        .groupBy("l_partkey", "l_suppkey").agg(sum("c4").as("sc"))
      ps.groupBy("l_partkey")
        .agg(cnt.as("n_suppliers"), sum("sc").as("pc"), max("sc").as("mx"))
        .selectExpr("n_suppliers", "mx * 1000000 DIV pc AS top_ppm", "pc")
        .selectExpr("n_suppliers", "top_ppm DIV 100000 AS top_share_decile", "pc")
        .groupBy("n_suppliers", "top_share_decile")
        .agg(cnt.as("n_parts"), sum("pc").as("cents4"))
        .orderBy("n_suppliers", "top_share_decile")
    }),

    // Return-rate drivers: each brand's return share vs the corpus
    // rate. The brand dimension broadcasts; the only fact shuffle is
    // the 25-key aggregate; the global rate rides a broadcast 1-row
    // total. Delta is a subtraction of two non-negative ppm integers.
    "q200_returns_mix" -> ((s, dir) => {
      val pb = Tables.load(s, dir, "part").selectExpr("p_partkey", "p_brand")
      val byBrand = Tables.load(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_returnflag"))
        .join(broadcast(pb), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(cnt.as("n_lines"),
          sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"))
        .localCheckpoint() // per-brand rows + the global total
      val tot = byBrand.agg(sum("n_lines").as("g_lines"),
        sum("n_returned").as("g_returned"))
      byBrand.crossJoin(broadcast(tot))
        .selectExpr("p_brand", "n_lines", "n_returned",
          "n_returned * 1000000 DIV n_lines AS return_ppm",
          "n_returned * 1000000 DIV n_lines - g_returned * 1000000 DIV g_lines AS delta_ppm")
        .orderBy("p_brand")
    }),

    // Line-position decay: does revenue sit in the first lines of an
    // order? Per l_linenumber: volume, integer mean quantity, and the
    // position's share of total revenue. One 13-key aggregate + a
    // broadcast 1-row total. The share works on whole CENTS derived
    // from the exact scale-4 sums (DIV 100 floors a positive in both
    // engines identically) — c4 × 10⁶ would overflow BIGINT at sf≥0.1.
    "q201_line_position_decay" -> ((s, dir) => {
      val pos = Tables.load(s, dir, "lineitem")
        .selectExpr("l_linenumber", "CAST(l_quantity AS BIGINT) AS qty",
          s"$cents4Expr AS c4")
        .groupBy("l_linenumber")
        .agg(cnt.as("n_lines"), sum("qty").as("qty_sum"), sum("c4").as("c4"))
        .selectExpr("l_linenumber", "n_lines", "qty_sum", "c4 DIV 100 AS c2")
        .localCheckpoint() // per-position rows + the total leg
      val tot = pos.agg(sum("c2").as("g_c2"))
      pos.crossJoin(broadcast(tot))
        .selectExpr("l_linenumber", "n_lines", "qty_sum DIV n_lines AS mean_qty",
          "c2 * 1000000 DIV g_c2 AS rev_share_ppm")
        .orderBy("l_linenumber")
    }),

    // Document metadata audit + word-shape census: is the n_chars
    // column truthful (reconciled against length(text)), and what do
    // the documents look like per language — words per doc, chars per
    // word. Pure projection + one 8-key aggregate; ratios are integer
    // ppm/DIV.
    "q202_doc_meta_audit" -> ((s, dir) => {
      Tables.load(s, dir, "documents")
        .selectExpr("lang", "n_chars", "CAST(length(text) AS BIGINT) AS real_chars",
          "CAST(size(split(text, ' ')) AS BIGINT) AS n_words")
        .groupBy("lang")
        .agg(cnt.as("n_docs"),
          sum(when(col("n_chars") =!= col("real_chars"), 1L).otherwise(0L))
            .as("n_meta_mismatch"),
          max(abs(col("n_chars") - col("real_chars"))).as("max_meta_diff"),
          sum("n_words").as("words_total"),
          max("n_words").as("words_max"),
          sum("real_chars").as("chars_total"))
        .selectExpr("lang", "n_docs", "n_meta_mismatch", "max_meta_diff",
          "words_total", "words_max",
          "words_total DIV n_docs AS words_per_doc",
          "chars_total * 1000000 DIV words_total AS chars_per_word_ppm")
        .orderBy("lang")
    }),

    // Label-centroid confusion: cosine similarity between the summed
    // label vectors (cosine is scale-invariant, so the sum stands in
    // for the centroid with NO division). All cross-row arithmetic is
    // exact DECIMAL; the ÷ and √ at the end are per-row double ops on
    // identical exact inputs in both engines. 10 labels → 45 pairs;
    // the pair join runs over 10×64 centroid rows, never over facts.
    "q203_centroid_confusion" -> ((s, dir) => {
      val c = Tables.load(s, dir, "embeddings")
        .select(col("label"), explode(sequence(lit(1), lit(64))).as("pos"),
          col("embedding"))
        .groupBy("label", "pos")
        .agg(sum(element_at(col("embedding"), col("pos")).cast(DecimalType(18, 9)))
          .cast(DecimalType(14, 9)).as("v"))
        .localCheckpoint() // both legs of the tiny pair join
      val a = c.select(col("label").as("l1"), col("pos"), col("v").as("v1"))
      val b = c.select(col("label").as("l2"), col("pos"), col("v").as("v2"))
      a.join(b, "pos").filter(col("l1") < col("l2"))
        .groupBy("l1", "l2")
        .agg(sum(expr("v1 * v2")).as("dot"), sum(expr("v1 * v1")).as("n1"),
          sum(expr("v2 * v2")).as("n2"))
        .selectExpr("l1", "l2",
          "CAST(ROUND(CAST(dot AS DOUBLE) / SQRT(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) AS DOUBLE) AS cos6")
        .orderBy("l1", "l2")
    }),

    // First-vs-last value ladder: per (user, type) the first and last
    // value by event time (keyed row_number in both directions), then
    // per type the share of ≥2-event users whose value climbed vs
    // fell. Doubles are compared, never added.
    "q204_value_ladder" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val e = Tables.load(s, dir, "events")
        .selectExpr("user_id", "event_type", "value",
          "unix_micros(ts) AS us", "event_id")
      val wa = Window.partitionBy("user_id", "event_type")
        .orderBy(col("us"), col("event_id"))
      val wd = Window.partitionBy("user_id", "event_type")
        .orderBy(col("us").desc, col("event_id").desc)
      e.withColumn("ra", row_number().over(wa))
        .withColumn("rd", row_number().over(wd))
        .groupBy("user_id", "event_type")
        .agg(cnt.as("n"),
          max(when(col("ra") === 1, col("value"))).as("first_v"),
          max(when(col("rd") === 1, col("value"))).as("last_v"))
        .filter(col("n") >= 2)
        .groupBy("event_type")
        .agg(cnt.as("n_users"),
          sum(when(col("last_v") > col("first_v"), 1L).otherwise(0L)).as("n_up"),
          sum(when(col("last_v") < col("first_v"), 1L).otherwise(0L)).as("n_down"))
        .selectExpr("event_type", "n_users", "n_up", "n_down",
          "n_up * 1000000 DIV n_users AS up_ppm",
          "n_down * 1000000 DIV n_users AS down_ppm")
        .orderBy("event_type")
    })
  )

  /** DuckDB oracles — SUM-derived BIGINT outputs CAST; identical
    * scale-6 money, bucket, and tie rules. */
  val oracle: Map[String, String] = Map(
    "q197_order_reconciliation" -> """
WITH line AS (SELECT l_orderkey,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2))) * 1000000 AS BIGINT)) AS BIGINT) line_micro
  FROM lineitem GROUP BY l_orderkey),
o AS (SELECT o_orderstatus,
    COALESCE(l.line_micro, 0) - CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) * 10000 diff,
    CASE WHEN l.line_micro IS NULL THEN 'no_lines'
         WHEN l.line_micro > CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) * 10000 THEN 'over'
         WHEN l.line_micro < CAST(CAST(o_totalprice AS DECIMAL(14,2)) * 100 AS BIGINT) * 10000 THEN 'under'
         ELSE 'exact' END band
  FROM orders LEFT JOIN line l ON l.l_orderkey = o_orderkey)
SELECT o_orderstatus, band, COUNT(*) n_orders,
  CAST(SUM(abs(diff)) AS BIGINT) abs_diff_micro,
  CAST(MAX(abs(diff)) AS BIGINT) max_abs_diff_micro
FROM o GROUP BY o_orderstatus, band ORDER BY o_orderstatus, band""",

    "q198_basket_affinity" -> """
WITH ob AS (SELECT DISTINCT l_orderkey ok, p_brand b
    FROM lineitem JOIN part ON p_partkey = l_partkey),
n_orders AS (SELECT COUNT(DISTINCT ok) n_orders FROM ob),
nb AS (SELECT b, COUNT(*) n_b FROM ob GROUP BY b),
pairs AS (SELECT l.b b1, r.b b2, COUNT(*) n_pair
  FROM ob l JOIN ob r ON r.ok = l.ok AND l.b < r.b GROUP BY l.b, r.b)
SELECT p.b1, p.b2, p.n_pair, n1.n_b n_b1, n2.n_b n_b2,
  CAST(p.n_pair * no.n_orders * 1000000 // (n1.n_b * n2.n_b) AS BIGINT) lift_ppm
FROM pairs p JOIN nb n1 ON n1.b = p.b1 JOIN nb n2 ON n2.b = p.b2
CROSS JOIN n_orders no ORDER BY p.b1, p.b2""",

    "q199_dual_sourcing" -> """
WITH ps AS (SELECT l_partkey, l_suppkey,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) AS BIGINT) sc
  FROM lineitem GROUP BY l_partkey, l_suppkey),
per AS (SELECT l_partkey, COUNT(*) n_suppliers,
    CAST(SUM(sc) AS BIGINT) pc, CAST(MAX(sc) AS BIGINT) mx
  FROM ps GROUP BY l_partkey),
dec AS (SELECT n_suppliers, mx * 1000000 // pc // 100000 top_share_decile, pc FROM per)
SELECT n_suppliers, CAST(top_share_decile AS BIGINT) top_share_decile,
  COUNT(*) n_parts, CAST(SUM(pc) AS BIGINT) cents4
FROM dec GROUP BY n_suppliers, top_share_decile
ORDER BY n_suppliers, top_share_decile""",

    "q200_returns_mix" -> """
WITH by_brand AS (SELECT p_brand, COUNT(*) n_lines,
    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) n_returned
  FROM lineitem JOIN part ON p_partkey = l_partkey GROUP BY p_brand),
tot AS (SELECT CAST(SUM(n_lines) AS BIGINT) g_lines,
    CAST(SUM(n_returned) AS BIGINT) g_returned FROM by_brand)
SELECT p_brand, n_lines, n_returned,
  CAST(n_returned * 1000000 // n_lines AS BIGINT) return_ppm,
  CAST(n_returned * 1000000 // n_lines - g_returned * 1000000 // g_lines AS BIGINT) delta_ppm
FROM by_brand CROSS JOIN tot ORDER BY p_brand""",

    "q201_line_position_decay" -> """
WITH pos AS (SELECT l_linenumber, COUNT(*) n_lines,
    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) qty_sum,
    CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(14,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * 10000 AS BIGINT)) // 100 AS BIGINT) c2
  FROM lineitem GROUP BY l_linenumber),
tot AS (SELECT CAST(SUM(c2) AS BIGINT) g_c2 FROM pos)
SELECT l_linenumber, n_lines,
  CAST(qty_sum // n_lines AS BIGINT) mean_qty,
  CAST(c2 * 1000000 // g_c2 AS BIGINT) rev_share_ppm
FROM pos CROSS JOIN tot ORDER BY l_linenumber""",

    "q202_doc_meta_audit" -> """
WITH d AS (SELECT lang, n_chars, CAST(length(text) AS BIGINT) real_chars,
    CAST(len(string_split(text, ' ')) AS BIGINT) n_words FROM documents),
g AS (SELECT lang, COUNT(*) n_docs,
    CAST(SUM(CASE WHEN n_chars <> real_chars THEN 1 ELSE 0 END) AS BIGINT) n_meta_mismatch,
    CAST(MAX(abs(n_chars - real_chars)) AS BIGINT) max_meta_diff,
    CAST(SUM(n_words) AS BIGINT) words_total,
    CAST(MAX(n_words) AS BIGINT) words_max,
    CAST(SUM(real_chars) AS BIGINT) chars_total
  FROM d GROUP BY lang)
SELECT lang, n_docs, n_meta_mismatch, max_meta_diff, words_total, words_max,
  CAST(words_total // n_docs AS BIGINT) words_per_doc,
  CAST(chars_total * 1000000 // words_total AS BIGINT) chars_per_word_ppm
FROM g ORDER BY lang""",

    "q203_centroid_confusion" -> """
WITH c AS (SELECT label, CAST(r.i AS INT) pos,
    CAST(SUM(CAST(embedding[CAST(r.i AS INT)] AS DECIMAL(18,9))) AS DECIMAL(14,9)) v
  FROM embeddings CROSS JOIN range(1, 65) r(i) GROUP BY label, pos)
SELECT a.label l1, b.label l2,
  CAST(ROUND(CAST(SUM(a.v * b.v) AS DOUBLE)
    / SQRT(CAST(SUM(a.v * a.v) AS DOUBLE) * CAST(SUM(b.v * b.v) AS DOUBLE)), 6) AS DOUBLE) cos6
FROM c a JOIN c b ON b.pos = a.pos AND a.label < b.label
GROUP BY a.label, b.label ORDER BY l1, l2""",

    "q204_value_ladder" -> """
WITH e AS (SELECT user_id, event_type, value, epoch_us(ts) us, event_id FROM events),
r AS (SELECT user_id, event_type, value,
    ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY us, event_id) ra,
    ROW_NUMBER() OVER (PARTITION BY user_id, event_type ORDER BY us DESC, event_id DESC) rd
  FROM e),
fl AS (SELECT user_id, event_type, COUNT(*) n,
    MAX(CASE WHEN ra = 1 THEN value END) first_v,
    MAX(CASE WHEN rd = 1 THEN value END) last_v
  FROM r GROUP BY user_id, event_type),
per AS (SELECT event_type, COUNT(*) n_users,
    CAST(SUM(CASE WHEN last_v > first_v THEN 1 ELSE 0 END) AS BIGINT) n_up,
    CAST(SUM(CASE WHEN last_v < first_v THEN 1 ELSE 0 END) AS BIGINT) n_down
  FROM fl WHERE n >= 2 GROUP BY event_type)
SELECT event_type, n_users, n_up, n_down,
  CAST(n_up * 1000000 // n_users AS BIGINT) up_ppm,
  CAST(n_down * 1000000 // n_users AS BIGINT) down_ppm
FROM per ORDER BY event_type"""
  ).map { case (k, v) => k -> v.trim }
}
