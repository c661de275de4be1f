package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Windows
import graft.sources.Tables

/** Corpus-profiling & estimation-calibration wave (q151–q156, round
  * 6): the reports a curation pipeline runs to DECIDE — how much of
  * the token budget the high-quality head supplies (q151), which
  * sources bring vocabulary nothing else has (q152), how much of an
  * event stream is burst-echo noise (q153), how far the planner's
  * equi-depth histogram estimates sit from truth (q154 — the graded
  * twin of what StatsJoinPlanner consumes), whether documents repeat
  * themselves head-to-tail (q155), and how diverse each source's
  * n-gram stream is (q156).
  *
  * Same t2 gate as every wave: DuckDB oracles in [[oracle]],
  * validated with tools/strict_check.py before commit; determinism
  * per SURVEY.md §5 — every score is exact integer ppm (counts,
  * integer DIV), no float and no transcendental anywhere. Every
  * running total is the two-level bucketed prefix sum
  * ([[Windows.prefixSum]]) — no partition-less window in the wave.
  */
object Profiles {

  private def cnt = count(lit(1))

  private val toks = "filter(split(lower(text), ' '), x -> x != '')"

  def queries: Map[String, Queries.QueryFn] = Map(

    // Token-budget curve: rank documents by type-token ratio (a cheap
    // integer quality proxy) and report, at each decile of the doc
    // count, the quality threshold and the cumulative share of the
    // char budget the head supplies — the "how much do we keep if we
    // cut at quality q" curve every mixing decision starts from.
    // Scale shape: docs collapse to an ndv(ttr)-sized relation FIRST;
    // both running totals are bucketed prefix sums over that
    // relation; knots are a 10-row broadcast; the knot argmin is the
    // min-struct pattern (cum_docs strictly increases, so it is
    // total).
    "q151_token_budget_curve" -> ((s, dir) => {
      val t = Tables.load(s, dir, "documents")
        .select(col("n_chars"), expr(toks).as("toks"))
        .filter(size(col("toks")) > 0)
        .select(col("n_chars"), expr(
          "CAST(size(array_distinct(toks)) AS BIGINT) * 1000000 DIV size(toks)")
          .as("ttr"))
      val byTtr = t.groupBy("ttr")
        .agg(cnt.as("n_docs"), sum("n_chars").as("chars"))
        .withColumn("neg", -col("ttr"))
        .localCheckpoint() // feeds two prefix sums + totals
      // round-11: both running totals in ONE prefix-sum pass
      val p = Windows.prefixSumN(byTtr, Nil, "neg",
        Seq("n_docs" -> "cum_docs", "chars" -> "cum_chars"))
      val tot = byTtr.agg(sum("n_docs").as("n_total"),
        sum("chars").as("chars_total"))
      val knots = s.range(1, 11).toDF("decile")
      p.crossJoin(broadcast(tot))
        .join(broadcast(knots), col("cum_docs") * 10 >= col("decile") * col("n_total"))
        .groupBy("decile")
        .agg(min(struct(col("cum_docs"), col("ttr"), col("cum_chars"),
          col("chars_total"))).as("w"))
        .selectExpr("decile", "w.ttr AS ttr_ppm_at_knot",
          "w.cum_docs AS cum_docs",
          "w.cum_chars * 1000000 DIV w.chars_total AS cum_chars_ppm")
        .orderBy("decile")
    }),

    // Vocabulary exclusivity: which sources contribute tokens NO other
    // source has — the "does dropping this source lose coverage"
    // question. Scale shape: (source, token) pairs dedup in one hash
    // agg; token source-cardinality is a second agg keyed on token;
    // the exclusivity rollup joins on token — no pair join, no
    // cross-source matrix.
    "q152_vocab_exclusivity" -> ((s, dir) => {
      val pairs = Tables.load(s, dir, "documents")
        .select(col("source"), explode(expr(toks)).as("tok"))
        .distinct()
        .localCheckpoint() // read twice: cardinality + rollup
      val card = pairs.groupBy("tok").agg(cnt.as("ns"))
      val out = pairs.join(card, "tok")
        .groupBy("source")
        .agg(cnt.as("n_vocab"),
          sum(when(col("ns") === 1, 1L).otherwise(0L)).as("n_exclusive"))
        .withColumn("exclusive_ppm", expr("n_exclusive * 1000000 DIV n_vocab"))
      out.select("source", "n_vocab", "n_exclusive", "exclusive_ppm")
        .orderBy("source")
    }),

    // Burst-echo census: an event is an ECHO when the same user fired
    // the same event type within 10 s before it — the
    // redelivery/double-click noise an ingest dedup would drop
    // (dropDuplicatesWithinWatermark's batch twin, reported instead
    // of filtered). Scale shape: ONE keyed window per (user, type) —
    // state never leaves the key's executor; rollup is a hash agg on
    // type.
    "q153_event_burst_echo" -> ((s, dir) => {
      val w = Window.partitionBy("user_id", "event_type")
        .orderBy(col("ts"), col("event_id"))
      Tables.load(s, dir, "events")
        .withColumn("prev", lag(col("ts"), 1).over(w))
        .withColumn("echo", when(col("prev").isNotNull &&
          unix_millis(col("ts")) - unix_millis(col("prev")) <= 10000L, 1L)
          .otherwise(0L))
        .groupBy("event_type")
        .agg(cnt.as("n_events"), sum("echo").as("n_echoes"),
          countDistinct(when(col("echo") === 1, col("user_id"))).as("n_echo_users"))
        .withColumn("echo_ppm", expr("n_echoes * 1000000 DIV n_events"))
        .select("event_type", "n_events", "n_echoes", "n_echo_users", "echo_ppm")
        .orderBy("event_type")
    }),

    // Histogram-estimate calibration: build the exact 8-bucket
    // equi-depth histogram of l_quantity (the q147 kernel), probe
    // each bucket's midpoint with a `v <= probe` estimate by uniform
    // interpolation INSIDE the bucket — exactly the arithmetic
    // StatsJoinPlanner's range selectivity runs — and report the
    // error against the true count. The planner's statistics, graded
    // for accuracy, not just existence. Scale shape: the fact table
    // collapses to the ndv-sized value relation once (checkpointed,
    // read three ways); both cumulatives are bucketed prefix sums;
    // the probe recount joins the 8-row probe relation broadcast onto
    // the value relation — never the fact table.
    "q154_hist_selectivity" -> ((s, dir) => {
      val vc = Tables.load(s, dir, "lineitem")
        .groupBy(col("l_quantity").cast("long").as("v")).agg(cnt.as("c"))
        .localCheckpoint()
      val pref = Windows.prefixSum(vc, Nil, "v", "c", "cum_ex", exclusive = true)
      val tot = vc.agg(sum("c").as("total"))
      val buckets = pref.crossJoin(broadcast(tot))
        .withColumn("bucket", expr("cum_ex * 8 DIV total"))
        .groupBy("bucket")
        .agg(min("v").as("lo"), max("v").as("hi"), sum("c").as("n_rows"))
      // round-11: `buckets` is 8 rows BY CONSTRUCTION (cum_ex*8 DIV
      // total ∈ 0..7 at any scale), so its exclusive prefix is a
      // broadcast lower-triangle join — the full two-level prefix-sum
      // machinery (range agg + window exchange + offsets) costs ~6
      // stages for eight rows (guide §1.2; identical values)
      val bcum = buckets
        .join(broadcast(buckets.select(col("bucket").as("_b2"),
          col("n_rows").as("_nr2"))), col("_b2") < col("bucket"), "left")
        .groupBy("bucket", "lo", "hi", "n_rows")
        .agg(coalesce(sum("_nr2"), lit(0L)).as("cumb"))
        .withColumn("probe", expr("(lo + hi) DIV 2"))
      val actual = vc.crossJoin(broadcast(bcum.select("bucket", "probe")))
        .filter(col("v") <= col("probe"))
        .groupBy("bucket").agg(sum("c").as("actual_le"))
      bcum.join(broadcast(actual), Seq("bucket"))
        .withColumn("est_le",
          expr("cumb + n_rows * (probe - lo + 1) DIV (hi - lo + 1)"))
        .selectExpr("bucket", "lo", "hi", "probe", "n_rows", "est_le",
          "actual_le",
          "ABS(est_le - actual_le) * 1000000 DIV GREATEST(actual_le, 1L) AS err_ppm")
        .orderBy("bucket")
    }),

    // Head/tail self-overlap: the Jaccard between a document's first
    // and second half token sets — high overlap means the document
    // repeats itself (template/boilerplate signal; the intra-doc
    // cousin of q116's repetition score, but structural). Pure
    // array-function projection per doc (slice/distinct/concat — no
    // explode, no join), then one rollup per source.
    "q155_head_tail_overlap" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("source"), expr(toks).as("toks"))
        .filter(size(col("toks")) >= 2)
        .selectExpr("source",
          "slice(toks, 1, size(toks) DIV 2) AS h",
          "slice(toks, size(toks) DIV 2 + 1, size(toks) - size(toks) DIV 2) AS t2")
        .selectExpr("source",
          "CAST(size(array_distinct(h)) AS BIGINT) AS nh",
          "CAST(size(array_distinct(t2)) AS BIGINT) AS ntl",
          "CAST(size(array_distinct(concat(h, t2))) AS BIGINT) AS un")
        .withColumn("jacc", expr("(nh + ntl - un) * 1000000 DIV un"))
      d.groupBy("source")
        .agg(cnt.as("n_docs"), sum("jacc").as("sj"),
          sum(when(col("jacc") >= 500000, 1L).otherwise(0L)).as("n_high_overlap"))
        .withColumn("mean_jacc_ppm", expr("sj DIV n_docs"))
        .select("source", "n_docs", "mean_jacc_ppm", "n_high_overlap")
        .orderBy("source")
    }),

    // 3-gram diversity: distinct grams over total grams per source —
    // the integer-only compressibility proxy (a boilerplate-heavy
    // source repeats grams and scores low) that needs no entropy, no
    // ln, no sketch. Scale shape: gram totals are a pure projection
    // agg; the distinct census is explode → one dedup hash agg keyed
    // (source, gram) → count; the final join is ~#sources rows.
    "q156_gram_diversity" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("source"), expr(toks).as("toks"))
        .filter(size(col("toks")) >= 3)
        .select(col("source"), expr(
          "transform(sequence(0, size(toks) - 3), i -> concat(toks[i], ' ', toks[i+1], ' ', toks[i+2]))")
          .as("grams"))
        .localCheckpoint() // read twice: totals + distinct census
      val totals = d.groupBy("source")
        .agg(cnt.as("n_docs"), sum(size(col("grams"))).as("total_grams"))
      val distincts = d.select(col("source"), explode(col("grams")).as("g"))
        .distinct()
        .groupBy("source").agg(cnt.as("distinct_grams"))
      totals.join(distincts, Seq("source"))
        .withColumn("diversity_ppm", expr("distinct_grams * 1000000 DIV total_grams"))
        .select("source", "n_docs", "total_grams", "distinct_grams", "diversity_ppm")
        .orderBy("source")
    })
  )

  /** DuckDB oracles — every SUM/product-derived output column CAST to
    * BIGINT (the q148/q150 lesson: DuckDB widens to HUGEINT and the
    * strict hasher sees a different string form). */
  val oracle: Map[String, String] = Map(
    "q151_token_budget_curve" -> """
WITH d AS (SELECT n_chars, list_filter(string_split(lower(text), ' '), x -> x <> '') toks FROM documents),
t AS (SELECT n_chars,
        CAST(len(list_distinct(toks)) AS BIGINT) * 1000000 // len(toks) AS ttr
      FROM d WHERE len(toks) > 0),
s AS (SELECT ttr, COUNT(*) n_docs, SUM(n_chars) chars FROM t GROUP BY ttr),
p AS (SELECT ttr,
        SUM(n_docs) OVER (ORDER BY ttr DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum_docs,
        SUM(chars) OVER (ORDER BY ttr DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) cum_chars
      FROM s),
tot AS (SELECT COUNT(*) n_total, SUM(n_chars) chars_total FROM t),
k AS (SELECT CAST(range AS BIGINT) decile FROM range(1, 11))
SELECT k.decile,
  CAST(MIN_BY(p.ttr, p.cum_docs) AS BIGINT) AS ttr_ppm_at_knot,
  CAST(MIN(p.cum_docs) AS BIGINT) AS cum_docs,
  CAST(MIN_BY(p.cum_chars, p.cum_docs) * 1000000 // MAX(tot.chars_total) AS BIGINT) AS cum_chars_ppm
FROM p CROSS JOIN tot JOIN k ON p.cum_docs * 10 >= k.decile * tot.n_total
GROUP BY k.decile ORDER BY k.decile""",

    "q152_vocab_exclusivity" -> """
WITH pairs AS (SELECT DISTINCT source, unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) tok
               FROM documents),
card AS (SELECT tok, COUNT(*) ns FROM pairs GROUP BY tok)
SELECT p.source, COUNT(*) n_vocab,
  CAST(SUM(CASE WHEN c.ns = 1 THEN 1 ELSE 0 END) AS BIGINT) n_exclusive,
  CAST(SUM(CASE WHEN c.ns = 1 THEN 1 ELSE 0 END) * 1000000 // COUNT(*) AS BIGINT) exclusive_ppm
FROM pairs p JOIN card c ON c.tok = p.tok
GROUP BY p.source ORDER BY p.source""",

    "q153_event_burst_echo" -> """
WITH e AS (SELECT event_type, user_id,
        CASE WHEN LAG(ts) OVER w IS NOT NULL
              AND epoch_ms(ts) - epoch_ms(LAG(ts) OVER w) <= 10000
             THEN 1 ELSE 0 END AS echo
      FROM events
      WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id))
SELECT event_type, COUNT(*) n_events,
  CAST(SUM(echo) AS BIGINT) n_echoes,
  CAST(COUNT(DISTINCT CASE WHEN echo = 1 THEN user_id END) AS BIGINT) n_echo_users,
  CAST(SUM(echo) * 1000000 // COUNT(*) AS BIGINT) echo_ppm
FROM e GROUP BY event_type ORDER BY event_type""",

    "q154_hist_selectivity" -> """
WITH vc AS (SELECT CAST(l_quantity AS BIGINT) v, COUNT(*) c FROM lineitem GROUP BY 1),
pref AS (SELECT v, c,
           COALESCE(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum_ex
         FROM vc),
tot AS (SELECT SUM(c) total FROM vc),
b AS (SELECT CAST(cum_ex * 8 // total AS BIGINT) AS bucket,
        MIN(v) lo, MAX(v) hi, SUM(c) n_rows
      FROM pref CROSS JOIN tot GROUP BY 1),
bc AS (SELECT bucket, lo, hi, n_rows,
         COALESCE(SUM(n_rows) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cumb,
         (lo + hi) // 2 AS probe
       FROM b),
act AS (SELECT bc.bucket, SUM(vc.c) actual_le
        FROM vc JOIN bc ON vc.v <= bc.probe GROUP BY bc.bucket)
SELECT bc.bucket, bc.lo, bc.hi, bc.probe,
  CAST(bc.n_rows AS BIGINT) n_rows,
  CAST(bc.cumb + bc.n_rows * (bc.probe - bc.lo + 1) // (bc.hi - bc.lo + 1) AS BIGINT) est_le,
  CAST(act.actual_le AS BIGINT) actual_le,
  CAST(ABS(bc.cumb + bc.n_rows * (bc.probe - bc.lo + 1) // (bc.hi - bc.lo + 1) - act.actual_le) * 1000000
       // GREATEST(act.actual_le, 1) AS BIGINT) err_ppm
FROM bc JOIN act ON act.bucket = bc.bucket ORDER BY bc.bucket""",

    "q155_head_tail_overlap" -> """
WITH d AS (SELECT source, list_filter(string_split(lower(text), ' '), x -> x <> '') toks FROM documents),
h AS (SELECT source,
        toks[1 : len(toks) // 2] h,
        toks[len(toks) // 2 + 1 : len(toks)] t2
      FROM d WHERE len(toks) >= 2),
j AS (SELECT source,
        CAST(len(list_distinct(h)) AS BIGINT) nh,
        CAST(len(list_distinct(t2)) AS BIGINT) ntl,
        CAST(len(list_distinct(list_concat(h, t2))) AS BIGINT) un
      FROM h),
x AS (SELECT source, (nh + ntl - un) * 1000000 // un AS jacc FROM j)
SELECT source, COUNT(*) n_docs,
  CAST(SUM(jacc) // COUNT(*) AS BIGINT) mean_jacc_ppm,
  CAST(SUM(CASE WHEN jacc >= 500000 THEN 1 ELSE 0 END) AS BIGINT) n_high_overlap
FROM x GROUP BY source ORDER BY source""",

    "q156_gram_diversity" -> """
WITH d AS (SELECT source, list_filter(string_split(lower(text), ' '), x -> x <> '') l FROM documents),
g AS (SELECT source, l FROM d WHERE len(l) >= 3),
tt AS (SELECT source, COUNT(*) n_docs, SUM(len(l) - 2) total_grams FROM g GROUP BY source),
s AS (SELECT source, unnest(generate_series(1, len(l) - 2)) i, l FROM g),
dg AS (SELECT DISTINCT source, l[i] || ' ' || l[i+1] || ' ' || l[i+2] gram FROM s),
dc AS (SELECT source, COUNT(*) distinct_grams FROM dg GROUP BY source)
SELECT tt.source, tt.n_docs,
  CAST(tt.total_grams AS BIGINT) total_grams,
  CAST(dc.distinct_grams AS BIGINT) distinct_grams,
  CAST(dc.distinct_grams * 1000000 // tt.total_grams AS BIGINT) diversity_ppm
FROM tt JOIN dc ON dc.source = tt.source ORDER BY tt.source"""
  ).map { case (k, v) => k -> v.trim }
}
