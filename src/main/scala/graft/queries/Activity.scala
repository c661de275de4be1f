package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.operators.Dedup
import graft.sources.Tables

/** Activity & lifecycle analytics wave (q96–q98): rolling active
  * users, duplicate-cluster collapse keeping the BEST representative,
  * and first-touch attribution — the engagement/curation composites a
  * product pipeline runs daily.
  *
  * Same t2 gate as every other wave: DuckDB oracles in [[oracle]]
  * (q97's replays the component closure with a RECURSIVE CTE),
  * prototyped at sf0.01 before the natives; determinism per SURVEY.md
  * §5 — exact unix_micros DIV day/minute arithmetic, integer quality
  * scores, struct-argmax with doc_id tie-break.
  */
object Activity {

  private def cnt = count(lit(1))

  def queries: Map[String, Queries.QueryFn] = Map(

    // Rolling 7-day active users per day, EXACTLY, without a distinct
    // window aggregate (Spark windows cannot COUNT(DISTINCT) over a
    // frame): each distinct (user, day) contributes itself to the 7
    // trailing window days via an IN-ROW sequence explode — fan-out is
    // a flat 7x the distinct relation, shuffle-partitionable, where a
    // range self-join would be days x users quadratic-ish. dau1 rides
    // the same distinct relation. The report's day domain is the
    // OBSERVED span [min d, max d] — the explode's up-to-6 phantom
    // trailing days are clipped, and in-span days with no activity
    // still appear as zero rows (the span relation is a 1-row agg +
    // sequence explode, negligible at any scale).
    "q96_rolling_actives" -> ((s, dir) => {
      val du = Tables.load(s, dir, "events")
        .select(col("user_id"), expr("unix_micros(ts) DIV 86400000000").as("d"))
        .distinct().localCheckpoint()
      val days = du.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
        .select(explode(sequence(col("lo"), col("hi"))).as("day"))
      val r7 = du.select(col("user_id"), explode(sequence(col("d"), col("d") + 6)).as("rd"))
        .groupBy("rd").agg(countDistinct(col("user_id")).as("dau7"))
      val r1 = du.groupBy("d").agg(cnt.as("dau1"))
      days.join(r7, days("day") === r7("rd"), "left")
        .join(r1, days("day") === r1("d"), "left")
        .select(col("day"), coalesce(col("dau1"), lit(0L)).as("dau1"),
          coalesce(col("dau7"), lit(0L)).as("dau7"))
        .orderBy("day")
    }),

    // Near-dup collapse keeping the HIGHEST-QUALITY representative
    // (token count as the integer quality score, doc_id tie-break) —
    // not the min-id root q57 keeps. The per-cluster argmax is
    // min(struct(-q, doc)), and because the score is an exact integer
    // the kept quality is recovered as -nq with NO join back to the
    // quality table. Gates the composition components ∘ argmax against
    // a RECURSIVE-CTE + named-struct oracle.
    "q97_keep_best" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val toks = docs.select(col("doc_id").as("doc"),
        size(filter(split(lower(col("text")), " "), t => t =!= "")).as("q"))
      val arr = Dedup.shingleArrays(docs)
        .repartition(col("doc_id")).localCheckpoint()
      val sh = arr.select(col("doc_id"), explode(col("shs")).as("sh"))
      val edges = Dedup.jaccardAllPairs(sh, maxDf = 1000)
        .filter(col("jc") >= 0.2).select("i", "j")
      val per = Dedup.connectedComponents(edges)
        .join(toks, "doc")
        .groupBy("root").agg(cnt.as("n"), sum(col("q")).as("tq"),
          min(struct(negate(col("q")).as("nq"), col("doc").as("doc"))).as("m"))
      per.agg(cnt.as("n_clusters"),
        sum(col("n") - 1).as("n_removed"),
        sum(negate(col("m.nq"))).as("kept_toks"),
        sum(col("tq") + col("m.nq")).as("removed_toks"))
    }),

    // First-touch attribution: each purchase attributed to the user's
    // most recent PRIOR view within 24h — a conditional running max
    // (max of CASE over an unbounded-preceding row frame), one window
    // shuffle on user_id; exact micros/minute integer arithmetic. The
    // marketing-analytics composite q10's as-of join doesn't cover
    // (the anchor and the target live in the SAME ordered stream).
    "q98_attribution" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.load(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_type"), col("event_id"))
        .withColumn("last_view",
          max(when(col("event_type") === "view", col("ts"))).over(w))
        .filter(col("event_type") === "purchase")
        .select(expr("unix_micros(ts) DIV 86400000000").as("day"),
          (col("last_view").isNotNull &&
            expr("unix_micros(ts) - unix_micros(last_view)") <= 86400000000L).as("attr"),
          expr("(unix_micros(ts) - unix_micros(last_view)) DIV 60000000").as("lat"))
        .groupBy("day").agg(cnt.as("n_purchases"),
          sum(when(col("attr"), 1L).otherwise(0L)).as("attributed"),
          sum(when(col("attr"), col("lat")).otherwise(0L)).as("attr_latency_min"))
        .orderBy("day")
    })
  )

  /** DuckDB oracles (validated at sf0.01/sf0.1 before the natives). */
  val oracle: Map[String, String] = Map(
    "q96_rolling_actives" -> """
WITH du AS (SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 d FROM events),
days AS (SELECT unnest(generate_series(MIN(d), MAX(d))) AS day FROM du),
span AS (SELECT user_id, unnest(generate_series(d, d + 6)) rd FROM du),
r7 AS (SELECT rd, COUNT(DISTINCT user_id) dau7 FROM span GROUP BY rd),
r1 AS (SELECT d, COUNT(*) dau1 FROM du GROUP BY d)
SELECT days.day, COALESCE(r1.dau1, 0) AS dau1, COALESCE(r7.dau7, 0) AS dau7
FROM days LEFT JOIN r7 ON r7.rd = days.day LEFT JOIN r1 ON r1.d = days.day
ORDER BY day""",

    "q97_keep_best" -> """
WITH RECURSIVE
d AS (SELECT doc_id, string_split(lower(text),' ') l FROM documents),
toks AS (SELECT doc_id, len(list_filter(l, x -> x <> '')) q FROM d),
s AS (SELECT doc_id, unnest(generate_series(1, len(l)-2)) i, l FROM d WHERE len(l) >= 3),
sh AS (SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] sh FROM s),
shk AS (SELECT * FROM sh WHERE sh IN (SELECT sh FROM sh GROUP BY sh HAVING COUNT(*) <= 1000)),
card AS (SELECT doc_id, COUNT(*) nt FROM shk GROUP BY doc_id),
inter AS (SELECT a.doc_id i, b.doc_id j, COUNT(*) ci
          FROM shk a JOIN shk b ON a.sh = b.sh AND a.doc_id < b.doc_id
          GROUP BY a.doc_id, b.doc_id),
edge AS (SELECT i, j FROM inter x
         JOIN card ca ON ca.doc_id = x.i JOIN card cb ON cb.doc_id = x.j
         WHERE CAST(x.ci AS DOUBLE) / (ca.nt + cb.nt - x.ci) >= 0.2),
dedge AS (SELECT i, j FROM edge UNION SELECT j, i FROM edge),
reach(doc, lab) AS (
  SELECT i, i FROM dedge
  UNION
  SELECT e.j, r.lab FROM reach r JOIN dedge e ON e.i = r.doc),
comp AS (SELECT doc, MIN(lab) root FROM reach GROUP BY doc),
per AS (SELECT c.root, COUNT(*) n, SUM(t.q) tq, MIN({'nq': -t.q, 'doc': c.doc}) m
        FROM comp c JOIN toks t ON t.doc_id = c.doc GROUP BY c.root)
SELECT COUNT(*) AS n_clusters,
  CAST(SUM(n - 1) AS BIGINT) AS n_removed,
  CAST(SUM(-(m.nq)) AS BIGINT) AS kept_toks,
  CAST(SUM(tq + (m.nq)) AS BIGINT) AS removed_toks
FROM per""",

    "q98_attribution" -> """
WITH w AS (SELECT user_id, ts, event_type, event_id,
        MAX(CASE WHEN event_type = 'view' THEN ts END)
          OVER (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) last_view
      FROM events)
SELECT epoch_us(ts) // 86400000000 AS day,
  COUNT(*) AS n_purchases,
  CAST(SUM(CASE WHEN last_view IS NOT NULL
      AND epoch_us(ts) - epoch_us(last_view) <= 86400000000 THEN 1 ELSE 0 END) AS BIGINT) AS attributed,
  CAST(SUM(CASE WHEN last_view IS NOT NULL
      AND epoch_us(ts) - epoch_us(last_view) <= 86400000000
      THEN (epoch_us(ts) - epoch_us(last_view)) // 60000000 ELSE 0 END) AS BIGINT) AS attr_latency_min
FROM w WHERE event_type = 'purchase'
GROUP BY day ORDER BY day"""
  ).map { case (k, v) => k -> v.trim }
}
