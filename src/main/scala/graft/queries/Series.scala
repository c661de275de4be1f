package graft.queries

import org.apache.spark.sql.functions._
import graft.operators.TimeSeries
import graft.sources.Tables

/** Time-series wave (q70): dense/regularized series operators over the
  * events stream — the batch form of the gap-handling every streaming
  * dashboard needs. Same t2 gate as every other wave. */
object Series {

  private def cnt = count(lit(1))

  def queries: Map[String, Queries.QueryFn] = Map(

    // Gap-fill + forward-fill: hourly event counts per user densified
    // over each user's [first, last] hour (TimeSeries.gapFill), gaps
    // at 0 and the last active hour's count carried forward. Counts
    // are integers, so the fill is exactly reproducible.
    "q70_gap_fill" -> ((s, dir) => {
      val hourly = Tables.load(s, dir, "events")
        .filter(col("user_id") <= 3)
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("h"))
        .agg(cnt.as("n"))
      TimeSeries.gapFill(hourly, "user_id", "h", "n")
        .orderBy("user_id", "h")
        .limit(200)
    })
  )

  /** DuckDB oracle (validated at sf0.01/sf0.1 before the native). */
  val oracle: Map[String, String] = Map(
    "q70_gap_fill" -> """
WITH e AS (SELECT user_id, date_trunc('hour', ts) h FROM events WHERE user_id <= 3),
hourly AS (SELECT user_id, h, COUNT(*) n FROM e GROUP BY 1, 2),
b AS (SELECT user_id, min(h) h0, max(h) h1 FROM hourly GROUP BY 1),
grid AS (SELECT user_id, unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) h FROM b),
f AS (SELECT g.user_id, g.h, COALESCE(n, 0) n
      FROM grid g LEFT JOIN hourly ON hourly.user_id = g.user_id AND hourly.h = g.h)
SELECT user_id, h, n,
  COALESCE(LAST_VALUE(CASE WHEN n > 0 THEN n END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY h), 0) carried
FROM f ORDER BY user_id, h LIMIT 200"""
  ).map { case (k, v) => k -> v.trim }
}
