package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.functions.Text
import graft.operators.{Dedup, TextAnalysis}
import graft.sources.Tables

/** Training-data curation wave 2 (q115–q120, round 4): Gopher-style
  * quality-rule pass rates, within-document repetition, cross-document
  * duplicated-span mass (the exact-substring dedup accounting), robust
  * per-user outlier scoring over the event stream, stopword scrubbing,
  * and cumulative-user growth.
  *
  * Same t2 gate as every wave: DuckDB oracles in [[oracle]],
  * prototyped at sf0.01 before the natives; determinism per SURVEY.md
  * §5 — integer/ppm arithmetic wherever possible, explicit DECIMAL
  * casts with widths chosen so no engine hits its precision cap (a
  * capped multiply silently changes scale and the hash), ROUND before
  * any float comparison, total-order ORDER BY before every LIMIT.
  */
object Training {

  private def cnt = count(lit(1))

  def queries: Map[String, Queries.QueryFn] = Map(

    // Gopher-style quality-rule census: per-doc integer rules — word
    // count in [30,80], mean word length in [4.4,4.8] (held in exact
    // integers as 44*nw <= 10*sumlen <= 48*nw), >= 3 stopword hits,
    // modal token <= 10% of the doc — rolled up to per-source pass
    // rates. The rule thresholds are data-set parameters; the OPERATOR
    // is the one-pass profile ([[TextAnalysis.docTokenProfile]]: one
    // tokenize + two stacked hash aggs, integer-only). This is the
    // filter battery a curation run scores before choosing cutoffs.
    "q115_gopher_rules" -> ((s, dir) => {
      val pd = TextAnalysis.docTokenProfile(
        Tables.load(s, dir, "documents"), Seq("the", "a"), "source")
      pd.select(col("source"),
          when(col("nw").between(30, 80), 1L).otherwise(0L).as("r_len"),
          when(col("sumlen") * 10 >= col("nw") * 44 &&
            col("sumlen") * 10 <= col("nw") * 48, 1L).otherwise(0L).as("r_mwl"),
          when(col("nstop") >= 3, 1L).otherwise(0L).as("r_stop"),
          when(col("maxtf") * 10 <= col("nw"), 1L).otherwise(0L).as("r_rep"))
        .groupBy("source")
        .agg(cnt.as("n_docs"),
          sum("r_len").as("pass_len"), sum("r_mwl").as("pass_mwl"),
          sum("r_stop").as("pass_stop"), sum("r_rep").as("pass_rep"),
          sum(col("r_len") * col("r_mwl") * col("r_stop") * col("r_rep")).as("pass_all"))
        .orderBy("source")
    }),

    // Within-document bigram repetition (the Rae et al. duplicate
    // n-gram fraction, the intra-doc counterpart of q42's cross-doc
    // Jaccard): per doc, the share of bigram OCCURRENCES whose bigram
    // appears more than once in that doc, rolled up per source in
    // exact integer ppm. Shape: one bigram explode + two stacked hash
    // aggs keyed on doc — no join, no pair blowup, linear in tokens.
    "q116_intradoc_repeat" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          filter(split(lower(col("text")), " "), t => t =!= "").as("t"))
        .filter(size(col("t")) >= 2)
      d.select(col("doc_id"), col("source"),
          explode(expr("transform(sequence(0, size(t) - 2), i -> concat(t[i], ' ', t[i+1]))")).as("g"))
        .groupBy("doc_id", "source", "g").agg(cnt.as("c"))
        .groupBy("doc_id", "source")
        .agg(sum("c").as("tot"),
          sum(when(col("c") > 1, col("c")).otherwise(0L)).as("dup"))
        .groupBy("source")
        .agg(cnt.as("n_docs"), sum("tot").as("total_bigrams"),
          sum("dup").as("dup_bigrams"),
          expr("sum(dup) * 1000000 DIV sum(tot)").as("dup_ppm"))
        .orderBy("source")
    }),

    // Cross-document duplicated-span mass — the exact-substring dedup
    // ACCOUNTING (how much of the corpus sits under an 8-gram that
    // also occurs in another document): docs affected, covered token
    // positions, total tokens, covered ppm. The kernel is
    // [[Dedup.dupSpanCoverage]] — ONE gram hash-aggregate (count
    // distinct doc >= 2), no pair join, coverage via an n-bounded
    // explode + distinct. The number that tells a run what
    // suffix-array dedup would delete before anyone builds one.
    "q117_span_dedup" -> ((s, dir) => {
      val docs = Tables.load(s, dir, "documents")
      val cov = Dedup.dupSpanCoverage(docs, n = 8)
      val tot = docs.select(
        size(filter(split(lower(col("text")), " "), t => t =!= "")).as("nt"))
        .agg(sum("nt").as("total_tokens"))
      cov.agg(cnt.as("docs_affected"), sum("covered").as("covered_tokens"))
        .crossJoin(broadcast(tot))
        .select(col("docs_affected"), col("covered_tokens"), col("total_tokens"),
          expr("covered_tokens * 1000000 DIV total_tokens").as("covered_ppm"))
    }),

    // Per-user outlier events: population z² for every event against
    // its user's own distribution (users with >= 30 events), top 10.
    // All moments are EXACT decimals with hand-pinned widths — each
    // product/difference is cast to a type BOTH engines represent
    // without hitting the 38-digit cap (a capped intermediate silently
    // rescales and flips the hash): z² = (n·v − Σv)² / (n·Σv² − (Σv)²),
    // one double division at the end, ROUND 6. The per-user moment
    // table is ~users rows and broadcasts back onto the event scan.
    "q118_user_anomaly" -> ((s, dir) => {
      val e = Tables.load(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("value"),
          col("value").cast(DecimalType(18, 6)).as("v"),
          expr("CAST(ROUND(value * value, 10) AS DECIMAL(28,10))").as("v2"))
      val u = e.groupBy("user_id")
        .agg(cnt.as("n"), sum("v").as("sv"),
          expr("CAST(SUM(v2) AS DECIMAL(20,10))").as("sq"))
        .filter(col("n") >= 30)
        .select(col("user_id"), expr("CAST(n AS DECIMAL(8,0))").as("n"),
          col("sv"), col("sq"))
      e.join(broadcast(u), "user_id")
        // DECIMAL(19,6) before any square: width 19 forces the
        // 128-bit multiply path on both engines (DuckDB executes a
        // width-18 square in int64 and overflows at |unscaled| > 3e9)
        .withColumn("dlt", expr("CAST(n * v - sv AS DECIMAL(19,6))"))
        .withColumn("num", expr("dlt * dlt"))
        .withColumn("den", expr(
          "CAST(n * sq AS DECIMAL(24,12)) - " +
            "CAST(CAST(sv AS DECIMAL(19,6)) * CAST(sv AS DECIMAL(19,6)) AS DECIMAL(24,12))"))
        .filter(col("den") > 0)
        .select(col("event_id"), col("user_id"), col("value"),
          round(col("num").cast("double") / col("den").cast("double"), 6).as("z2"))
        .orderBy(desc("z2"), col("event_id")).limit(10)
    }),

    // Stopword scrub accounting: run [[Text.scrub]] (pure projection —
    // the shape of every redaction pass at 100 TB) and report per
    // source what it removed: token and character mass, removed ppm.
    // Character accounting is over the single-space re-join on BOTH
    // sides so multi-space raggedness in the raw text cancels out.
    "q119_stopword_scrub" -> ((s, dir) => {
      val stop = Seq("the", "a")
      Tables.load(s, dir, "documents")
        .select(col("source"),
          filter(split(lower(col("text")), " "), t => t =!= "").as("l"),
          Text.scrub(col("text"), stop).as("kept_text"))
        .select(col("source"), size(col("l")).as("nt"),
          (size(col("l")) - size(filter(col("l"),
            t => !t.isInCollection(stop)))).as("removed"),
          (length(array_join(col("l"), " ")) - length(col("kept_text"))).as("chars_removed"))
        .groupBy("source")
        .agg(cnt.as("n_docs"), sum("nt").as("n_toks"),
          sum("removed").as("toks_removed"),
          sum("chars_removed").as("chars_removed"),
          expr("sum(removed) * 1000000 DIV sum(nt)").as("removed_ppm"))
        .orderBy("source")
    }),

    // Perplexity-filter scoring: every document scored under the
    // corpus's own Laplace-smoothed bigram LM (q88 trains the LM; this
    // is the filter that USES one) — avg negative log-prob per doc,
    // mean/min/max per source. Low = templated, high = atypical; the
    // classic model-based quality signal, here self-trained so it
    // stays oracle-checkable. Determinism is the q109/q111 ln
    // discipline: the ONE transcendental is computed per BIGRAM TYPE
    // from exact integer counts (c, n_follow, V), ROUND(..,9)'d into
    // DECIMAL(18,9) before any per-doc math; per-doc sums are exact
    // decimal, ONE double division per doc, ROUND 6. Train corpus =
    // score corpus, so every scored bigram exists in the LM (no
    // unseen-mass branch). Shape: the bigram relation is checkpointed
    // once and feeds both the LM counts and the scoring join; the LM
    // cost table joins back keyed on the bigram — no pair blowup.
    "q122_perplexity" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("source"),
          filter(split(lower(col("text")), " "), t => t =!= "").as("l"))
      val nv = d.select(explode(col("l")).as("tok"))
        .agg(countDistinct(col("tok")).as("nv"))
      val bg = d.withColumn("n", size(col("l"))).filter(col("n") >= 2)
        .select(col("doc_id"), col("source"), explode(expr(
          "transform(sequence(1, n - 1), i -> named_struct('tok', element_at(l, i), 'nxt', element_at(l, i + 1)))")).as("p"))
        .select(col("doc_id"), col("source"), col("p.tok").as("tok"), col("p.nxt").as("nxt"))
        .localCheckpoint() // feeds the LM counts AND the scoring join
      val c = bg.groupBy("tok", "nxt").agg(cnt.as("c"))
      val nf = c.groupBy("tok").agg(sum(col("c")).as("nf"))
      val cost = c.join(nf, "tok").crossJoin(broadcast(nv))
        .select(col("tok"), col("nxt"),
          expr("CAST(ROUND(ln(CAST(nf + nv AS DOUBLE) / (c + 1)), 9) AS DECIMAL(18,9))").as("w"))
      bg.join(cost, Seq("tok", "nxt"))
        .groupBy("doc_id", "source")
        .agg(expr("CAST(ROUND(CAST(SUM(w) AS DOUBLE) / COUNT(1), 6) AS DECIMAL(18,6))").as("nll"))
        .groupBy("source")
        .agg(cnt.as("n_docs"),
          round(sum(col("nll")).cast("double") / cnt, 6).as("mean_nll"),
          min(col("nll")).cast("double").as("min_nll"),
          max(col("nll")).cast("double").as("max_nll"))
        .orderBy("source")
    }),

    // Cross-split leakage audit: after q66's content-addressed
    // train/val/test split, how many held-out docs share a 5-gram
    // shingle with ANY training doc? The q67 contamination check
    // turned inward on the split itself — the audit every eval suite
    // needs before trusting its numbers. Shape: per-doc-distinct
    // shingles (in-row array_distinct), the train shingle set reduced
    // by a distinct, held-out shingles semi-joined against it keyed on
    // the shingle — no pair join, fan-out bounded by shingle sharing.
    "q123_split_leakage" -> ((s, dir) => {
      val split = graft.operators.Sampling.deterministicSplit(
        Tables.load(s, dir, "documents"),
        "doc_id", Seq("train" -> "c", "val" -> "e"), "test")
      val shl = Dedup.shingles(split, n = 5)
        .join(split.select(col("doc_id"), col("split")), "doc_id")
      val tr = shl.filter(col("split") === "train").select("sh").distinct()
      val leaked = shl.filter(col("split") =!= "train")
        .join(tr, Seq("sh"), "left_semi")
        .select(col("doc_id")).distinct()
        .withColumn("hit", lit(1L))
      split.filter(col("split") =!= "train")
        .join(leaked, Seq("doc_id"), "left")
        .groupBy("split")
        .agg(cnt.as("n_docs"),
          sum(coalesce(col("hit"), lit(0L))).as("n_leaked"),
          expr("sum(coalesce(hit, 0)) * 1000000 DIV count(1)").as("leaked_ppm"))
        .orderBy("split")
    }),

    // Cumulative-user growth: per event day, first-time users that
    // day, the running total of users ever seen, and that day's
    // distinct actives. Running DISTINCT COUNT is re-expressed as
    // min-day-per-user + a cumulative sum — the only window runs over
    // the ~days-sized aggregated relation (the q96 precedent), never
    // the event stream; everything upstream is hash aggregation on
    // (day, user).
    "q120_cumulative_users" -> ((s, dir) => {
      val ev = Tables.load(s, dir, "events")
        .select(to_date(col("ts")).as("d"), col("user_id")).distinct()
        .localCheckpoint() // feeds both the first-day and the DAU branch
      val newu = ev.groupBy("user_id").agg(min("d").as("d"))
        .groupBy("d").agg(cnt.as("n_new"))
      val dau = ev.groupBy("d").agg(cnt.as("dau"))
      val daily = dau.join(newu, Seq("d"), "left")
        .select(col("d"), coalesce(col("n_new"), lit(0L)).as("n_new"), col("dau"))
      // ~days-sized, but days track the fixture's time span — the
      // bucketed prefix sum costs nothing here and removes the last
      // partition-less window (dates bucket via their epoch-day image)
      graft.operators.Windows.prefixSum(daily, Nil, "d", "n_new",
          "cum_users", orderNum = Some(unix_date(col("d"))))
        .select(col("d").as("event_day"), col("n_new"), col("cum_users"), col("dau"))
        .orderBy("event_day")
    }),

    // Training-order manifest WITHOUT a global sort: a resumable run
    // needs every training doc's global step and global token offset,
    // but a corpus-wide row_number is a single-task global sort — the
    // q126/zorder anti-pattern. Instead: (1) rank and running token
    // offset WITHIN each source shard (windows PARTITIONED by source —
    // keyed, embarrassingly parallel); (2) per-shard doc/token totals,
    // an aggregate of ~#shards rows, get exclusive prefix offsets via
    // a window over that TINY relation (the q120 aggregated-window
    // precedent); (3) the offsets broadcast back and the global
    // coordinates are offset + local rank — exact, deterministic
    // (md5 order, the q69 sampling discipline), and never a global
    // shuffle of the corpus. Emitted every 97th step so the report
    // stays bounded while still crossing shard boundaries.
    "q131_training_manifest" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val train = graft.operators.Sampling.deterministicSplit(
          Tables.load(s, dir, "documents"),
          "doc_id", Seq("train" -> "c", "val" -> "e"), "test")
        .filter(col("split") === "train")
        .select(col("doc_id"), col("source"),
          size(filter(Text.tokens(col("text")), x => x =!= "")).cast("long").as("ntok"))
      val w = Window.partitionBy("source")
        .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
      val local = train
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("cum_toks", coalesce(
          sum("ntok").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      val ow = Window.orderBy("source").rowsBetween(Window.unboundedPreceding, -1)
      val offs = train.groupBy("source").agg(cnt.as("nd"), sum("ntok").as("td"))
        .withColumn("doc_off", coalesce(sum("nd").over(ow), lit(0L)))
        .withColumn("tok_off", coalesce(sum("td").over(ow), lit(0L)))
        .select("source", "doc_off", "tok_off")
      local.join(broadcast(offs), Seq("source"))
        .withColumn("global_step", col("doc_off") + col("rk"))
        .withColumn("tok_offset", col("tok_off") + col("cum_toks"))
        .filter(col("global_step") % 97 === 1)
        .select("global_step", "source", "doc_id", "ntok", "tok_offset")
        .orderBy("global_step")
    }),

    // DSIR-style importance weights (round 5): per-source importance
    // of raw data under a TARGET distribution (lang='en' here — the
    // stand-in for any curated target set), via hashed-bigram
    // log-likelihood ratios — the published importance-resampling
    // recipe for data selection. Bigrams hash into 256 buckets (two
    // md5 hex digits — md5 only, §5: native hash() is not portable),
    // so model state is 256 rows regardless of corpus size; per-bucket
    // llr = ln(p_target) - ln(p_raw) with add-one smoothing is the one
    // transcendental, computed once per BUCKET from exact integer
    // counts and ROUND(..,6)-captured into DECIMAL(18,6) before any
    // per-doc math; each doc's weight is then the exact decimal sum of
    // its occurrences' bucket llrs (order-independent). Scale shape:
    // one tokenize+hash pass (checkpointed once, feeds the two count
    // passes and the scoring join), the 256-row model broadcast back,
    // per-source rollup at the end — no pair joins, no driver state.
    "q139_dsir_weights" -> ((s, dir) => {
      val d = Tables.load(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          split(lower(col("text")), " ").as("l"))
        .filter(size(col("l")) >= 2)
      val hb = d.select(col("doc_id"), col("lang"), col("source"),
          explode(expr("transform(sequence(1, size(l) - 1), " +
            "i -> concat(element_at(l, i), ' ', element_at(l, i + 1)))")).as("bgr"))
        .withColumn("b",
          expr("(instr('0123456789abcdef', substr(md5(bgr), 1, 1)) - 1) * 16" +
            " + instr('0123456789abcdef', substr(md5(bgr), 2, 1)) - 1"))
        .select("doc_id", "lang", "source", "b")
        .localCheckpoint()
      val tc = hb.filter(col("lang") === "en").groupBy("b").agg(cnt.as("ct"))
      val rc = hb.groupBy("b").agg(cnt.as("cr"))
      val tot = tc.agg(sum(col("ct")).as("tt"))
        .crossJoin(rc.agg(sum(col("cr")).as("rt")))
      val llr = rc.join(tc, Seq("b"), "left")
        .crossJoin(broadcast(tot))
        .select(col("b"),
          expr("CAST(ROUND(ln((CAST(coalesce(ct, 0) AS DOUBLE) + 1.0D) / (CAST(tt AS DOUBLE) + 256.0D))" +
            " - ln((CAST(cr AS DOUBLE) + 1.0D) / (CAST(rt AS DOUBLE) + 256.0D)), 6) AS DECIMAL(18,6))")
            .as("w"))
      hb.join(broadcast(llr), Seq("b"))
        .groupBy("doc_id", "source").agg(sum(col("w")).as("sw"))
        .groupBy("source")
        .agg(cnt.as("n_docs"),
          sum(col("sw")).cast("double").as("sum_w"),
          max(col("sw")).cast("double").as("max_w"))
        .orderBy("source")
    })
  )

  /** DuckDB oracles (validated at sf0.01/sf0.1 before the natives). */
  val oracle: Map[String, String] = Map(
    "q115_gopher_rules" -> """
WITH t AS (SELECT doc_id, source, unnest(list_filter(string_split(lower(text),' '), x -> x <> '')) tok FROM documents),
tf AS (SELECT doc_id, source, tok, COUNT(*) c FROM t GROUP BY ALL),
pd AS (SELECT doc_id, source, SUM(c) nw, SUM(c*length(tok)) sumlen,
       SUM(CASE WHEN tok IN ('the','a') THEN c ELSE 0 END) nstop, MAX(c) maxtf
       FROM tf GROUP BY ALL),
fl AS (SELECT source,
       CASE WHEN nw BETWEEN 30 AND 80 THEN 1 ELSE 0 END r_len,
       CASE WHEN sumlen*10 BETWEEN 44*nw AND 48*nw THEN 1 ELSE 0 END r_mwl,
       CASE WHEN nstop >= 3 THEN 1 ELSE 0 END r_stop,
       CASE WHEN maxtf*10 <= nw THEN 1 ELSE 0 END r_rep
       FROM pd)
SELECT source, COUNT(*) AS n_docs,
  CAST(SUM(r_len) AS BIGINT) AS pass_len, CAST(SUM(r_mwl) AS BIGINT) AS pass_mwl,
  CAST(SUM(r_stop) AS BIGINT) AS pass_stop, CAST(SUM(r_rep) AS BIGINT) AS pass_rep,
  CAST(SUM(r_len*r_mwl*r_stop*r_rep) AS BIGINT) AS pass_all
FROM fl GROUP BY source ORDER BY source""",

    "q116_intradoc_repeat" -> """
WITH d AS (SELECT doc_id, source, list_filter(string_split(lower(text),' '), x -> x <> '') l FROM documents),
s AS (SELECT doc_id, source, unnest(generate_series(1, len(l)-1)) i, l FROM d WHERE len(l) >= 2),
bg AS (SELECT doc_id, source, l[i] || ' ' || l[i+1] g FROM s),
c AS (SELECT doc_id, source, g, COUNT(*) c FROM bg GROUP BY ALL),
pd AS (SELECT doc_id, source, SUM(c) tot, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) dup FROM c GROUP BY ALL)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(tot) AS BIGINT) AS total_bigrams,
  CAST(SUM(dup) AS BIGINT) AS dup_bigrams,
  CAST(SUM(dup)*1000000 // SUM(tot) AS BIGINT) AS dup_ppm
FROM pd GROUP BY source ORDER BY source""",

    "q117_span_dedup" -> """
WITH d AS (SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') l FROM documents),
tot AS (SELECT CAST(SUM(len(l)) AS BIGINT) total_tokens FROM d),
s AS (SELECT doc_id, unnest(generate_series(1, len(l)-7)) i, l FROM d WHERE len(l) >= 8),
g AS (SELECT doc_id, i, array_to_string(l[i:i+7], ' ') gram FROM s),
dup AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2),
cov AS (SELECT DISTINCT doc_id, p FROM
        (SELECT doc_id, unnest(generate_series(i, i+7)) p FROM g SEMI JOIN dup USING (gram))),
agg AS (SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) docs_affected,
               CAST(COUNT(*) AS BIGINT) covered FROM cov)
SELECT docs_affected, covered AS covered_tokens, total_tokens,
  CAST(covered*1000000 // total_tokens AS BIGINT) AS covered_ppm
FROM agg, tot""",

    // the same hand-pinned decimal widths as the native — every
    // product/difference cast below the 38-digit cap on both engines
    "q118_user_anomaly" -> """
WITH e AS (SELECT event_id, user_id, value,
        CAST(value AS DECIMAL(18,6)) v,
        CAST(ROUND(value*value, 10) AS DECIMAL(28,10)) v2 FROM events),
u AS (SELECT user_id, CAST(COUNT(*) AS DECIMAL(8,0)) n, SUM(v) sv,
        CAST(SUM(v2) AS DECIMAL(20,10)) sq
      FROM e GROUP BY user_id HAVING COUNT(*) >= 30),
z AS (SELECT e.event_id, e.user_id, e.value,
        CAST(u.n * e.v - u.sv AS DECIMAL(19,6)) dlt,
        CAST(u.n * u.sq AS DECIMAL(24,12))
          - CAST(CAST(u.sv AS DECIMAL(19,6)) * CAST(u.sv AS DECIMAL(19,6)) AS DECIMAL(24,12)) den
      FROM e JOIN u USING (user_id))
SELECT event_id, user_id, value,
  ROUND(CAST(dlt * dlt AS DOUBLE) / CAST(den AS DOUBLE), 6) AS z2
FROM z WHERE den > 0
ORDER BY z2 DESC, event_id LIMIT 10""",

    "q119_stopword_scrub" -> """
WITH d AS (SELECT source, list_filter(string_split(lower(text),' '), x -> x <> '') l FROM documents),
sc AS (SELECT source, len(l) nt,
        length(array_to_string(l, ' ')) len_orig,
        list_filter(l, x -> x NOT IN ('the','a')) kept FROM d),
pd AS (SELECT source, nt, nt - len(kept) removed,
        len_orig - length(array_to_string(kept, ' ')) chars_removed FROM sc)
SELECT source, COUNT(*) AS n_docs, CAST(SUM(nt) AS BIGINT) AS n_toks,
  CAST(SUM(removed) AS BIGINT) AS toks_removed,
  CAST(SUM(chars_removed) AS BIGINT) AS chars_removed,
  CAST(SUM(removed)*1000000 // SUM(nt) AS BIGINT) AS removed_ppm
FROM pd GROUP BY source ORDER BY source""",

    // the same per-bigram-type ROUND(ln,9) DECIMAL(18,9) cost terms,
    // exact decimal per-doc sums, one double division per doc
    "q122_perplexity" -> """
WITH d AS (SELECT doc_id, source, list_filter(string_split(lower(text),' '), x -> x <> '') l FROM documents),
v AS (SELECT COUNT(DISTINCT tok) nv FROM (SELECT unnest(l) tok FROM d)),
bgall AS (SELECT doc_id, source, l[i] tok, l[i+1] nxt FROM
  (SELECT doc_id, source, unnest(generate_series(1, len(l)-1)) i, l FROM d WHERE len(l) >= 2)),
c AS (SELECT tok, nxt, COUNT(*) c FROM bgall GROUP BY tok, nxt),
nf AS (SELECT tok, SUM(c) nf FROM c GROUP BY tok),
cost AS (SELECT c.tok, c.nxt,
  CAST(ROUND(ln(CAST(nf.nf + v.nv AS DOUBLE) / (c.c + 1)), 9) AS DECIMAL(18,9)) w
  FROM c JOIN nf ON nf.tok = c.tok, v),
pd AS (SELECT b.doc_id, b.source,
         CAST(ROUND(CAST(SUM(cost.w) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6)) nll
  FROM bgall b JOIN cost ON cost.tok = b.tok AND cost.nxt = b.nxt
  GROUP BY b.doc_id, b.source)
SELECT source, COUNT(*) AS n_docs,
  ROUND(CAST(SUM(nll) AS DOUBLE) / COUNT(*), 6) AS mean_nll,
  CAST(MIN(nll) AS DOUBLE) AS min_nll,
  CAST(MAX(nll) AS DOUBLE) AS max_nll
FROM pd GROUP BY source ORDER BY source""",

    // q66's md5 split CTE; shingles WITHOUT the empty-token filter,
    // mirroring Dedup.shingles (the q93 kernel's convention)
    "q123_split_leakage" -> """
WITH s AS (SELECT doc_id, text,
    CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'c' THEN 'train'
         WHEN md5(CAST(doc_id AS VARCHAR)) < 'e' THEN 'val'
         ELSE 'test' END AS split FROM documents),
d AS (SELECT doc_id, split, string_split(lower(text),' ') l FROM s),
sh AS (SELECT DISTINCT doc_id, split, l[i]||' '||l[i+1]||' '||l[i+2]||' '||l[i+3]||' '||l[i+4] sh
       FROM (SELECT doc_id, split, unnest(generate_series(1, len(l)-4)) i, l FROM d WHERE len(l) >= 5)),
tr AS (SELECT DISTINCT sh FROM sh WHERE split = 'train'),
leak AS (SELECT DISTINCT doc_id FROM sh SEMI JOIN tr USING (sh) WHERE split <> 'train')
SELECT s.split, COUNT(*) AS n_docs,
  CAST(COUNT(leak.doc_id) AS BIGINT) AS n_leaked,
  CAST(COUNT(leak.doc_id) * 1000000 // COUNT(*) AS BIGINT) AS leaked_ppm
FROM s LEFT JOIN leak ON leak.doc_id = s.doc_id
WHERE s.split <> 'train'
GROUP BY s.split ORDER BY s.split""",

    "q120_cumulative_users" -> """
WITH ev AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
fd AS (SELECT user_id, MIN(d) d0 FROM ev GROUP BY user_id),
newu AS (SELECT d0 AS d, COUNT(*) n_new FROM fd GROUP BY d0),
dau AS (SELECT d, COUNT(*) dau FROM ev GROUP BY d)
SELECT dau.d AS event_day, CAST(COALESCE(newu.n_new, 0) AS BIGINT) AS n_new,
  CAST(SUM(COALESCE(newu.n_new, 0)) OVER (ORDER BY dau.d) AS BIGINT) AS cum_users,
  dau.dau AS dau
FROM dau LEFT JOIN newu USING (d) ORDER BY event_day""",

    "q131_training_manifest" -> """
WITH tr AS (
  SELECT doc_id, source,
    CAST(len(list_filter(string_split(lower(text),' '), x -> x <> '')) AS BIGINT) ntok
  FROM documents
  WHERE md5(CAST(doc_id AS VARCHAR)) < 'c'),
loc AS (SELECT doc_id, source, ntok,
  ROW_NUMBER() OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) rk,
  COALESCE(SUM(ntok) OVER (PARTITION BY source ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) cum_toks
  FROM tr),
tot AS (SELECT source, COUNT(*) nd, SUM(ntok) td FROM tr GROUP BY source),
offs AS (SELECT source,
  COALESCE(SUM(nd) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) doc_off,
  COALESCE(SUM(td) OVER (ORDER BY source ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) tok_off
  FROM tot)
SELECT CAST(offs.doc_off + loc.rk AS BIGINT) AS global_step, loc.source, loc.doc_id,
  loc.ntok AS ntok, CAST(offs.tok_off + loc.cum_toks AS BIGINT) AS tok_offset
FROM loc JOIN offs ON loc.source = offs.source
WHERE (offs.doc_off + loc.rk) % 97 = 1
ORDER BY global_step""",

    // q139: the DSIR recipe relationally — same raw split-array
    // bigrams, two-hex-digit md5 buckets via strpos (DuckDB's instr
    // twin), per-bucket smoothed llr rounded into DECIMAL(18,6),
    // exact decimal per-doc sums
    "q139_dsir_weights" -> """
WITH d AS (SELECT doc_id, lang, source, string_split(lower(text),' ') l FROM documents),
bg AS (SELECT doc_id, lang, source, l[i] || ' ' || l[i+1] AS bgr
       FROM (SELECT doc_id, lang, source, unnest(generate_series(1, len(l)-1)) i, l
             FROM d WHERE len(l) >= 2)),
hb AS (SELECT doc_id, lang, source,
         (strpos('0123456789abcdef', substr(md5(bgr),1,1))-1)*16
         + strpos('0123456789abcdef', substr(md5(bgr),2,1))-1 AS b
       FROM bg),
tc AS (SELECT b, COUNT(*) ct FROM hb WHERE lang = 'en' GROUP BY b),
rc AS (SELECT b, COUNT(*) cr FROM hb GROUP BY b),
tot AS (SELECT (SELECT CAST(SUM(ct) AS BIGINT) FROM tc) tt,
               (SELECT CAST(SUM(cr) AS BIGINT) FROM rc) rt),
llr AS (SELECT rc.b,
          CAST(ROUND(ln((CAST(COALESCE(tc.ct,0) AS DOUBLE)+1.0)/(CAST(tt AS DOUBLE)+256.0))
                   - ln((CAST(cr AS DOUBLE)+1.0)/(CAST(rt AS DOUBLE)+256.0)), 6) AS DECIMAL(18,6)) w
        FROM rc LEFT JOIN tc ON tc.b = rc.b CROSS JOIN tot),
dw AS (SELECT hb.doc_id, hb.source, SUM(w) sw FROM hb JOIN llr ON llr.b = hb.b
       GROUP BY hb.doc_id, hb.source)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(sw) AS DOUBLE) AS sum_w,
       CAST(MAX(sw) AS DOUBLE) AS max_w
FROM dw GROUP BY source ORDER BY source"""
  ).map { case (k, v) => k -> v.trim }
}
