package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Dedup building blocks for document corpora: shingling, MinHash
  * signatures, SimHash signatures, and set-Jaccard verification.
  *
  * Everything is hash-partitionable: signatures are computed per doc
  * with one groupBy(doc_id) (map-side partials first), and candidate
  * generation is a self-join on signature columns — a shuffle on the
  * signature, never an all-pairs product. That is what makes these
  * patterns the 100 TB dedup path; thresholds and component counts are
  * tuned by the caller.
  *
  * All hashing is md5 (portable/deterministic — see
  * [[graft.functions.Text]]).
  */
object Dedup {

  /** Distinct n-token shingles per document: (doc_id, sh).
    * Shingles — not unigrams — are the right MinHash input when the
    * vocabulary is small relative to the corpus: unigram sets collapse
    * to near-identical sets and LSH buckets explode (measured: 5M
    * candidate pairs vs 254 on the sf0.1 documents table).
    */
  def shingles(docs: DataFrame, n: Int = 3,
               docId: String = "doc_id", text: String = "text"): DataFrame =
    shingleArrays(docs, n, docId, text)
      .select(col("doc_id"), explode(col("shs")).as("sh"))

  /** Distinct n-token shingles per document as ONE array row:
    * (doc_id, shs). Distinctness is per document, so `array_distinct`
    * computes it INSIDE the row — where an explode + global
    * `.distinct()` would shuffle the entire shingle relation (billions
    * of rows at corpus scale) just to dedup within each doc_id. Zero
    * shuffles; [[shingles]] is the exploded view of this. */
  def shingleArrays(docs: DataFrame, n: Int = 3,
                    docId: String = "doc_id", text: String = "text"): DataFrame = {
    val idx = (0 until n).map(k => s"element_at(l, i + $k)").mkString(", ' ', ")
    docs
      .select(col(docId).as("doc_id"), split(lower(col(text)), " ").as("l"))
      .filter(size(col("l")) >= n)
      .select(col("doc_id"),
        array_distinct(expr(s"transform(sequence(1, size(l) - ${n - 1}), i -> concat($idx))")).as("shs"))
  }

  /** k-component MinHash signature per doc over an exploded
    * (doc_id, item) relation: columns h1..hk. One shuffle on doc_id.
    *
    * When k divides 32, ONE md5 per item is computed and component i is
    * `min` over the i-th width-(32/k) hex window of the digest — k
    * independent hash functions for the price of one digest (the
    * windows are disjoint bits of a strong hash). At k=8 that is 1/8
    * the hash work of the prefix scheme, which matters when the item
    * relation is billions of shingles. Fixed-width lowercase hex
    * compares lexicographically = numerically in every engine, so the
    * minima are portable. Narrower windows trade a slightly higher
    * chance of min collisions (more LSH candidates, caught by
    * [[jaccardVerify]]) for the 8x hash saving.
    *
    * For k not dividing 32, falls back to one md5 per component with an
    * unambiguous `"<i>:"` prefix as the independent hash function.
    */
  def minhashSignature(items: DataFrame, k: Int, itemCol: String = "sh"): DataFrame = {
    // loud, at the root cause: k=0 would otherwise die far away with
    // an opaque comps.head NoSuchElementException (and the array form
    // would silently return a signature-less frame)
    require(k >= 1, s"minhash signature needs k >= 1 components, got $k")
    val comps =
      if (32 % k == 0) {
        val w = 32 / k
        val digest = md5(col(itemCol))
        (0 until k).map(i =>
          min(substring(digest, i * w + 1, w)).as(s"h${i + 1}"))
      } else
        (0 until k).map(i =>
          min(md5(concat(lit(s"$i:"), col(itemCol)))).as(s"h${i + 1}"))
    items.groupBy("doc_id").agg(comps.head, comps.tail: _*)
  }

  /** [[minhashSignature]] computed per row from [[shingleArrays]]
    * output — the same h1..hk values with ZERO shuffles: each
    * component is an `array_min` fold over the in-row digest array,
    * where the exploded form needs a groupBy(doc_id) exchange of every
    * (doc, item) row. This is the signature path to prefer whenever
    * the item sets are already materialized per row. Same hex-window
    * scheme (k dividing 32: k windows of one md5; otherwise one
    * prefixed md5 per component), so the two forms are
    * value-identical (differential-tested in OperatorSpec).
    *
    * Reserved working column (must not exist on `arrs`): `_dg` — the
    * library's reserved-column convention (AnnSearch `_cs`,
    * Skew `_salt`, TimeSeries gapFill). */
  def minhashSignatureFromArrays(arrs: DataFrame, k: Int,
                                 itemsCol: String = "shs"): DataFrame = {
    require(k >= 1, s"minhash signature needs k >= 1 components, got $k")
    require(!arrs.columns.contains("_dg"),
      "reserved working column _dg — rename it on the input")
    // rows with empty item arrays are dropped, exactly as the exploded
    // form has no rows (hence no group) for them
    val nonEmpty = arrs.filter(size(col(itemsCol)) > 0)
    val withDigests =
      if (32 % k == 0)
        // one md5 per item, materialized as a working column so the k
        // window-minima share it (CollapseProject keeps non-trivial
        // expressions referenced more than once in their own Project)
        nonEmpty.withColumn("_dg", transform(col(itemsCol), s => md5(s)))
      else nonEmpty.withColumn("_dg", col(itemsCol))
    val comps =
      if (32 % k == 0) {
        val w = 32 / k
        (0 until k).map(i =>
          array_min(transform(col("_dg"), d => substring(d, i * w + 1, w))).as(s"h${i + 1}"))
      } else
        (0 until k).map(i =>
          array_min(transform(col("_dg"), s => md5(concat(lit(s"$i:"), s)))).as(s"h${i + 1}"))
    withDigests.select(col("doc_id") +: comps: _*)
  }

  /** The full k-component signature of a text column as ONE key string
    * (components joined with `:`), computed entirely IN-ROW — a pure
    * projection with no shuffle and no state, which makes it legal in
    * a streaming SELECT. Component values are identical to
    * [[minhashSignatureFromArrays]] over [[shingleArrays]] (same
    * hex-window scheme, differential-tested in OperatorSpec), so a
    * batch dedup keyed on this column and the banded-LSH pipeline
    * agree on what "signature-identical" means.
    *
    * Texts shorter than `n` tokens have no shingles; they fall back to
    * an exact-content key (`short:` + md5 of the lowercased text) —
    * distinct from every signature key by prefix, so short docs are
    * exact-deduped rather than all colliding on a null signature.
    * NULL texts get the literal key `null:` (md5 of null would
    * null-propagate into a null KEY): all no-content docs are one
    * group — deliberate exact-dedup of nothing-content, and the key
    * is never null, so a null-keyed state row can't absorb distinct
    * docs by accident.
    *
    * This is the ingest-time near-dup key: feed it to
    * `dropDuplicatesWithinWatermark` (see
    * [[graft.streaming.StreamingAnalytics.nearDupStream]]) and
    * signature-identical redeliveries/mirrors are dropped at the door,
    * before they ever reach the batch dedup passes. */
  def signatureKey(text: Column, k: Int = 8, n: Int = 3): Column = {
    require(k >= 1, s"minhash signature needs k >= 1 components, got $k")
    val l = split(lower(text), " ")
    val shs = array_distinct(
      transform(sequence(lit(1), size(l) - (n - 1)),
        i => concat_ws(" ", (0 until n).map(j => element_at(l, i + j)): _*)))
    val comps =
      if (32 % k == 0) {
        val w = 32 / k
        val digests = transform(shs, s => md5(s))
        (0 until k).map(i =>
          array_min(transform(digests, d => substring(d, i * w + 1, w))))
      } else
        (0 until k).map(i =>
          array_min(transform(shs, s => md5(concat(lit(s"$i:"), s)))))
    when(text.isNull, lit("null:"))
      .when(size(l) >= n, concat_ws(":", comps: _*))
      .otherwise(concat(lit("short:"), md5(lower(text))))
  }

  /** Candidate near-dup pairs (i < j) from banded MinHash signatures:
    * docs agreeing on ALL components of any band become a pair.
    * `bands` partitions 1..k into equality groups; pairs are the
    * distinct union over bands. Each band is an equi-self-join on its
    * component columns — hash-partitionable, skew governed by band
    * width (wider band = smaller buckets).
    */
  def lshCandidates(sig: DataFrame, bands: Seq[Seq[Int]]): DataFrame = {
    require(bands.nonEmpty && bands.forall(_.nonEmpty),
      s"lshCandidates needs at least one non-empty band, got $bands")
    bands.map { band =>
      val cond = band.map(i => col(s"a.h$i") === col(s"b.h$i"))
        .reduce(_ && _) && col("a.doc_id") < col("b.doc_id")
      sig.as("a").join(sig.as("b"), cond)
        .select(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
    }.reduce(_ union _).distinct()
  }

  /** Exact set-Jaccard for ALL pairs of docs sharing at least one
    * item, in a single pass: the item self-join yields one row per
    * (pair, shared item), so grouping it counts intersections
    * directly — candidates and |A∩B| come out of the same shuffle.
    * Output: (i, j, jc). Pairs sharing nothing never appear (their
    * Jaccard is 0 by definition).
    *
    * PRECONDITION (here and in [[jaccardVerify]]): `items` must be
    * DISTINCT per (doc_id, item) — [[shingles]] already is; raw
    * tokenize output is NOT (duplicate rows inflate both intersection
    * and cardinality and can push jc past 1). Call `.distinct()` first
    * for multiset inputs.
    *
    * `maxDf` is the hot-item guard, and at corpus scale it is NOT
    * optional: an item shared by m docs emits m^2/2 rows into one
    * reducer of the self-join, and boilerplate shingles ("all rights
    * reserved...") reach m in the millions — a semantic blowup no AQE
    * skew-split can save, because the pairs really exist. With
    * maxDf > 0, items with document frequency above it are dropped
    * BEFORE the self-join (one groupBy(item) count + semi join — both
    * hash-partitionable), and the result is the exact Jaccard over the
    * df-filtered item space: cardinalities and intersections both
    * exclude hot items, so jc stays a true [0,1] Jaccard of the
    * filtered sets (the stopword-removal semantics standard in dedup
    * practice). Docs whose every item is hot drop out entirely, like
    * docs sharing nothing. maxDf = 0 (default) disables the cap —
    * exact all-pairs semantics, safe only when the df distribution is
    * known to be bounded. Worst-case pair fan-out is maxDf^2/2 per
    * item, chosen by the caller.
    */
  def jaccardAllPairs(items: DataFrame, itemCol: String = "sh",
                      maxDf: Int = 0): DataFrame = {
    val kept = capHotItems(items, itemCol, maxDf)
    val card = kept.groupBy("doc_id").agg(count(lit(1)).as("nt"))
    // Kept as a codegen'd self-join + partial-agg count
    // (undirectedIntersections): a grouped collect_list + in-bucket
    // pair transform was measured 2.5x SLOWER here (hot buckets
    // materialize m^2/2 structs in one array row, while the join
    // streams them straight into the partial count).
    undirectedIntersections(kept, itemCol)
      .join(card.select(col("doc_id").as("i"), col("nt").as("na")), "i")
      .join(card.select(col("doc_id").as("j"), col("nt").as("nb")), "j")
      .select(col("i"), col("j"),
        (col("ci").cast("double") / (col("na") + col("nb") - col("ci"))).as("jc"))
  }

  /** The maxDf hot-item guard shared by [[jaccardAllPairs]] and
    * [[containmentAllPairs]]: drop items with document frequency above
    * the cap (groupBy(item) count + semi join) BEFORE any self-join.
    * maxDf = 0 disables the cap.
    *
    * With the cap on, the capped relation is MATERIALIZED once
    * (localCheckpoint — the repo's intra-query reuse convention): it
    * feeds the cardinality aggregate and both sides of the self-join,
    * and lazily each consumer would re-run the df count + semi join
    * (exchange reuse does not span the three differently-keyed
    * consumers). Uncapped inputs are returned untouched — the caller
    * owns that relation's caching. */
  private def capHotItems(items: DataFrame, itemCol: String, maxDf: Int): DataFrame = {
    require(maxDf >= 0, s"maxDf must be >= 0 (0 = uncapped), got $maxDf")
    if (maxDf == 0) items
    else items.join(
      items.groupBy(itemCol).agg(count(lit(1)).as("_df"))
        .filter(col("_df") <= maxDf).select(itemCol),
      Seq(itemCol), "left_semi").localCheckpoint()
  }

  /** The intersection kernel shared by [[jaccardAllPairs]] and
    * [[containmentAllPairs]]: |A∩B| per unordered pair (i < j) sharing
    * at least one item, as one self-join streamed into a partial+final
    * count. A fix to the join semantics lands in both callers. */
  private def undirectedIntersections(kept: DataFrame, itemCol: String): DataFrame =
    kept.as("a")
      .join(kept.as("b"),
        col(s"a.$itemCol") === col(s"b.$itemCol") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("i"), col("b.doc_id").as("j"))
      .agg(count(lit(1)).as("ci"))

  /** Directional exact containment |A∩B| / |A| for every ORDERED pair
    * (i, j), i != j, sharing at least one item — the asymmetric twin
    * of [[jaccardAllPairs]]. Jaccard misses subset relations (a quote
    * of 5% of a doc has tiny Jaccard but containment 1.0 from the
    * quote's side); near-1 containment of i in j means i is
    * substantially quoted/duplicated inside j, the signal quote- and
    * subset-dedup policies key on. Output: (i, j, ci, na, ct) with
    * ci = |A∩B|, na = |A|, ct = ci/na in [0, 1] — raw counts exposed
    * so thresholds can stay in exact integer arithmetic
    * (ci * 10 >= na * 9 instead of ct >= 0.9).
    *
    * Same PRECONDITION (distinct per (doc_id, item)) and same `maxDf`
    * hot-item guard as [[jaccardAllPairs]] — with the cap, ct is the
    * exact containment over the df-filtered item space. The self-join
    * runs once in undirected (i < j) form and both directions are
    * emitted from it — intersection counts are symmetric, so this
    * halves the join work vs a directional self-join.
    */
  def containmentAllPairs(items: DataFrame, itemCol: String = "sh",
                          maxDf: Int = 0): DataFrame = {
    val kept = capHotItems(items, itemCol, maxDf)
    val card = kept.groupBy("doc_id").agg(count(lit(1)).as("nt"))
    // localCheckpoint: the union below references the self-join twice;
    // without materializing, the one-join claim would hold only when
    // runtime exchange reuse happens to fire. The pair relation is
    // compact (post-aggregation), so this is the cheap side to pin —
    // the same convention q42 uses for its triple-referenced arrays.
    val und = undirectedIntersections(kept, itemCol).localCheckpoint()
    val dir = und.union(und.select(col("j").as("i"), col("i").as("j"), col("ci")))
    dir
      .join(card.select(col("doc_id").as("i"), col("nt").as("na")), "i")
      .select(col("i"), col("j"), col("ci"), col("na"),
        (col("ci").cast("double") / col("na")).as("ct"))
  }

  /** Exact set-Jaccard for candidate pairs: joins each (i, j) pair
    * back to the item sets and computes |A∩B| / |A∪B| as a double.
    * Verification cost is proportional to candidates × items — run it
    * AFTER LSH pruning, never on the raw pair space.
    * Output: (i, j, jc).
    */
  def jaccardVerify(cand: DataFrame, items: DataFrame, itemCol: String = "sh"): DataFrame = {
    val card = items.groupBy("doc_id").agg(count(lit(1)).as("nt"))
    val inter = cand
      .join(items.select(col("doc_id").as("i"), col(itemCol).as("ia")), "i")
      .join(items.select(col("doc_id").as("j"), col(itemCol).as("ib")), "j")
      .filter(col("ia") === col("ib"))
      .groupBy("i", "j").agg(count(lit(1)).as("ci"))
    cand
      .join(inter, Seq("i", "j"), "left")
      .join(card.select(col("doc_id").as("i"), col("nt").as("na")), "i")
      .join(card.select(col("doc_id").as("j"), col("nt").as("nb")), "j")
      .select(col("i"), col("j"),
        (coalesce(col("ci"), lit(0)).cast("double") /
          (col("na") + col("nb") - coalesce(col("ci"), lit(0)))).as("jc"))
  }

  /** nBits-bit SimHash signature per doc over (doc_id, tok): each bit
    * is the sign of the token-frequency-weighted vote of that bit of
    * md5(tok). Computed as nBits aggregate columns in ONE
    * groupBy(doc_id) pass (no bit-explosion shuffle). Output:
    * (doc_id, sg) with sg an nBits-char '0'/'1' string.
    * Bit b reads hex digit b of md5: its high bit (value >= 8) votes
    * +1/-1 — portable across engines, unlike native hash().
    */
  def simhashSignature(toks: DataFrame, nBits: Int = 16): DataFrame = {
    require(nBits <= 32, "md5 hex has 32 digits")
    val votes = (1 to nBits).map(b => sum(expr(
      s"CASE WHEN instr('0123456789abcdef', substr(md5(tok), $b, 1)) - 1 >= 8 THEN 1 ELSE -1 END"))
      .as(s"s$b"))
    toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        concat((1 to nBits).map(b => when(col(s"s$b") > 0, "1").otherwise("0")): _*).as("sg"))
  }

  /** Exact connected components over an undirected pair list (i, j):
    * every node gets `root` = the minimum doc_id reachable from it, so
    * a component is the set sharing a root. Iterative min-label
    * propagation with a per-round convergence count — the standard
    * distributed pattern (each round is one join + aggregate, no
    * driver-side graph state; iterations ~ component diameter, which
    * for near-dup clusters is tiny). `localCheckpoint` per round keeps
    * the plan from growing linearly with iterations.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 50): DataFrame = {
    // Both lazy: the first round's count materializes edges and the
    // fused-first-round labels along with its own join — no separate
    // up-front materialization jobs.
    val edges = pairs.select(col("i").as("a"), col("j").as("b"))
      .union(pairs.select(col("j").as("a"), col("i").as("b")))
      .distinct().localCheckpoint(false)
    // Fused first round: every node's initial label is min(self, direct
    // neighbors) straight off the edge list — one aggregate instead of
    // an identity-label round followed by the same join.
    var labels = edges.groupBy(col("a").as("doc")).agg(min(col("b")).as("mb"))
      .select(col("doc"), least(col("doc"), col("mb")).as("root"))
      .localCheckpoint(false)
    var converged = false
    var it = 0
    while (!converged && it < maxIter) {
      val nbrMin = edges
        .join(labels.select(col("doc").as("b"), col("root").as("brand")), "b")
        .groupBy(col("a").as("doc")).agg(min("brand").as("nroot"))
      // carry the previous root through the round so convergence is a
      // filter+count on the already-materialized result, not a second
      // full join against the old labels
      // LAZY checkpoint + count: the count action below materializes
      // the checkpoint as its side effect — one job per round where the
      // default eager checkpoint would run a separate materialization
      // job first (measured: the per-round driver overhead, not the
      // tiny join, dominates this loop at bench scale)
      val updated = labels.join(nbrMin, Seq("doc"), "left")
        .select(col("doc"), col("root").as("old_root"),
          least(col("root"), coalesce(col("nroot"), col("root"))).as("root"))
        .localCheckpoint(false)
      val changed = updated.filter(col("root") =!= col("old_root")).count()
      labels = updated.select("doc", "root")
      converged = changed == 0
      it += 1
    }
    // Partially-propagated labels are silently WRONG (components split
    // at the truncation frontier) — fail loudly instead. Iterations
    // needed = component diameter; raise maxIter for long chains.
    require(converged,
      s"connectedComponents did not converge in $maxIter iterations — " +
        "component diameter exceeds maxIter; raise it")
    labels
  }

  /** End-to-end near-dup removal: verified pairs are closed into
    * duplicate CLUSTERS ([[connectedComponents]] — revisions of one
    * template chain transitively) and one representative per cluster
    * survives (the minimum doc_id = the component root). This is the
    * cluster-representative policy: nothing outside a cluster is ever
    * dropped, and exactly size-1 docs are dropped per cluster.
    * Pipeline: shingle -> MinHash(k) -> LSH bands -> exact-Jaccard
    * verify >= `threshold` -> components -> anti-join non-roots. Every
    * stage is the shuffle-partitionable form documented above.
    */
  def dedupCorpus(docs: DataFrame, threshold: Double, k: Int = 8,
                  bands: Seq[Seq[Int]] = Seq(Seq(1, 2, 3, 4), Seq(5, 6, 7, 8))): DataFrame = {
    // The in-row signature path fuses tokenize+shingle+md5+minhash
    // into the scan stage, so an under-split input (one file / one row
    // group) would serialize all of it on one core — repartition the
    // RAW docs BEFORE shingling, so the shuffle moves the smallest
    // relation (text, not shingle arrays) and every derivation step
    // runs parallel. At healthy scale this one raw-corpus shuffle is
    // small next to the band self-joins and shingle-level verify
    // shuffles downstream.
    val arr = shingleArrays(docs.repartition(col("doc_id")))
    val sh = arr.select(col("doc_id"), explode(col("shs")).as("sh"))
    val cand = lshCandidates(minhashSignatureFromArrays(arr, k), bands)
    val pairs = jaccardVerify(cand, sh)
      .filter(col("jc") >= threshold).select("i", "j")
    val losers = connectedComponents(pairs)
      .filter(col("doc") =!= col("root"))
      .select(col("doc").as("doc_id"))
    docs.join(losers, Seq("doc_id"), "left_anti")
  }

  /** Train/eval contamination: distinct `train` doc_ids sharing at
    * least one n-token shingle with any doc in `evalDocs` — the
    * decontamination primitive (leaked eval text must leave the
    * training corpus). The eval shingle set is DISTINCT and typically
    * orders of magnitude smaller than the training corpus, so the
    * semi join broadcasts it at real scale; the training side streams
    * through one shingle pass, never a pair join. */
  def contaminatedDocs(train: DataFrame, evalDocs: DataFrame, n: Int = 5): DataFrame =
    shingles(train, n)
      .join(shingles(evalDocs, n).select("sh").distinct(), Seq("sh"), "left_semi")
      .select("doc_id").distinct()

  /** Collapse (key -> group size) stats used by the dedup reports:
    * n_groups, n_docs, n_dupes (sum of size-1 over groups > 1). */
  /** Cross-document duplicated-span coverage — the exact-substring
    * dedup ACCOUNTING pass (the measurement behind suffix-array-style
    * training-data dedup): which token positions sit inside an
    * `n`-gram that also occurs in at least one OTHER document?
    * Returns per-doc `(doc_id, covered)` where `covered` counts the
    * distinct token positions lying under any cross-document
    * duplicated span.
    *
    * Shape at scale: the span relation is one row per token position
    * (the same cardinality every shingle pass here already carries);
    * duplicated grams come from ONE hash aggregate on the gram
    * (`count distinct doc >= 2` — no pair join anywhere, unlike the
    * Jaccard kernel), and coverage is an n-bounded explode of the
    * matching spans followed by a distinct on (doc, position). Every
    * shuffle is keyed on gram or doc_id; nothing is quadratic in
    * documents, and fan-out is bounded by n x matching spans.
    */
  def dupSpanCoverage(docs: DataFrame, n: Int = 8,
                      reportBound: Option[String] = None): DataFrame = {
    require(n >= 2, s"span length must be >= 2, got $n")
    reportBound.foreach(b =>
      require(b.nonEmpty && b.forall(c => ('0' <= c && c <= '9') || ('a' <= c && c <= 'f')),
        s"reportBound '$b' is not lowercase hex"))
    val toks = docs.select(col("doc_id"),
      filter(split(lower(col("text")), " "), t => t =!= "").as("t"))
    val spans = toks.filter(size(col("t")) >= n)
      .select(col("doc_id"), posexplode(expr(
        s"transform(sequence(0, size(t) - $n), i -> array_join(slice(t, i + 1, $n), ' '))")))
      .toDF("doc_id", "pos", "gram")
      .localCheckpoint() // the gram census and the coverage explode both read it
    val dup = spans.groupBy("gram").agg(countDistinct(col("doc_id")).as("nd"))
      .filter(col("nd") >= 2).select("gram")
    // The census above always reads every document (cross-document
    // duplication is a corpus property), but the coverage
    // explode+distinct — the pass whose fan-out is n x matching spans
    // — can be restricted to a content-addressed sample of REPORT
    // docs (md5(doc_id) < reportBound, the repo's sampling
    // convention). Per-sampled-doc `covered` stays EXACT (ApproxSpec
    // equality-tests it against the full pass), so corpus aggregates
    // estimated from the sample carry plain sampling error, no
    // estimator bias. Full-corpus exact remains the q117 gate; at
    // 100 TB default the REPORT side to a sample.
    val report = reportBound.fold(spans)(b =>
      spans.filter(md5(col("doc_id").cast("string")) < lit(b)))
    report.join(dup, "gram") // dup is distinct grams, so inner == semi
      .select(col("doc_id"),
        explode(sequence(col("pos"), col("pos") + lit(n - 1))).as("p"))
      .distinct()
      .groupBy("doc_id").agg(count(lit(1)).as("covered"))
  }

  def groupStats(grouped: DataFrame, dupesCol: String): DataFrame =
    grouped.agg(
      count(lit(1)).as("n_groups"),
      sum(col("n")).as("n_docs"),
      sum(when(col("n") > 1, col("n") - 1).otherwise(0)).as(dupesCol))
}
