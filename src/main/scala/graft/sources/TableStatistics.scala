package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import scala.collection.concurrent.TrieMap

/** Optimizer-grade table statistics for [[ManagedTable]]s — the
  * ANALYZE side of the q112/q143/q147/q149 arc. Those queries REPORT
  * row counts, ndv, equi-depth histograms, and estimate-vs-truth join
  * cardinalities; this module is where the engine stops reporting and
  * starts CONSUMING them: `ANALYZE TABLE t` (SqlRouter) collects the
  * statistics below, and [[graft.plans.StatsJoinPlanner]] reads them
  * to pick join orders and broadcast build sides for every SELECT.
  *
  * What is collected, and why exactly this set:
  *   - row count + total data bytes → relation size and avg row width
  *     (the broadcast-threshold input);
  *   - per-column ndv (HyperLogLog `approx_count_distinct`, the only
  *     sketch that stays one pass at 100 TB) → equi-join denominator
  *     (`|A ⋈ B| ≈ |A|·|B| / max(ndv)` — the q143 uniform estimate
  *     q149 validated) and equality-predicate selectivity;
  *   - per-numeric-column min/max and an 8-bucket equi-depth histogram
  *     (`approxQuantile`, distributed Greenwald–Khanna — the same
  *     shape q147 computes exactly) → range-predicate selectivity by
  *     linear interpolation inside the hit bucket.
  *
  * Durability: stats persist as `_graft_log/v%08d.tablestats.json`
  * keyed to the analyzed snapshot version, and reload on OPEN only
  * when that version is still current — a planner acting on stale
  * statistics is worse than one with none, so row mutations
  * invalidate the in-memory entry (SqlRouter's mutableRoot choke
  * point) and a version-mismatched sidecar is ignored.
  *
  * Scale shape of ANALYZE itself: one full-scan aggregate (count +
  * HLL sketches + min/max, all map-side partial) plus one
  * Greenwald–Khenna pass for the histograms — two scans, no shuffle
  * beyond the 1-row agg collect, no driver-side row data.
  */
object TableStatistics {

  /** Equi-depth histogram = the 9 bucket boundaries (8 buckets). */
  final case class ColStats(ndv: Long, min: Option[Double],
                            max: Option[Double], hist: Seq[Double])

  final case class TableStats(version: Int, rows: Long, bytes: Long,
                              cols: Map[String, ColStats]) {
    def avgRowBytes: Double = if (rows <= 0) 64.0 else bytes.toDouble / rows
  }

  // process-wide registry keyed by normalized table root — statistics
  // describe the TABLE, not a session, so sharing across sessions in
  // one JVM is correct (and what a metastore would do)
  private[graft] val registry = TrieMap.empty[String, TableStats]

  // Full qualified URI (scheme + authority + path): two tables at the
  // same path on different filesystems (file:// vs hdfs://nn1/) must
  // not collide in a process-wide registry. Scheme-less inputs stay
  // scheme-less, which is self-consistent as long as callers are.
  private[graft] def norm(p: String): String = {
    val u = new Path(p).toUri
    val scheme = Option(u.getScheme).map(_ + "://").getOrElse("")
    val auth = Option(u.getAuthority).getOrElse("")
    scheme + auth + u.getPath.stripSuffix("/")
  }

  def get(root: String): Option[TableStats] = registry.get(norm(root))

  def invalidate(root: String): Unit = { registry.remove(norm(root)): Unit }

  def isEmpty: Boolean = registry.isEmpty

  /** Stats for the table whose root contains `filePath` (a scan leaf's
    * data file) — how the planner maps a LogicalRelation back to its
    * managed table without a catalog in the loop. Longest matching
    * root wins: if one managed root is nested under another, the file
    * belongs to the inner table. */
  def lookupByPath(filePath: String): Option[TableStats] = {
    val p = norm(filePath)
    val hits = registry.filter {
      case (r, _) => p == r || p.startsWith(r + "/")
    }
    if (hits.isEmpty) None else Some(hits.maxBy(_._1.length)._2)
  }

  private def statsPath(root: String, v: Int) =
    new Path(root, f"_graft_log/v$v%08d.tablestats.json")

  /** Collect + register + persist statistics for the CURRENT snapshot. */
  def analyze(spark: SparkSession, root: String): TableStats = {
    val snap = ManagedTable.history(spark, root).last
    val df = ManagedTable.read(spark, root)
    val fields = df.schema.fields.toSeq
    val numeric = fields.collect {
      case f if FileStats.isRangeType(f.dataType) => f.name
    }
    val aggs = count(lit(1)).as("_n") +: fields.flatMap { f =>
      approx_count_distinct(col(f.name)).as(s"_ndv_${f.name}") +:
        (if (numeric.contains(f.name))
           Seq(min(col(f.name)).cast("double").as(s"_min_${f.name}"),
             max(col(f.name)).cast("double").as(s"_max_${f.name}"))
         else Nil)
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    def opt(name: String): Option[Double] =
      Option(row.getAs[Any](name)).map(_.toString.toDouble)
    val n = row.getAs[Long]("_n")
    val hists: Map[String, Seq[Double]] =
      if (n == 0 || numeric.isEmpty) Map.empty
      else numeric.zip(df.stat.approxQuantile(numeric.toArray,
          (0 to 8).map(_ / 8.0).toArray, 0.001).toSeq)
        .map { case (c, bs) => c -> bs.toSeq }.toMap
    val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes = snap.files.map(f => fsys.getFileStatus(new Path(root, f)).getLen).sum
    val cols = fields.map { f =>
      f.name -> ColStats(
        ndv = row.getAs[Long](s"_ndv_${f.name}"),
        min = if (numeric.contains(f.name)) opt(s"_min_${f.name}") else None,
        max = if (numeric.contains(f.name)) opt(s"_max_${f.name}") else None,
        hist = hists.getOrElse(f.name, Nil))
    }.toMap
    val ts = TableStats(snap.version, n, bytes, cols)
    registry.put(norm(root), ts)
    val out = fsys.create(statsPath(root, snap.version), /*overwrite=*/ true)
    try out.write(render(ts).getBytes("UTF-8")) finally out.close()
    ts
  }

  /** Reload persisted stats IF they describe the current snapshot
    * version (stale stats mislead the planner — skip them). */
  def load(spark: SparkSession, root: String): Option[TableStats] = {
    val snap = ManagedTable.history(spark, root).last
    val p = statsPath(root, snap.version)
    val fsys = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fsys.exists(p)) None
    else {
      val in = fsys.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val ts = parse(text)
      if (ts.version == snap.version) { registry.put(norm(root), ts); Some(ts) }
      else None
    }
  }

  // -- (de)serialization: one flat string->string map, the catalog
  //    discipline (util.Json escaping; a bespoke value mini-format
  //    keeps the parser ~20 lines instead of a JSON AST) --

  private[graft] def render(ts: TableStats): String = {
    def esc(s: String) = graft.util.Json.escape(s)
    val entries =
      Seq("_version" -> ts.version.toString, "_rows" -> ts.rows.toString,
        "_bytes" -> ts.bytes.toString) ++
        ts.cols.toSeq.sortBy(_._1).map { case (c, cs) =>
          val parts = Seq(s"ndv=${cs.ndv}") ++
            cs.min.map(v => s"min=$v") ++ cs.max.map(v => s"max=$v") ++
            (if (cs.hist.nonEmpty) Seq(s"hist=${cs.hist.mkString("|")}") else Nil)
          s"col:$c" -> parts.mkString(";")
        }
    s"""{"table_stats":${entries.map { case (k, v) => s"${esc(k)}:${esc(v)}" }
      .mkString("{", ",", "}")}}"""
  }

  private[graft] def parse(text: String): TableStats = {
    // flat {"k":"v",...} pairs inside "table_stats" — same minimal
    // shape as the router catalog; keys/values were Json.escape'd but
    // contain no exotic characters (digits, column names, ';|=')
    val start = text.indexOf("\"table_stats\":{") match {
      case -1 => throw new IllegalArgumentException(s"bad stats: $text")
      case i => i + "\"table_stats\":{".length
    }
    var i = start
    val m = Map.newBuilder[String, String]
    def str(): String = {
      require(text.charAt(i) == '"', s"expected string at $i"); i += 1
      val sb = new StringBuilder
      while (text.charAt(i) != '"') {
        // exact inverse of Json.escape (the FileStats.parse discipline):
        // a verbatim append would round-trip a control or non-ASCII
        // character in a column name to a different key, silently
        // detaching that column's stats on reload.
        if (text.charAt(i) == '\\') {
          text.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'u' =>
              sb.append(Integer.parseInt(text.substring(i + 2, i + 6), 16).toChar)
              i += 6
            case c @ ('"' | '\\') => sb.append(c); i += 2
            case c =>
              throw new IllegalArgumentException(s"bad stats escape '\\$c' at $i")
          }
        } else { sb.append(text.charAt(i)); i += 1 }
      }
      i += 1; sb.toString
    }
    if (text.charAt(i) != '}') {
      var more = true
      while (more) {
        val k = str()
        require(text.charAt(i) == ':', s"expected ':' at $i"); i += 1
        m += k -> str()
        if (text.charAt(i) == ',') i += 1 else more = false
      }
    }
    val kv = m.result()
    val cols = kv.collect { case (k, v) if k.startsWith("col:") =>
      val fields = v.split(';').map { p =>
        val eq = p.indexOf('='); p.substring(0, eq) -> p.substring(eq + 1)
      }.toMap
      k.stripPrefix("col:") -> ColStats(
        ndv = fields("ndv").toLong,
        min = fields.get("min").map(_.toDouble),
        max = fields.get("max").map(_.toDouble),
        hist = fields.get("hist").toSeq.flatMap(_.split('|')).map(_.toDouble))
    }
    TableStats(kv("_version").toInt, kv("_rows").toLong, kv("_bytes").toLong, cols)
  }
}
