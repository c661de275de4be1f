package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Table catalog for the ten-parquet-table universe (SURVEY.md §1,
  * FIXTURES.md). One parquet file per table under an sf directory.
  *
  * Design note for scale: every read here is a plain columnar parquet
  * scan — Catalyst pushes filters and prunes columns into the scan, so
  * queries written against these tables/views keep `PushedFilters` /
  * narrow `ReadSchema` for free. At cluster scale the same code reads a
  * directory of many files and parallelizes by row-group; nothing below
  * is single-file-specific.
  */
object Tables {

  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table as a DataFrame.
    *
    * `events.ts` has shipped in two parquet encodings across testdata
    * generations, so the load adapts to the RESOLVED type instead of
    * assuming one:
    *   - INT64 TIMESTAMP(NANOS): Spark 4.1.2 refuses to read it
    *     natively (PARQUET_TYPE_ILLEGAL). Fix per SURVEY.md §1: read
    *     nanos as long, rebuild the timestamp with integer division
    *     (float division loses precision above 2^53). Lossless here:
    *     every generated ts has zero sub-microsecond part.
    *   - timestamp[us] without timezone: resolves as TIMESTAMP_NTZ;
    *     cast to TIMESTAMP under the UTC session so the wall-clock
    *     values are identical to what DuckDB reads — the same naive
    *     instants, no shift.
    */
  /** Memo of resolved relations keyed by (session, dir, name, dir
    * fingerprint). A bench/verify session calls load ~700 times over
    * the same ten immutable parquet paths; each un-memoized call pays
    * file listing + footer schema resolution + the session lock. The
    * memo reuses the resolved DataFrame (an immutable logical plan —
    * the DATA is still scanned from parquet on every execution, so
    * nothing here caches results). The fingerprint (file count +
    * max mtime + total bytes of the path's files) invalidates the
    * entry if a caller rewrites a table dir in-place — rebuilt corpora
    * (ScaleBench) resolve fresh, read-only testdata hits the memo.
    */
  // weak session keys, like `registered`: a stopped session must not be
  // pinned in memory by its resolved relations
  private val resolved = scala.collection.mutable.WeakHashMap
    .empty[SparkSession, scala.collection.mutable.HashMap[(String, String, Long), DataFrame]]

  private def dirFingerprint(path: String): Long = {
    def walk(f: java.io.File): Long =
      if (f.isDirectory)
        Option(f.listFiles).map(_.foldLeft(f.listFiles.length.toLong) {
          (acc, c) => acc * 1000003L + walk(c)
        }).getOrElse(0L)
      else f.lastModified() * 31L + f.length()
    walk(new java.io.File(path))
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    val key = (sfDir, name, dirFingerprint(s"$sfDir/$name.parquet"))
    resolved.synchronized {
      resolved.getOrElseUpdate(spark, scala.collection.mutable.HashMap.empty)
        .get(key)
    } match {
      case Some(df) => df
      case None =>
        val df = doLoad(spark, sfDir, name)
        resolved.synchronized {
          resolved.getOrElseUpdate(spark, scala.collection.mutable.HashMap.empty)
            .update(key, df)
        }
        df
    }
  }

  private def doLoad(spark: SparkSession, sfDir: String, name: String): DataFrame =
    // EVERY load takes the session lock, not just the events branch:
    // the nanosAsLong flag is session-global and consulted at plan
    // time, so while one thread holds it flipped for the events schema
    // resolution, an UNLOCKED concurrent parquet read would silently
    // resolve any INT64 TIMESTAMP(NANOS) column as bigint. Locking all
    // loads keeps the flag's flipped window unobservable (QueryServer
    // runs a 4-thread executor); the cost is schema resolution only —
    // the returned frames execute lock-free.
    spark.synchronized {
      name match {
        case "events" =>
          val key = "spark.sql.legacy.parquet.nanosAsLong"
          val prev = spark.conf.getOption(key)
          spark.conf.set(key, "true")
          try {
            val raw = spark.read.parquet(s"$sfDir/events.parquet")
            // known encodings ONLY — a future generation shipping ts as
            // string/int32 must fail loudly here, not cast to nulls
            val fix = raw.schema("ts").dataType match {
              case org.apache.spark.sql.types.LongType =>
                expr("timestamp_micros(ts DIV 1000)") // epoch nanos
              case org.apache.spark.sql.types.TimestampType |
                   org.apache.spark.sql.types.TimestampNTZType =>
                col("ts").cast("timestamp")           // (N)TZ micros
              case other => throw new IllegalStateException(
                s"events.ts resolved as ${other.simpleString} — unknown testdata " +
                  "encoding; extend Tables.load for it explicitly")
            }
            raw.withColumn("ts", fix)
          } finally prev match {
            case Some(v) => spark.conf.set(key, v)
            case None    => spark.conf.unset(key)
          }
        case _ =>
          spark.read.parquet(s"$sfDir/$name.parquet")
      }
    }

  /** Ingest a table from CSV or JSON-lines with an explicit schema —
    * the reference's ingestion path (schema-declared tables fed from
    * delimited files). An explicit schema keeps ingestion one pass
    * (no inference scan) and type-stable at any size; both formats
    * split across executors by file/offset, so ingestion parallelism
    * scales with input bytes.
    */
  def loadAs(spark: SparkSession, path: String, format: String,
             schema: org.apache.spark.sql.types.StructType,
             header: Boolean = true): DataFrame = format match {
    case "csv"  => spark.read.schema(schema).option("header", header).csv(path)
    case "json" => spark.read.schema(schema).json(path)
    case "parquet" => spark.read.schema(schema).parquet(path)
    case "orc" => spark.read.schema(schema).orc(path)
    // no spark-avro on this classpath: container files decode per
    // partition with stock Avro (see AvroSource for scope/limits)
    case "avro" => AvroSource.read(spark, path, schema)
    case other => throw new IllegalArgumentException(s"unsupported format: $other")
  }

  /** Write a DataFrame as a parquet dataset, optionally
    * hive-partitioned by columns — the lake-layout sink: partition
    * columns become directories, so equality predicates on them prune
    * whole directories at 100 TB.
    */
  def writeAs(df: DataFrame, path: String, format: String = "parquet",
              partitionBy: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format(format)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).save(path)
  }

  /** Rebalance a pathologically under-partitioned input for map-heavy
    * derivation. A single-row-group parquet file is unsplittable — the
    * whole scan is ONE task, and any expensive per-row work fused into
    * the scan stage (tokenize/shingle/hash/vector folds) serializes on
    * one core. This repartitions such inputs to the session's shuffle
    * parallelism, moving only the raw input bytes (tiny relative to
    * the derived work). Inputs already split across at least half the
    * target parallelism are returned unchanged — at real scale, files
    * and row groups provide natural splits and this is a no-op, so it
    * never adds a shuffle where the layout is healthy. Use it on
    * compute-bound pipelines, NOT filter-heavy scans (there the
    * pushed-down filter should run before any exchange). Call it on
    * (near-)source relations: the partition-count probe walks the
    * physical plan, and on a derived frame containing exchanges it
    * would materialize those stages eagerly under AQE. */
  def rebalance(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions * 2 >= target) df else df.repartition(target)
  }

  /** Compact a dataset into `numFiles` files of clustered, sorted rows
    * — the small-files/maintenance sink. Streaming ingestion and
    * per-task writes leave thousands of KB-sized files whose per-file
    * open/footer cost dominates a 100 TB scan; compaction rewrites to
    * a bounded file count. `clusterCols` range-partitions the data so
    * each output file owns a contiguous key range, and rows are sorted
    * within files — min/max footer stats then let predicate pushdown
    * skip whole files AND row groups on those columns. With no
    * clusterCols it is a plain coalesce-style rewrite.
    * `maxRecordsPerFile` (0 = unlimited) caps file size against skewed
    * ranges.
    */
  def compact(df: DataFrame, path: String, numFiles: Int,
              clusterCols: Seq[String] = Nil, format: String = "parquet",
              maxRecordsPerFile: Long = 0L): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    // In-place compaction (output path == input files' directory) would
    // fail at write time with Spark's cannot-overwrite-a-read-path
    // error AFTER doing the repartition work — fail fast and spell out
    // the write-then-swap recipe instead. Comparison is on Hadoop Path
    // URIs (scheme + authority + decoded path, local paths
    // canonicalized), so hdfs:///s3a:// targets, %20-encoded local
    // paths, and symlinked temp dirs all compare correctly.
    def norm(p: org.apache.hadoop.fs.Path): (String, String) = {
      val u = p.toUri
      val scheme = Option(u.getScheme).getOrElse("file")
      val auth = Option(u.getAuthority).getOrElse("")
      val dir =
        if (scheme == "file") new java.io.File(u.getPath).getCanonicalPath
        else u.getPath
      (s"$scheme://$auth", dir.stripSuffix("/") + "/")
    }
    val t = norm(new org.apache.hadoop.fs.Path(path))
    val inPlace = df.inputFiles.exists { f =>
      val i = norm(new org.apache.hadoop.fs.Path(f))
      i._1 == t._1 && i._2.startsWith(t._2)
    }
    require(!inPlace,
      s"compact cannot overwrite its own input ($path) — write to a sibling dir, then swap")
    val arranged =
      if (clusterCols.nonEmpty)
        df.repartitionByRange(numFiles, clusterCols.map(col): _*)
          .sortWithinPartitions(clusterCols.map(col): _*)
      else df.repartition(numFiles)
    arranged.write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .format(format).save(path)
  }

  /** Persist a DataFrame as a BUCKETED catalog table: rows are
    * pre-hashed into `buckets` files by `bucketCols`. Two tables
    * bucketed the same way join WITHOUT any shuffle (asserted in
    * SourcesSpec) — the layout that deletes the biggest exchange at
    * 100 TB. Requires `saveAsTable` (bucket metadata lives in the
    * catalog, not the files).
    */
  def writeBucketed(df: DataFrame, table: String, buckets: Int, bucketCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** The Z-order (Morton) key over `cols`: each column is rank-
    * normalized to `bits` bits (rank, not raw value — Z-order needs
    * uniform per-dimension coverage, and real columns are skewed),
    * then the bit strings are interleaved. Rows close in Z-key are
    * close in EVERY dimension, so range-partitioning by it gives files
    * whose min/max footer stats are narrow on ALL the clustered
    * columns at once — where a plain sort narrows only its leading
    * column.
    *
    * Rank normalization is ONE distributed multi-column
    * `approxQuantile` pass (mergeable Greenwald-Khanna sketches, no
    * global sort, driver footprint bounded by 1/relativeError) whose
    * 2^bits-1 boundaries per column come back to the driver and ride
    * into a pure projection via [[graft.plans.QuantileBucket]]'s
    * binary search. Zero windows, zero extra shuffles — the previous
    * formulation's unpartitioned `percent_rank` window funnelled the
    * entire dataset through a single task per clustered column, a
    * hard ceiling at lake scale. Boundary rank error is bounded at
    * ~1e-4·n — imperceptible in the file-level layout, which is
    * governed by the top few bits.
    *
    * Columns must be numeric, date, or timestamp (the sketch is
    * numeric); map other types to a numeric key first.
    * `private[graft]` so PlanSpec can pin the no-window plan shape.
    */
  private[graft] def zkey(df: DataFrame, cols: Seq[String], bits: Int): DataFrame = {
    import org.apache.spark.sql.types._
    val nBuckets = 1 << bits
    def rankSpace(c: String): org.apache.spark.sql.Column =
      df.schema(c).dataType match {
        case DateType                         => unix_date(col(c)).cast("double")
        case TimestampType | TimestampNTZType => unix_micros(col(c).cast("timestamp")).cast("double")
        case _: NumericType                   => col(c).cast("double")
        case StringType =>
          // order-preserving numeric surrogate: the first 6 UTF-8
          // bytes, ZERO-padded (space-pad would sort above control
          // bytes) and truncated, read as a big-endian unsigned — 48
          // bits, exact in a double. Monotone under the same unsigned
          // byte order the FileStats sidecar records, so a z-layout on
          // (lang, ts) clusters string point predicates too; values
          // sharing a 6-byte prefix collapse into one rank bucket,
          // which costs clustering resolution only — the sidecar's
          // per-file min/max stays exact, so pruning is never wrong.
          expr(s"CAST(conv(hex(rpad(encode(`$c`, 'UTF-8'), 6, X'00')), 16, 10) AS DOUBLE)")
        case other => throw new IllegalArgumentException(
          s"zorder needs numeric/date/timestamp/string columns, got $c: ${other.simpleString} " +
            "— derive a numeric key for it first")
      }
    // one scan computes every column's sketch; the finest useful
    // resolution is ~1/(4·buckets), floored so the sketch stays small
    // (fine-grained boundary jitter does not move file boundaries)
    val relErr = math.max(1.0 / (4.0 * nBuckets), 1e-4)
    val probs = (1 until nBuckets).map(_.toDouble / nBuckets).toArray
    val proj = df.select(cols.indices.map(i => rankSpace(cols(i)).as(s"q$i")): _*)
    val bounds = proj.stat.approxQuantile(cols.indices.map(i => s"q$i").toArray, probs, relErr)
    val ranked = cols.zipWithIndex.foldLeft(df) { case (d, (c, i)) =>
      d.withColumn(s"_zr$i",
        org.apache.spark.sql.graftbridge.ColumnBridge.column(
          graft.plans.QuantileBucket(
            org.apache.spark.sql.graftbridge.ColumnBridge.expression(rankSpace(c)),
            bounds(i))))
    }
    // interleave: output bit (b * nCols + i) = column i's bit b
    val n = cols.size
    val interleaved = (0 until bits).flatMap { b =>
      (0 until n).map { i =>
        shiftleft(shiftright(col(s"_zr$i"), b).bitwiseAND(1L), b * n + i)
      }
    }.reduce(_.bitwiseOR(_))
    ranked.withColumn("_zkey", interleaved)
  }

  /** Z-ORDER compaction: rewrite a dataset into `numFiles` files
    * range-clustered by the Morton interleave of `cols` — the
    * multi-column file-skipping layout (the single-column form is
    * [[compact]]). After this, a selective predicate on ANY of the
    * clustered columns skips most files/row groups on footer min/max,
    * where a plain sort only helps its leading column. The layout-build
    * cost is one approxQuantile sketch pass plus the write's range
    * partition — no global sorts or windows anywhere (see [[zkey]]);
    * the write itself is the same bounded-file-count range partition
    * as [[compact]].
    * Reserved working columns: `_zkey`, `_zr0..`. */
  def zorder(df: DataFrame, path: String, numFiles: Int, cols: Seq[String],
             format: String = "parquet", bits: Int = 16): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    require(cols.size >= 2, s"zorder needs >= 2 columns (use compact for 1), got $cols")
    require(bits >= 1 && bits * cols.size <= 62,
      s"bits ($bits) x cols (${cols.size}) must fit a long")
    val reserved = ("_zkey" +: cols.indices.map(i => s"_zr$i")).filter(df.columns.contains)
    require(reserved.isEmpty,
      s"zorder reserves working columns ${reserved.mkString(", ")} — rename them on the input")
    zkey(df, cols, bits)
      .repartitionByRange(numFiles, col("_zkey"))
      .sortWithinPartitions(col("_zkey"))
      .drop(("_zkey" +: cols.indices.map(i => s"_zr$i")): _*)
      .write.mode("overwrite").format(format).save(path)
  }

  /** Column-statistics report — the ANALYZE primitive a cost-based
    * planner (broadcast-vs-shuffle, bucket counts, skew suspicion)
    * feeds on. ONE scan of the input regardless of column count: all
    * per-column aggregates run in a single agg pass, then unpivot via
    * `stack` into long form `(col_name, n_rows, n_nulls, ndv, min_s,
    * max_s)` — min/max as strings so the report schema is uniform
    * across column types.
    *
    * `exact = false` (the default, the 100 TB mode) estimates ndv with
    * `approx_count_distinct` — a mergeable HyperLogLog partial
    * aggregate, so the whole report is one map-side-combined pass.
    * `exact = true` uses `count(DISTINCT)` — Catalyst expands the scan
    * per distinct column (cost ×columns), the oracle-checkable mode
    * for bounded inputs (q112).
    */
  def analyze(df: DataFrame, cols: Seq[String], exact: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "analyze needs at least one column")
    val missing = cols.filterNot(df.columns.contains)
    require(missing.isEmpty, s"analyze: no such column(s) ${missing.mkString(", ")}")
    val bad = cols.filter(c => c.contains("'") || c.contains("`"))
    require(bad.isEmpty, s"analyze: quote characters in column name(s) ${bad.mkString(", ")}")
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"cnt_$c"),
        (if (exact) count_distinct(col(c)) else approx_count_distinct(col(c))).as(s"ndv_$c"),
        min(col(c)).cast("string").as(s"min_$c"),
        max(col(c)).cast("string").as(s"max_$c"))
    }
    val one = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val parts = cols.map(c =>
      s"'$c', n_rows, n_rows - `cnt_$c`, `ndv_$c`, `min_$c`, `max_$c`").mkString(", ")
    one.selectExpr(
      s"stack(${cols.size}, $parts) AS (col_name, n_rows, n_nulls, ndv, min_s, max_s)")
  }

  /** Register all ten tables as temp views named after themselves.
    * Idempotent and cheap (footer reads only); cached per (session, dir)
    * so per-query calls don't re-register.
    */
  // weak keys: a closed/discarded session must not be pinned in memory
  // by the catalog memo (long-lived multi-engine JVMs)
  private val registered = scala.collection.mutable.WeakHashMap.empty[SparkSession, String]

  def registerAll(spark: SparkSession, sfDir: String): Unit = synchronized {
    // Keyed by session, value = the dir currently backing its views:
    // switching dirs re-registers (views are named after the tables, so
    // a stale memo would silently serve the previous dir's data).
    if (!registered.get(spark).contains(sfDir)) {
      names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
      graft.functions.GraftFunctions.register(spark)
      registered(spark) = sfDir
    }
  }
}
