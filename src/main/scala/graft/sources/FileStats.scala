package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

/** Per-data-file column statistics for [[ManagedTable]] — the
  * data-skipping index every production lakehouse format keeps in its
  * metadata layer. Each commit writes a stats SIDECAR
  * (`_graft_log/v%08d.stats.json`) mapping data file → numeric column
  * → (min, max), and a range read ([[ManagedTable.readRange]]) prunes
  * the file list against it BEFORE the scan is planned.
  *
  * Why this exists when parquet footers already hold min/max: footer
  * pruning happens inside the scan, after every file is listed and its
  * footer opened — at 10⁶ files that is 10⁶ metadata reads per query.
  * Manifest-level stats answer the same question from ONE driver-side
  * sidecar read, which is the difference between O(files) and O(1)
  * planning I/O at 100 TB.
  *
  * Cost discipline: stats are harvested from the parquet FOOTERS the
  * writer just produced (no second data scan), only for files not
  * already covered by the previous sidecar — so a metadata-only commit
  * (restore, add_column) re-harvests nothing, and an insert harvests
  * exactly its new files.
  *
  * Safety discipline: pruning must never change results. A file with
  * no entry for the probed column (old sidecar, all-null column,
  * non-numeric type, unparseable stats) is always KEPT; the residual
  * filter applies to every surviving row. NaN min/max (possible for
  * float columns) fails the numeric parse and drops the column's
  * entry — conservative, never wrong.
  */
object FileStats {

  /** file (root-relative) → column → (min, max) as plain decimal strings. */
  type Stats = Map[String, Map[String, (String, String)]]

  /** Types whose parquet footer stats are totally ordered numerics we
    * can compare as BigDecimal. Timestamps and dates qualify: Spark
    * writes them as INT64 micros / INT32 days, their footer stats
    * come back as plain longs/ints in those units, and Catalyst
    * literals carry the SAME units — so the whole pruning pipeline is
    * ordinary integer comparison (the lakehouse bread-and-butter:
    * time-range predicates over time-clustered files). Strings and
    * decimals come back as Binary with ordering caveats — out of
    * scope, so columns of those types simply never prune (safe).
    */
  private[graft] def isRangeType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | DateType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  private[graft] def statsPath(root: String, v: Int) =
    new Path(root, f"_graft_log/v$v%08d.stats.json")

  /** Harvest (min, max) per requested column from ONE file's footer —
    * row-group stats merged per column. Returns only columns with a
    * usable range; anything doubtful is absent (→ the file is kept).
    */
  private[graft] def harvest(spark: SparkSession, root: String, rel: String,
                               cols: Set[String]): Map[String, (String, String)] = {
    val in = HadoopInputFile.fromPath(new Path(root, rel),
      spark.sparkContext.hadoopConfiguration)
    val r = ParquetFileReader.open(in)
    try {
      val acc = scala.collection.mutable.Map[String, (BigDecimal, BigDecimal)]()
      val bad = scala.collection.mutable.Set[String]()
      for (b <- r.getFooter.getBlocks.asScala; c <- b.getColumns.asScala) {
        val name = c.getPath.toDotString
        if (cols(name) && !bad(name)) {
          val st = c.getStatistics
          if (st == null || st.isEmpty) bad += name // no stats: cannot prune
          else if (st.hasNonNullValue) {
            try {
              val mn = BigDecimal(st.genericGetMin.toString)
              val mx = BigDecimal(st.genericGetMax.toString)
              val merged = acc.get(name).fold((mn, mx))(p => (p._1.min(mn), p._2.max(mx)))
              acc(name) = merged
            } catch { case _: NumberFormatException => bad += name } // NaN etc.
          }
          // all-null row group: contributes no range — a range predicate
          // never matches NULL, so ignoring it is correct
        }
      }
      bad.foreach(acc.remove)
      acc.map { case (k, (mn, mx)) =>
        k -> (mn.bigDecimal.toPlainString, mx.bigDecimal.toPlainString)
      }.toMap
    } finally r.close()
  }

  // -- sidecar (de)serialization, same minimal discipline as the manifest --

  private[graft] def render(stats: Stats): String = {
    val files = stats.toSeq.sortBy(_._1).map { case (f, cols) =>
      val cs = cols.toSeq.sortBy(_._1).map { case (c, (mn, mx)) =>
        s"${graft.util.Json.escape(c)}:[${graft.util.Json.escape(mn)},${graft.util.Json.escape(mx)}]"
      }.mkString("{", ",", "}")
      s"${graft.util.Json.escape(f)}:$cs"
    }.mkString("{", ",", "}")
    s"""{"files":$files}"""
  }

  private[graft] def parse(text: String): Stats = {
    var i = 0
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"stats sidecar: $msg at offset $i")
    def expect(c: Char): Unit = {
      if (i >= text.length || text.charAt(i) != c) fail(s"expected '$c'")
      i += 1
    }
    def parseStr(): String = {
      expect('"')
      val sb = new StringBuilder
      while (text.charAt(i) != '"') {
        text.charAt(i) match {
          // exact inverse of Json.escape: \" \\ \n \r \t \uXXXX. A raw
          // append of the escaped char would turn a control character
          // in a file/column name into a DIFFERENT string, silently
          // desynchronizing sidecar keys from manifest file names
          // (those files would then never prune and re-harvest forever).
          case '\\' =>
            text.charAt(i + 1) match {
              case 'n' => sb.append('\n'); i += 2
              case 'r' => sb.append('\r'); i += 2
              case 't' => sb.append('\t'); i += 2
              case 'u' =>
                sb.append(Integer.parseInt(text.substring(i + 2, i + 6), 16).toChar)
                i += 6
              case c @ ('"' | '\\') => sb.append(c); i += 2
              case c => fail(s"unknown escape '\\$c'")
            }
          case c => sb.append(c); i += 1
        }
      }
      i += 1
      sb.toString
    }
    def parsePair(): (String, String) = {
      expect('['); val mn = parseStr(); expect(','); val mx = parseStr(); expect(']')
      (mn, mx)
    }
    def parseCols(): Map[String, (String, String)] = {
      expect('{')
      val m = Map.newBuilder[String, (String, String)]
      if (text.charAt(i) == '}') { i += 1; return m.result() }
      var more = true
      while (more) {
        val c = parseStr(); expect(':'); m += c -> parsePair()
        if (text.charAt(i) == ',') i += 1 else more = false
      }
      expect('}')
      m.result()
    }
    val fi = text.indexOf("\"files\":")
    if (fi < 0) fail("missing field 'files'")
    i = fi + 8
    expect('{')
    val out = Map.newBuilder[String, Map[String, (String, String)]]
    if (i < text.length && text.charAt(i) == '}') return out.result()
    var more = true
    while (more) {
      val f = parseStr(); expect(':'); out += f -> parseCols()
      if (text.charAt(i) == ',') i += 1 else more = false
    }
    expect('}')
    out.result()
  }

  /** The stats sidecar for `version`, or empty if never written /
    * vacuumed away (readers then keep every file — safe).
    */
  def read(spark: SparkSession, root: String, version: Int): Stats = {
    val f = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val p = statsPath(root, version)
    if (!f.exists(p)) return Map.empty
    val in = f.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
    finally in.close()
    parse(text)
  }

  /** Write the sidecar for a just-committed snapshot: previous
    * sidecar entries are REUSED for carried files (restricted to the
    * snapshot's file list); only files the previous sidecar does not
    * cover get a footer harvest. Overwrite is safe — the manifest's
    * exclusive create already picked the unique winner for this
    * version.
    */
  private[graft] def write(spark: SparkSession, root: String,
                             snap: ManagedTable.Snapshot,
                             prev: Stats): Unit = {
    val rangeCols = snap.schema.fields.filter(f => isRangeType(f.dataType))
      .map(_.name).toSet
    val merged: Stats = snap.files.map { f =>
      f -> prev.getOrElse(f,
        if (rangeCols.isEmpty) Map.empty[String, (String, String)]
        else harvest(spark, root, f, rangeCols))
    }.toMap
    val fsys = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fsys.create(statsPath(root, snap.version), /*overwrite=*/ true)
    try out.write(render(merged).getBytes("UTF-8")) finally out.close()
  }

  /** The surviving file list for `lo <= colName <= hi`: a file is
    * dropped only when its recorded range PROVES no row can match
    * (max < lo or min > hi); files without a recorded range are kept.
    */
  private[graft] def prune(stats: Stats, files: Seq[String], colName: String,
                           lo: BigDecimal, hi: BigDecimal): Seq[String] =
    files.filter { f =>
      stats.get(f).flatMap(_.get(colName)) match {
        case Some((mn, mx)) => !(BigDecimal(mx) < lo || BigDecimal(mn) > hi)
        case None => true
      }
    }
}
