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

  /** Types whose parquet footer stats are totally ordered values we
    * can compare. Timestamps and dates qualify: Spark writes them as
    * INT64 micros / INT32 days, their footer stats come back as plain
    * longs/ints in those units, and Catalyst literals carry the SAME
    * units — so pruning is ordinary integer comparison (the lakehouse
    * bread-and-butter: time-range predicates over time-clustered
    * files). STRINGS qualify too: parquet's BINARY min/max for UTF8
    * columns uses unsigned lexicographic byte order, which is exactly
    * UTF-8 code-point order — the same total order Spark's
    * UTF8String comparison (default UTF8_BINARY collation) uses, so a
    * `lang = 'de'` point predicate prunes string-clustered files
    * correctly ([[utf8Compare]] is that shared order). Decimals come
    * back as unscaled Binary — out of scope, never pruned (safe).
    */
  private[graft] def isRangeType(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | FloatType |
         DoubleType | DateType | TimestampType | TimestampNTZType => true
    case StringType => true
    case _ => false
  }

  /** The shared total order for string pruning: unsigned lexicographic
    * over UTF-8 bytes — identical to parquet's UNSIGNED Binary
    * comparator (what the footer min/max was computed under) AND to
    * Spark's UTF8String ordering, and therefore to code-point order.
    * Java's `String.compareTo` is NOT this order (UTF-16 code units
    * sort surrogate pairs below U+E000..U+FFFF), so using it would
    * mis-prune supplementary-plane boundaries. */
  private[graft] def utf8Compare(a: String, b: String): Int = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(x.length, y.length)
    var i = 0
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    x.length - y.length
  }

  /** Does this parquet column's PHYSICAL representation carry footer
    * stats whose values are directly comparable to Catalyst literals
    * of `dt` — same primitive, same logical-type UNIT? The unit check
    * is the safety gate: a legacy file written under
    * `outputTimestampType=TIMESTAMP_MILLIS` stores millis stats, and
    * comparing those against Catalyst's micros literals would wrongly
    * prune files (silently dropping rows). Any mismatch — wrong
    * primitive (INT96 timestamps), wrong unit, missing annotation —
    * drops the column from the sidecar, so those files are simply
    * always kept. */
  private[graft] def footerComparable(
      dt: DataType, pt: org.apache.parquet.schema.PrimitiveType): Boolean = {
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.schema.LogicalTypeAnnotation
    val tn = pt.getPrimitiveTypeName
    val la = pt.getLogicalTypeAnnotation
    dt match {
      case ByteType | ShortType | IntegerType =>
        tn == INT32 &&
          (la == null || la.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation])
      case LongType =>
        tn == INT64 &&
          (la == null || la.isInstanceOf[LogicalTypeAnnotation.IntLogicalTypeAnnotation])
      case FloatType => tn == FLOAT
      case DoubleType => tn == DOUBLE
      case DateType =>
        tn == INT32 && la.isInstanceOf[LogicalTypeAnnotation.DateLogicalTypeAnnotation]
      case TimestampType | TimestampNTZType =>
        tn == INT64 && (la match {
          case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
            t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS
          case _ => false
        })
      case StringType =>
        tn == BINARY && la.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation]
      case _ => false
    }
  }

  private[graft] def statsPath(root: String, v: Int) =
    new Path(root, f"_graft_log/v$v%08d.stats.json")

  /** Harvest (min, max) per requested column from ONE file's footer —
    * row-group stats merged per column. `cols` maps each wanted column
    * to its TABLE type, so every chunk's physical+logical parquet type
    * is validated against it ([[footerComparable]]) before its stats
    * are trusted — a millis-unit timestamp file or an INT96 legacy
    * file contributes nothing and stays always-kept. Returns only
    * columns with a usable range; anything doubtful is absent (→ the
    * file is kept). String values are recorded verbatim (UTF-8
    * decoded); numerics as plain decimal strings.
    */
  private[graft] def harvest(spark: SparkSession, root: String, rel: String,
                               cols: Map[String, DataType]): Map[String, (String, String)] = {
    val in = HadoopInputFile.fromPath(new Path(root, rel),
      spark.sparkContext.hadoopConfiguration)
    val r = ParquetFileReader.open(in)
    try {
      val num = scala.collection.mutable.Map[String, (BigDecimal, BigDecimal)]()
      val str = scala.collection.mutable.Map[String, (String, String)]()
      val bad = scala.collection.mutable.Set[String]()
      for (b <- r.getFooter.getBlocks.asScala; c <- b.getColumns.asScala) {
        val name = c.getPath.toDotString
        val dt = cols.get(name)
        if (dt.isDefined && !bad(name)) {
          val st = c.getStatistics
          if (st == null || st.isEmpty) bad += name // no stats: cannot prune
          else if (!footerComparable(dt.get, c.getPrimitiveType)) bad += name
          else if (st.hasNonNullValue) {
            if (dt.get == StringType) {
              val mn = st.genericGetMin.asInstanceOf[org.apache.parquet.io.api.Binary]
                .toStringUsingUTF8
              val mx = st.genericGetMax.asInstanceOf[org.apache.parquet.io.api.Binary]
                .toStringUsingUTF8
              str(name) = str.get(name).fold((mn, mx)) { case (a, b) =>
                (if (utf8Compare(mn, a) < 0) mn else a,
                 if (utf8Compare(mx, b) > 0) mx else b)
              }
            } else {
              try {
                val mn = BigDecimal(st.genericGetMin.toString)
                val mx = BigDecimal(st.genericGetMax.toString)
                val merged = num.get(name).fold((mn, mx))(p => (p._1.min(mn), p._2.max(mx)))
                num(name) = merged
              } catch { case _: NumberFormatException => bad += name } // NaN etc.
            }
          }
          // all-null row group: contributes no range — a range predicate
          // never matches NULL, so ignoring it is correct
        }
      }
      bad.foreach { n => num.remove(n); str.remove(n) }
      num.map { case (k, (mn, mx)) =>
        k -> (mn.bigDecimal.toPlainString, mx.bigDecimal.toPlainString)
      }.toMap ++ str.toMap
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
    // keyed by PHYSICAL names — what the footers (and any pushed-down
    // predicate over the scan relation) actually carry
    val rangeCols = snap.schema.fields.filter(f => isRangeType(f.dataType))
      .map(f => snap.physicalName(f.name) -> f.dataType).toMap
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
        case Some((mn, mx)) =>
          // a string-valued or otherwise unparseable entry keeps the
          // file — pruning is a proof, never a guess
          try !(BigDecimal(mx) < lo || BigDecimal(mn) > hi)
          catch { case _: NumberFormatException => true }
        case None => true
      }
    }

  /** String-column variant of [[prune]]: same drop-only-on-proof
    * contract, under the [[utf8Compare]] total order. */
  private[graft] def pruneStr(stats: Stats, files: Seq[String], colName: String,
                              lo: String, hi: String): Seq[String] =
    files.filter { f =>
      stats.get(f).flatMap(_.get(colName)) match {
        case Some((mn, mx)) =>
          !(utf8Compare(mx, lo) < 0 || utf8Compare(mn, hi) > 0)
        case None => true
      }
    }
}
