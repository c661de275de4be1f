package graft.sources

import scala.collection.concurrent.TrieMap
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Session-global registry feeding [[graft.plans.FileSkipScan]]: data
  * file → numeric column → (min, max), harvested from the
  * [[FileStats]] sidecars the managed-table writer already keeps.
  *
  * Why a per-FILE registry instead of per-table: managed data files
  * are copy-on-write IMMUTABLE — a path, once written, never changes
  * content (mutations write new files; VACUUM only deletes). A file's
  * (min, max) is therefore a permanent fact, so the cache needs no
  * invalidation protocol at all: any plan that scans a registered
  * path may be pruned against it, whatever snapshot, version, or
  * query the path reached the plan through. That is what lets the
  * optimizer rule stay stateless — it never has to decide *which
  * table* a relation is, only whether it recognizes the files.
  *
  * Population happens on every managed read ([[ManagedTable]] routes
  * each scan through [[register]]): one sidecar read per (root,
  * version), memoized. Entries are bounded by [[MaxFiles]] — beyond
  * that, new files simply stop registering (they are then never
  * pruned, which is always safe), because an unbounded driver-side
  * map is exactly the kind of 100 TB landmine this engine is not
  * allowed to ship.
  */
object FileSkip {

  /** Hard cap on registered files (min/max strings per numeric column
    * per file ≈ 100 B; 1M files ≈ low hundreds of MB driver heap —
    * the same order as Spark's own FileStatusCache default). */
  val MaxFiles = 1000000

  /** One column's recorded range: the sidecar's verbatim min/max
    * strings (string columns compare these directly under
    * [[FileStats.utf8Compare]]) plus the pre-parsed numeric form when
    * both ends parse (numeric/date/timestamp columns). Probes pick
    * the representation matching the PREDICATE's type — the plan's
    * attribute type always agrees with the type the stats were
    * harvested under (same table, same schema), so there is no
    * cross-type ambiguity. */
  private[graft] final case class ColRange(raw: (String, String),
                                           num: Option[(BigDecimal, BigDecimal)])

  /** A per-column pruning probe: numeric or string, mirroring the two
    * value families the sidecar records. `points`, when present, is
    * the exact admissible value set (an IN list): a file whose range
    * contains NONE of the points is dropped even when the points'
    * [min,max] envelope overlaps it — `id IN (10, 5000)` skips every
    * mid-range file a plain envelope would keep. */
  sealed trait Bound
  final case class NumBound(lo: Option[BigDecimal], hi: Option[BigDecimal],
                            points: Option[Seq[BigDecimal]] = None) extends Bound
  final case class StrBound(lo: Option[String], hi: Option[String],
                            points: Option[Seq[String]] = None) extends Bound

  // qualified file path -> column -> recorded range
  private val byFile = TrieMap.empty[String, Map[String, ColRange]]
  // (root, version) sidecars already folded in
  private val loaded = TrieMap.empty[(String, Int), Unit]

  def isEmpty: Boolean = byFile.isEmpty
  private[graft] def size: Int = byFile.size
  private[graft] def clear(): Unit = { byFile.clear(); loaded.clear() }

  /** Measurement-only kill switch (ScaleBench A/B cells): clearing the
    * registry alone cannot model "skipping off", because the very read
    * under test re-registers its sidecar before the plan optimizes. */
  @volatile private[graft] var disabled: Boolean = false

  /** Fold one snapshot's stats sidecar into the registry (memoized per
    * (root, version); files already present — carried across versions
    * — are not re-parsed). Never throws: a defective sidecar must not
    * break the read it rides on. */
  def register(spark: SparkSession, root: String,
               snap: ManagedTable.Snapshot): Unit =
    try {
      if (loaded.putIfAbsent((root, snap.version), ()).isEmpty) {
        val stats = FileStats.read(spark, root, snap.version)
        if (stats.nonEmpty) {
          val rootPath = new Path(root)
          val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          stats.foreach { case (rel, cols) =>
            if (cols.nonEmpty && byFile.size < MaxFiles) {
              val q = fs.makeQualified(new Path(rootPath, rel)).toString
              if (!byFile.contains(q))
                byFile.put(q, cols.map { case (c, (mn, mx)) =>
                  c -> ColRange((mn, mx),
                    try Some((BigDecimal(mn), BigDecimal(mx)))
                    catch { case _: NumberFormatException => None })
                })
            }
          }
        }
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[file-skip] sidecar for $root v${snap.version} " +
        s"not registered (${e.getMessage}) — scans stay unpruned")
    }

  /** Can any row of `file` (a qualified path string) satisfy every
    * per-column bound? Unregistered files and unconstrained columns
    * always may — pruning is a PROOF of emptiness, never a guess.
    * Bounds are inclusive both ends ([[graft.plans.FileSkipScan]]
    * relaxes strict comparisons to inclusive before calling — keeping
    * a boundary file is safe; dropping one is not). */
  def mayMatch(file: String, bounds: Map[String, Bound]): Boolean =
    byFile.get(file) match {
      case None => true
      case Some(cols) => bounds.forall { case (c, bound) =>
        cols.get(c) match {
          case None => true
          case Some(cr) => bound match {
            case NumBound(lo, hi, points) => cr.num match {
              case None => true // string-valued entry probed numerically: keep
              case Some((mn, mx)) =>
                lo.forall(l => mx >= l) && hi.forall(h => mn <= h) &&
                  points.forall(_.exists(p => p >= mn && p <= mx))
            }
            case StrBound(lo, hi, points) =>
              val (mn, mx) = cr.raw
              lo.forall(l => FileStats.utf8Compare(mx, l) >= 0) &&
                hi.forall(h => FileStats.utf8Compare(mn, h) <= 0) &&
                points.forall(_.exists(p =>
                  FileStats.utf8Compare(p, mn) >= 0 &&
                    FileStats.utf8Compare(p, mx) <= 0))
          }
        }
      }
    }
}
