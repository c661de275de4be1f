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

  /** One column's full probe: an optional value range, an optional
    * NULLNESS requirement — `Some(true)` = every matching row is NULL
    * in the column (`IS NULL`), `Some(false)` = non-null (`IS NOT
    * NULL`, also implied by any range/point predicate, which never
    * matches NULL) — and optional pre-hashed point-lookup keys for the
    * bloom probe. Nullness prunes against the v2 sidecar's exact
    * per-file null counts: an all-null file fails `Some(false)`, a
    * zero-null file fails `Some(true)` — the most common cleaning
    * predicates (`WHERE x IS NOT NULL`) over a mostly-dirty or
    * mostly-clean layout become file skips. `bloomKeys` (the md5 base
    * hashes of every admissible point value, computed ONCE per query,
    * not per file) drops any file whose bloom filter proves it holds
    * NONE of the points — the unclustered-layout point-lookup path
    * min/max can never serve. */
  final case class Pred(range: Option[Bound], nullness: Option[Boolean],
                        bloomKeys: Option[Seq[Array[Long]]] = None)

  /** Everything the registry knows about one immutable data file:
    * per-column ranges, exact row count / per-column null counts when
    * the sidecar generation that recorded it proved them, and any
    * bloom filters a configured index harvested. */
  private[graft] final case class FileInfo(cols: Map[String, ColRange],
                                           rows: Option[Long],
                                           nulls: Map[String, Long],
                                           blooms: Map[String, FileBloom.Bloom] =
                                             Map.empty)

  // qualified file path -> everything recorded about it
  private val byFile = TrieMap.empty[String, FileInfo]
  // (root, version) sidecars already folded in
  private val loaded = TrieMap.empty[(String, Int), Unit]

  def isEmpty: Boolean = byFile.isEmpty
  private[graft] def size: Int = byFile.size
  private[graft] def clear(): Unit = {
    byFile.clear(); loaded.clear(); FileBloom.clearAll()
  }

  /** Forget everything registered under `root` — the re-registration
    * hook a bloom-index BACKFILL needs (already-cached FileInfo entries
    * predate the new sidecar; immutability makes entries permanent
    * facts EXCEPT when a new index adds information to them). */
  private[graft] def invalidate(spark: SparkSession, root: String): Unit = {
    val rootPath = new Path(root)
    val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prefix = fs.makeQualified(rootPath).toString + "/"
    loaded.keys.filter(_._1 == root).foreach(loaded.remove)
    byFile.keys.filter(_.startsWith(prefix)).foreach(byFile.remove)
    FileBloom.invalidate(root) // re-deliver every shard on re-register
  }

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
        val (stats, extras) = FileStats.readAll(spark, root, snap.version)
        // delta semantics: only bloom shards not yet folded into this
        // registry re-parse (the gain-only merge below makes repeated
        // registrations additive, whatever order versions arrive in)
        val blooms = FileBloom.readDelta(spark, root, snap.version)
        if (stats.nonEmpty || blooms.nonEmpty) {
          val rootPath = new Path(root)
          val fs = rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
          (stats.keySet ++ blooms.keySet).foreach { rel =>
            val cols = stats.getOrElse(rel, Map.empty)
            val extra = extras.get(rel)
            val bl = blooms.getOrElse(rel, Map.empty)
            if ((cols.nonEmpty || extra.nonEmpty || bl.nonEmpty) &&
                byFile.size < MaxFiles) {
              val q = fs.makeQualified(new Path(rootPath, rel)).toString
              val fresh = FileInfo(
                cols.map { case (c, (mn, mx)) =>
                  c -> ColRange((mn, mx),
                    try Some((BigDecimal(mn), BigDecimal(mx)))
                    catch { case _: NumberFormatException => None })
                },
                extra.map(_.rows),
                extra.map(_.nulls).getOrElse(Map.empty),
                bl)
              byFile.get(q) match {
                case None => byFile.put(q, fresh): Unit
                case Some(old) =>
                  // The file is immutable, so each sidecar generation
                  // only ever ADDS information about it (v2 row/null
                  // counts, bloom filters a later index harvested).
                  // An entry cached from an older-generation sidecar —
                  // e.g. a time-travel read of a pre-bloom version
                  // registering the shared files first — must still
                  // gain what this sidecar proves, or bloom/nullness
                  // pruning silently depends on read ORDER.
                  val merged = FileInfo(
                    old.cols ++ fresh.cols.filterNot(kv => old.cols.contains(kv._1)),
                    old.rows.orElse(fresh.rows),
                    old.nulls ++ fresh.nulls.filterNot(kv => old.nulls.contains(kv._1)),
                    old.blooms ++ fresh.blooms.filterNot(kv => old.blooms.contains(kv._1)))
                  if (merged != old) byFile.put(q, merged): Unit
              }
            }
          }
        }
      }
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[file-skip] sidecar for $root v${snap.version} " +
        s"not registered (${e.getMessage}) — scans stay unpruned")
    }

  /** Can any row of `file` (a qualified path string) satisfy every
    * per-column probe? Unregistered files and unconstrained columns
    * always may — pruning is a PROOF of emptiness, never a guess.
    * Range bounds are inclusive both ends ([[graft.plans.FileSkipScan]]
    * relaxes strict comparisons to inclusive before calling — keeping
    * a boundary file is safe; dropping one is not). Nullness prunes
    * only on the sidecar's EXACT counts: `IS NULL` drops a file whose
    * null count is proven 0; `IS NOT NULL` drops one whose null count
    * equals its row count (all-null — which the min/max probe alone
    * can never catch, because an all-null column records no range). */
  def mayMatch(file: String, bounds: Map[String, Pred]): Boolean =
    byFile.get(file) match {
      case None => true
      case Some(info) => bounds.forall { case (c, pred) =>
        val rangeOk = pred.range.forall { bound =>
          info.cols.get(c) match {
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
        val nullOk = pred.nullness.forall {
          case true => !info.nulls.get(c).contains(0L)
          case false =>
            !(info.rows.isDefined && info.nulls.get(c) == info.rows)
        }
        // bloom: keep only if SOME admissible point might be present.
        // An empty point set (contradictory equalities) proves
        // emptiness; a file without a filter for the column is kept.
        val bloomOk = pred.bloomKeys.forall { keys =>
          info.blooms.get(c) match {
            case None => true
            case Some(b) => keys.exists(b.mightContain)
          }
        }
        rangeOk && nullOk && bloomOk
      }
    }
}
