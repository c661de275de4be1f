package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, InMemoryFileIndex, LogicalRelation}
import org.apache.spark.sql.types.Decimal
import graft.sources.FileSkip

/** Manifest-level data skipping for PLAIN SQL — the optimizer rule
  * that makes `OPTIMIZE ... BY (col)` / `ZORDER BY` layouts pay off in
  * any `SELECT ... WHERE`, not only through the explicit
  * [[graft.sources.ManagedTable.readRange]] API.
  *
  * For every `Filter` directly over a multi-file parquet relation, the
  * rule extracts per-column range bounds from the conjuncts it can
  * prove (`=`, `<`, `<=`, `>`, `>=`, `BETWEEN`'s two conjuncts,
  * `IN (literals)` — attribute vs. foldable numeric literal, either
  * side), asks [[graft.sources.FileSkip]] which of the scan's files
  * could possibly hold a matching row, and rebuilds the relation over
  * the survivors. The original `Filter` STAYS on top — pruning is a
  * superset guarantee, the filter is the semantics — so a defect here
  * can cost performance but never correctness, and strict comparisons
  * may be safely relaxed to inclusive bounds for the pruning test.
  *
  * Files the registry does not know (non-managed tables, pre-stats
  * versions, all-null or non-numeric columns) are always kept. At the
  * target scale this is the difference between the driver opening 10⁶
  * parquet footers to discover emptiness and ONE in-memory map probe
  * per file: footer min/max pruning still applies to the survivors,
  * this rule just refuses to plan a scan over files the manifest
  * already proves empty.
  *
  * Idempotent under the fixed-point extraOptimizations batch: a pruned
  * relation re-prunes to itself (the rule rewrites only when the kept
  * set is strictly smaller). Like [[StatsJoinPlanner]], any internal
  * defect degrades to the stock plan with a stderr line, never a
  * failed query.
  */
class FileSkipScan extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (FileSkip.isEmpty || FileSkip.disabled) return plan
    try applyUnsafe(plan)
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[file-skip] disabled for this plan: ${e.getMessage}")
      plan
    }
  }

  private def applyUnsafe(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case f @ Filter(cond, l: LogicalRelation) =>
      l.relation match {
        case r: HadoopFsRelation if r.partitionSchema.isEmpty =>
          val bounds = extractBounds(splitConjunctivePredicates(cond))
          if (bounds.isEmpty) f
          else {
            val files = r.location.rootPaths
            val keep = files.filter(p => FileSkip.mayMatch(p.toString, bounds))
            if (keep.size >= files.size) f
            else {
              val idx = new InMemoryFileIndex(r.sparkSession, keep, Map.empty,
                Some(r.dataSchema))
              val nr = r.copy(location = idx)(r.sparkSession)
              f.copy(child = l.copy(relation = nr))
            }
          }
        case _ => f
      }
  }

  /** Literal value as BigDecimal, exactly mirroring the sidecar's
    * representation discipline: floats go through their shortest
    * round-trip string (see ManagedTable.readRange's float note — a
    * double-widened 0.1f would sort above the "0.1" the sidecar
    * recorded and mis-prune a boundary file). */
  private def big(v: Any): Option[BigDecimal] = v match {
    case null => None
    case n: Byte => Some(BigDecimal(n.toInt))
    case n: Short => Some(BigDecimal(n.toInt))
    case n: Int => Some(BigDecimal(n))
    case n: Long => Some(BigDecimal(n))
    case n: Float => if (n.isNaN || n.isInfinite) None else Some(BigDecimal(n.toString))
    case n: Double => if (n.isNaN || n.isInfinite) None else Some(BigDecimal(n))
    case d: Decimal => Some(d.toBigDecimal)
    case _ => None
  }

  /** A string literal's value for a DEFAULT-collation string
    * attribute. Non-default collations (UTF8_LCASE etc.) order
    * differently from the sidecar's UTF-8 byte order, so their
    * predicates must never prune — the type equality check with the
    * plain `StringType` singleton excludes them. */
  private def str(a: AttributeReference, v: Any): Option[String] =
    if (a.dataType != org.apache.spark.sql.types.StringType) None
    else v match {
      case null => None
      case s: org.apache.spark.unsafe.types.UTF8String => Some(s.toString)
      case s: String => Some(s)
      case _ => None
    }

  /** Per-column probes proven by the conjuncts — numeric bounds for
    * numeric/date/timestamp attributes, string bounds (UTF-8 byte
    * order) for default-collation string attributes, plus a NULLNESS
    * requirement from `IS [NOT] NULL` conjuncts (any range/point
    * predicate implies NOT NULL — a comparison never matches a null
    * row). Strict bounds relax to inclusive (keeps the boundary file —
    * safe); multiple conjuncts on one column intersect. Columns only
    * ever TIGHTEN, so an unrecognized conjunct simply contributes
    * nothing. */
  private def extractBounds(conjuncts: Seq[Expression])
      : Map[String, FileSkip.Pred] = {
    val nacc = scala.collection.mutable.Map
      .empty[String, (Option[BigDecimal], Option[BigDecimal])]
    val sacc = scala.collection.mutable.Map
      .empty[String, (Option[String], Option[String])]
    // exact admissible value sets from equality and IN lists
    // (intersected when a column carries several) — lets
    // `id IN (10, 5000)` drop the mid-range files the [10,5000]
    // envelope alone would keep, and contradictory equalities prove
    // emptiness outright
    val npts = scala.collection.mutable.Map.empty[String, Set[BigDecimal]]
    val spts = scala.collection.mutable.Map.empty[String, Set[String]]
    // IS NULL (true) / IS NOT NULL (false); a conflicting pair is a
    // provably-empty conjunction — either choice is sound, keep `true`
    val nullAcc = scala.collection.mutable.Map.empty[String, Boolean]
    def tighten(name: String, lo: Option[BigDecimal], hi: Option[BigDecimal]): Unit = {
      val (l0, h0) = nacc.getOrElse(name, (None, None))
      nacc(name) = (
        (l0 ++ lo).reduceOption(_ max _),
        (h0 ++ hi).reduceOption(_ min _))
    }
    def smax(a: String, b: String) =
      if (graft.sources.FileStats.utf8Compare(a, b) >= 0) a else b
    def smin(a: String, b: String) =
      if (graft.sources.FileStats.utf8Compare(a, b) <= 0) a else b
    def tightenStr(name: String, lo: Option[String], hi: Option[String]): Unit = {
      val (l0, h0) = sacc.getOrElse(name, (None, None))
      sacc(name) = ((l0 ++ lo).reduceOption(smax), (h0 ++ hi).reduceOption(smin))
    }
    // one point/low/high dispatcher per side so numeric and string
    // attributes share the comparison-shape cases below
    def point(a: AttributeReference, v: Any): Unit = {
      big(v).foreach { b =>
        tighten(a.name, Some(b), Some(b))
        npts(a.name) = npts.get(a.name).fold(Set(b))(_ intersect Set(b))
      }
      str(a, v).foreach { s =>
        tightenStr(a.name, Some(s), Some(s))
        spts(a.name) = spts.get(a.name).fold(Set(s))(_ intersect Set(s))
      }
    }
    def low(a: AttributeReference, v: Any): Unit = {
      big(v).foreach(b => tighten(a.name, Some(b), None))
      str(a, v).foreach(s => tightenStr(a.name, Some(s), None))
    }
    def high(a: AttributeReference, v: Any): Unit = {
      big(v).foreach(b => tighten(a.name, None, Some(b)))
      str(a, v).foreach(s => tightenStr(a.name, None, Some(s)))
    }
    conjuncts.foreach {
      case EqualTo(a: AttributeReference, Literal(v, _)) => point(a, v)
      case EqualTo(Literal(v, _), a: AttributeReference) => point(a, v)
      case EqualNullSafe(a: AttributeReference, Literal(v, _)) if v != null =>
        point(a, v)
      case EqualNullSafe(Literal(v, _), a: AttributeReference) if v != null =>
        point(a, v)
      case GreaterThan(a: AttributeReference, Literal(v, _)) => low(a, v)
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) => low(a, v)
      case LessThan(a: AttributeReference, Literal(v, _)) => high(a, v)
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) => high(a, v)
      case GreaterThan(Literal(v, _), a: AttributeReference) => high(a, v)
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) => high(a, v)
      case LessThan(Literal(v, _), a: AttributeReference) => low(a, v)
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) => low(a, v)
      case In(a: AttributeReference, list)
          if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        val raw = list.map(_.asInstanceOf[Literal].value)
        val nvs = raw.flatMap(big)
        val svs = raw.flatMap(str(a, _))
        // every IN member must convert: a partial subset's min/max is
        // NOT a bound on the whole set
        if (nvs.size == list.size) {
          tighten(a.name, Some(nvs.min), Some(nvs.max))
          npts(a.name) = npts.get(a.name).fold(nvs.toSet)(_ intersect nvs.toSet)
        } else if (svs.size == list.size) {
          tightenStr(a.name, Some(svs.reduce(smin)), Some(svs.reduce(smax)))
          spts(a.name) = spts.get(a.name).fold(svs.toSet)(_ intersect svs.toSet)
        }
      case IsNull(a: AttributeReference) =>
        nullAcc(a.name) = true
      case IsNotNull(a: AttributeReference) =>
        if (!nullAcc.getOrElse(a.name, false)) nullAcc(a.name) = false
      case _ => // contributes nothing
    }
    val ranges: Map[String, FileSkip.Bound] =
      nacc.map { case (c, (lo, hi)) =>
        c -> (FileSkip.NumBound(lo, hi, npts.get(c).map(_.toSeq)): FileSkip.Bound)
      }.toMap ++
        sacc.map { case (c, (lo, hi)) =>
          c -> (FileSkip.StrBound(lo, hi, spts.get(c).map(_.toSeq)): FileSkip.Bound)
        }
    // bloom probe keys: the md5 base hashes of every admissible point,
    // hashed ONCE here (m varies per file, so the mod happens at probe
    // time). Canonical forms mirror FileBloom's write side exactly:
    // whole-number decimal strings for integral columns (a fractional
    // point on an integral column just skips the bloom — the range
    // probe already proves what it can), verbatim strings otherwise.
    val bloomKeys: Map[String, Seq[Array[Long]]] =
      (npts.map { case (c, pts) =>
        val whole = pts.toSeq.flatMap(_.toBigIntExact)
        c -> (if (whole.size == pts.size)
                Some(whole.map(b => graft.sources.FileBloom.baseHashes(b.toString)))
              else None)
      } ++ spts.map { case (c, pts) =>
        c -> Some(pts.toSeq.map(graft.sources.FileBloom.baseHashes))
      }).collect { case (c, Some(ks)) => c -> ks }.toMap
    (ranges.keySet ++ nullAcc.keySet).map { c =>
      // a range/point predicate only matches non-null rows, so a
      // range-bounded column is implicitly NOT NULL unless an explicit
      // IS NULL (making the conjunction provably empty) says otherwise
      val nullness = nullAcc.get(c)
        .orElse(if (ranges.contains(c)) Some(false) else None)
      c -> FileSkip.Pred(ranges.get(c), nullness, bloomKeys.get(c))
    }.toMap
  }
}

object FileSkipScan {
  /** Append the rule to the session's extraOptimizations once (the
    * same public install route as [[StatsJoinPlanner]] — no
    * SparkSessionExtensions config needed on plain sessions). */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[FileSkipScan]))
      spark.experimental.extraOptimizations = cur :+ new FileSkipScan
  }
}
