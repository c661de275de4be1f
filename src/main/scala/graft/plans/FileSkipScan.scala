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

  /** Per-column (lo, hi) proven by the conjuncts. Strict bounds relax
    * to inclusive (keeps the boundary file — safe); multiple
    * conjuncts on one column intersect. Columns only ever TIGHTEN, so
    * an unrecognized conjunct simply contributes nothing. */
  private def extractBounds(conjuncts: Seq[Expression])
      : Map[String, (Option[BigDecimal], Option[BigDecimal])] = {
    val acc = scala.collection.mutable.Map
      .empty[String, (Option[BigDecimal], Option[BigDecimal])]
    def tighten(name: String, lo: Option[BigDecimal], hi: Option[BigDecimal]): Unit = {
      val (l0, h0) = acc.getOrElse(name, (None, None))
      acc(name) = (
        (l0 ++ lo).reduceOption(_ max _),
        (h0 ++ hi).reduceOption(_ min _))
    }
    conjuncts.foreach {
      case EqualTo(a: AttributeReference, Literal(v, _)) =>
        big(v).foreach(b => tighten(a.name, Some(b), Some(b)))
      case EqualTo(Literal(v, _), a: AttributeReference) =>
        big(v).foreach(b => tighten(a.name, Some(b), Some(b)))
      case EqualNullSafe(a: AttributeReference, Literal(v, _)) if v != null =>
        big(v).foreach(b => tighten(a.name, Some(b), Some(b)))
      case EqualNullSafe(Literal(v, _), a: AttributeReference) if v != null =>
        big(v).foreach(b => tighten(a.name, Some(b), Some(b)))
      case GreaterThan(a: AttributeReference, Literal(v, _)) =>
        big(v).foreach(b => tighten(a.name, Some(b), None))
      case GreaterThanOrEqual(a: AttributeReference, Literal(v, _)) =>
        big(v).foreach(b => tighten(a.name, Some(b), None))
      case LessThan(a: AttributeReference, Literal(v, _)) =>
        big(v).foreach(b => tighten(a.name, None, Some(b)))
      case LessThanOrEqual(a: AttributeReference, Literal(v, _)) =>
        big(v).foreach(b => tighten(a.name, None, Some(b)))
      case GreaterThan(Literal(v, _), a: AttributeReference) =>
        big(v).foreach(b => tighten(a.name, None, Some(b)))
      case GreaterThanOrEqual(Literal(v, _), a: AttributeReference) =>
        big(v).foreach(b => tighten(a.name, None, Some(b)))
      case LessThan(Literal(v, _), a: AttributeReference) =>
        big(v).foreach(b => tighten(a.name, Some(b), None))
      case LessThanOrEqual(Literal(v, _), a: AttributeReference) =>
        big(v).foreach(b => tighten(a.name, Some(b), None))
      case In(a: AttributeReference, list)
          if list.nonEmpty && list.forall(_.isInstanceOf[Literal]) =>
        val vs = list.flatMap(e => big(e.asInstanceOf[Literal].value))
        // every IN member must parse: a non-numeric member means the
        // min/max of the parsed subset is NOT a bound on the whole set
        if (vs.size == list.size) tighten(a.name, Some(vs.min), Some(vs.max))
      case _ => // contributes nothing
    }
    acc.toMap
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
