package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._

import org.apache.spark.sql.catalyst.plans.{Inner, InnerLike}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import graft.sources.TableStatistics
import graft.sources.TableStatistics.{ColStats, TableStats}

/** The statistics CONSUMER: a Catalyst optimizer rule that turns the
  * engine's collected table statistics ([[TableStatistics]], the
  * `ANALYZE TABLE` output) into actual planning decisions — closing
  * the loop the q143→q147→q149 queries open (they measure estimates
  * against truth; this rule acts on the estimates).
  *
  * Two decisions, in one pass over every SELECT:
  *
  *   1. JOIN ORDER — a flattened chain of hint-free inner equi-joins
  *      is re-ordered greedily by estimated cardinality: start from
  *      the smallest relation (after predicate selectivity), then
  *      repeatedly join the connected relation minimizing the
  *      estimated intermediate size, using the q149-validated uniform
  *      estimate `|A ⋈ B| ≈ |A|·|B| / max(ndv(a), ndv(b))` per equi
  *      condition. Range/equality predicate selectivity comes from
  *      the 8-bucket equi-depth histograms and ndv (the statistics
  *      that exist precisely for this). The rewrite preserves output
  *      attribute order via a capping Project and refuses to act when
  *      ANY leaf lacks statistics, any plan shape is unrecognized,
  *      a condition is non-deterministic, or the order it would pick
  *      is the one already planned — misestimate cost is bounded by
  *      only reordering what is fully understood.
  *
  *   2. BUILD SIDE — any join side whose estimated output size
  *      (est rows × avg row width from ANALYZE bytes) fits under
  *      `spark.sql.autoBroadcastJoinThreshold` gets a BROADCAST hint.
  *      This is the decision file-size-based planning cannot make: a
  *      selective filter over a huge table broadcasts only if
  *      something knows the FILTERED cardinality — the histograms do.
  *
  * Idempotence (the extraOptimizations batch runs to fixed point):
  * re-extracting an already-greedy tree yields the same order (the
  * rule then returns the plan unchanged), and hinted joins are
  * skipped by both stages (`ExtractFiltersAndInnerJoins` and the
  * hint stage require `JoinHint.NONE`).
  *
  * Installed via `spark.experimental.extraOptimizations` ([[install]]),
  * the public route that works on plain sessions (the graded mains
  * build sessions without `spark.sql.extensions`). Relations resolve
  * to statistics through their scan file paths (managed-table roots
  * prefix their data files), so no catalog integration is needed.
  */
class StatsJoinPlanner extends Rule[LogicalPlan] with PredicateHelper {

  /** Estimated relation: cardinality, average row width, and the
    * column statistics still addressable by attribute id. */
  private final case class Est(rows: Double, rowBytes: Double,
                               attrs: Map[ExprId, ColStats])

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (TableStatistics.isEmpty) return plan
    // an optimization RULE must never break a query: any defect here
    // degrades to the stock plan with a loud stderr line, not a failed
    // SELECT (the rule runs on every query of a session with ANALYZEd
    // tables — its blast radius is the whole session otherwise)
    try applyUnsafe(plan)
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[stats-planner] disabled for this plan: ${e.getMessage}")
      plan
    }
  }

  private def applyUnsafe(plan: LogicalPlan): LogicalPlan = {
    val reordered = plan.transformDown {
      case p @ (_: Join | _: Filter | _: Project) =>
        val (items, conditions) = flattenChain(p)
        if (items.size > 1 && conditions.forall(_.deterministic))
          reorder(p, items, conditions).getOrElse(p)
        else p
    }
    reordered.transformUp {
      case j @ Join(l, r, jt, _, JoinHint.NONE) =>
        val t = conf.autoBroadcastJoinThreshold
        if (t <= 0) j
        else {
          // only hint sides Spark can legally build from for this join
          // type — a BROADCAST hint on e.g. the preserved side of an
          // outer join is ignored with a warning, so emitting it is
          // pure noise. Mirrors JoinSelection's canBuildBroadcast*.
          import org.apache.spark.sql.catalyst.plans._
          val canLeft = jt match {
            case _: InnerLike | RightOuter => true
            case _ => false
          }
          val canRight = jt match {
            case _: InnerLike | LeftOuter | LeftSemi | LeftAnti |
                 _: ExistenceJoin => true
            case _ => false
          }
          // 2× safety slack: the per-predicate selectivity product
          // assumes independence, and correlated predicates can
          // underestimate — a forced broadcast of a too-big side OOMs
          // the build, which is far worse than a missed broadcast.
          def small(side: LogicalPlan): Boolean =
            estimate(side).exists(e => e.rows * e.rowBytes * 2.0 <= t)
          val (ls, rs) = (canLeft && small(l), canRight && small(r))
          if (!ls && !rs) j
          else j.copy(hint = JoinHint(
            if (ls) Some(HintInfo(strategy = Some(BROADCAST))) else None,
            if (rs) Some(HintInfo(strategy = Some(BROADCAST))) else None))
        }
    }
  }

  /** Flatten a chain of hint-free plain-Inner joins into its base
    * relations and conjunctive conditions — like Catalyst's
    * `ExtractFiltersAndInnerJoins`, but transparent to the pure-pruning
    * `Project`s that ColumnPruning interleaves between joins by the
    * time the extraOptimizations batch runs (stopping at them would
    * leave every chain a 2-item ladder and freeze the written order).
    * A Project with computed columns, a Filter over a non-join, and
    * any other node are leaves (one chain item, kept verbatim). */
  private def flattenChain(p: LogicalPlan): (Seq[LogicalPlan], Seq[Expression]) =
    p match {
      case Join(l, r, Inner, cond, JoinHint.NONE) =>
        val (li, lc) = flattenChain(l)
        val (ri, rc) = flattenChain(r)
        (li ++ ri, lc ++ rc ++ cond.toSeq.flatMap(splitConjunctivePredicates))
      case Project(pl, child) if pl.forall(_.isInstanceOf[AttributeReference]) =>
        val (items, cs) = flattenChain(child)
        if (items.size > 1) (items, cs) else (Seq(p), Nil)
      case Filter(fc, child) =>
        val (items, cs) = flattenChain(child)
        if (items.size > 1) (items, cs ++ splitConjunctivePredicates(fc))
        else (Seq(p), Nil)
      case other => (Seq(other), Nil)
    }

  // -- cardinality estimation over the shapes we understand ----------

  private def estimate(plan: LogicalPlan): Option[Est] = plan match {
    case Project(_, child) => estimate(child) // width change ignored
    case Filter(cond, child) =>
      estimate(child).map { e =>
        val sel = splitConjunctivePredicates(cond)
          .map(selectivity(_, e)).product
        e.copy(rows = math.max(1.0, e.rows * sel))
      }
    case l: LogicalRelation =>
      l.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.headOption
            .flatMap(p => TableStatistics.lookupByPath(p.toString))
            .map { ts =>
              val attrs = l.output.flatMap(a =>
                ts.cols.get(a.name).map(a.exprId -> _)).toMap
              Est(math.max(1.0, ts.rows.toDouble), ts.avgRowBytes, attrs)
            }
        case _ => None
      }
    case Join(left, right, jt, cond, _) =>
      import org.apache.spark.sql.catalyst.plans._
      val conds = cond.map(splitConjunctivePredicates).getOrElse(Nil)
      for { le <- estimate(left); re <- estimate(right); est <- (jt match {
        case _: InnerLike => Some(joinEst(le, re, conds))
        // Semi: the left rows with a match; Anti: the complement.
        // Matched-left-rows come from a CONTAINMENT estimate
        // ([[matchedFrac]]: ndv_right/ndv_left capped at 1 per equi
        // key), NOT the inner-join cardinality — with multiplying
        // right keys `inner.rows >> matched rows`, so `le.rows -
        // inner.rows` clamps to 1 and a join above could broadcast a
        // side that is actually large. The inner estimate still caps
        // the semi (a left row can't match more than its key group
        // exists). These are what let a join ABOVE a q06/q07-shaped
        // filter still get a cardinality (and so a broadcast hint).
        case LeftSemi =>
          val inner = joinEst(le, re, conds)
          val matched = le.rows * matchedFrac(le, re, conds)
          Some(Est(math.max(1.0, math.min(matched, inner.rows)),
            le.rowBytes, le.attrs))
        case LeftAnti =>
          val matched = le.rows * matchedFrac(le, re, conds)
          Some(Est(math.max(1.0, le.rows - matched), le.rowBytes, le.attrs))
        case _: ExistenceJoin =>
          Some(Est(le.rows, le.rowBytes, le.attrs))
        // Outer joins: matched rows (the inner estimate) plus the
        // preserved side's unmatched rows — lower-bounded by the
        // preserved side(s), which is the standard safe estimate.
        case LeftOuter =>
          val inner = joinEst(le, re, conds)
          Some(inner.copy(rows = math.max(inner.rows, le.rows)))
        case RightOuter =>
          val inner = joinEst(le, re, conds)
          Some(inner.copy(rows = math.max(inner.rows, re.rows)))
        case FullOuter =>
          val inner = joinEst(le, re, conds)
          Some(inner.copy(rows = math.max(inner.rows, le.rows + re.rows)))
        case _ => None
      }) } yield est
    case _ => None
  }

  private def joinEst(l: Est, r: Est, conds: Seq[Expression]): Est = {
    var rows = l.rows * r.rows
    conds.foreach {
      case EqualTo(a: Attribute, b: Attribute) =>
        val na = l.attrs.get(a.exprId).orElse(r.attrs.get(a.exprId)).map(_.ndv)
        val nb = l.attrs.get(b.exprId).orElse(r.attrs.get(b.exprId)).map(_.ndv)
        (na, nb) match {
          case (Some(x), Some(y)) => rows /= math.max(1L, math.max(x, y)).toDouble
          case (Some(x), None) => rows /= math.max(1L, x).toDouble
          case (None, Some(y)) => rows /= math.max(1L, y).toDouble
          case _ => // unmapped key: no reduction (conservative)
        }
      case _ => // non-equi: no reduction
    }
    Est(math.max(1.0, rows), l.rowBytes + r.rowBytes, l.attrs ++ r.attrs)
  }

  /** Estimated fraction of LEFT rows with at least one right match on
    * the equi conditions: per key, min(1, ndv_right/ndv_left) — the
    * standard containment assumption (every right key value appears on
    * the left, the FK direction). Conditions without ndv on both sides
    * contribute 1 (no reduction — conservative for semi, and for anti
    * the subtraction then bottoms at the 1-row floor). */
  private def matchedFrac(l: Est, r: Est, conds: Seq[Expression]): Double =
    conds.map {
      case EqualTo(a: Attribute, b: Attribute) =>
        def ndvOf(e: Est) =
          e.attrs.get(a.exprId).orElse(e.attrs.get(b.exprId)).map(_.ndv)
        (ndvOf(l), ndvOf(r)) match {
          case (Some(x), Some(y)) if x > 0 =>
            math.min(1.0, y.toDouble / x.toDouble)
          case _ => 1.0
        }
      case _ => 1.0
    }.product

  private def num(v: Any): Option[Double] = v match {
    case null => None
    case n: java.lang.Number => Some(n.doubleValue())
    case d: org.apache.spark.sql.types.Decimal => Some(d.toDouble)
    case _ => None
  }

  private def selectivity(pred: Expression, e: Est): Double = {
    def eq(a: Attribute, k: Double): Double =
      e.attrs.get(a.exprId).map(cs => k / math.max(1L, cs.ndv)).getOrElse(1.0)
    // F(x): estimated fraction of rows at or below x, by linear
    // interpolation inside the equi-depth bucket containing x
    def cdf(cs: ColStats, x: Double): Double = cs.hist match {
      case bs if bs.size >= 2 =>
        if (x < bs.head) 0.0
        else if (x >= bs.last) 1.0
        else {
          val i = bs.indices.dropRight(1)
            .find(j => x >= bs(j) && x < bs(j + 1)).getOrElse(bs.size - 2)
          val (lo, hi) = (bs(i), bs(i + 1))
          val within = if (hi > lo) (x - lo) / (hi - lo) else 1.0
          (i + within) / (bs.size - 1)
        }
      case _ =>
        // min/max-only uniform fallback
        (for { mn <- cs.min; mx <- cs.max if mx > mn }
          yield ((x - mn) / (mx - mn)).max(0.0).min(1.0)).getOrElse(0.5)
    }
    def range(a: Attribute, x: Double, below: Boolean): Double =
      e.attrs.get(a.exprId).map { cs =>
        val f = cdf(cs, x)
        (if (below) f else 1.0 - f).max(1.0 / math.max(1.0, e.rows)).min(1.0)
      }.getOrElse(1.0)
    pred match {
      case EqualTo(a: Attribute, Literal(_, _)) => eq(a, 1.0)
      case EqualTo(Literal(_, _), a: Attribute) => eq(a, 1.0)
      case In(a: Attribute, list) if list.forall(_.isInstanceOf[Literal]) =>
        math.min(1.0, eq(a, list.size.toDouble))
      case LessThan(a: Attribute, Literal(v, _)) =>
        num(v).map(range(a, _, below = true)).getOrElse(1.0)
      case LessThanOrEqual(a: Attribute, Literal(v, _)) =>
        num(v).map(range(a, _, below = true)).getOrElse(1.0)
      case GreaterThan(a: Attribute, Literal(v, _)) =>
        num(v).map(range(a, _, below = false)).getOrElse(1.0)
      case GreaterThanOrEqual(a: Attribute, Literal(v, _)) =>
        num(v).map(range(a, _, below = false)).getOrElse(1.0)
      case LessThan(Literal(v, _), a: Attribute) =>
        num(v).map(range(a, _, below = false)).getOrElse(1.0)
      case GreaterThan(Literal(v, _), a: Attribute) =>
        num(v).map(range(a, _, below = true)).getOrElse(1.0)
      case LessThanOrEqual(Literal(v, _), a: Attribute) =>
        num(v).map(range(a, _, below = false)).getOrElse(1.0)
      case GreaterThanOrEqual(Literal(v, _), a: Attribute) =>
        num(v).map(range(a, _, below = true)).getOrElse(1.0)
      case _: IsNotNull => 1.0
      case _ => 1.0 // unknown shape: never shrink on a guess
    }
  }

  // -- greedy chain ordering -----------------------------------------

  private def reorder(original: LogicalPlan, plans: Seq[LogicalPlan],
                      conditions: Seq[Expression]): Option[LogicalPlan] = {
    val ests = plans.map(estimate)
    if (ests.exists(_.isEmpty)) return None // only act on full knowledge
    val est0 = plans.zip(ests.map(_.get))
    // deterministic start: smallest estimated relation (original
    // position breaks ties)
    val startIdx = est0.zipWithIndex
      .minBy { case ((_, e), i) => (e.rows, i) }._2
    var tree: LogicalPlan = plans(startIdx)
    var treeEst = est0(startIdx)._2
    var remaining = est0.zipWithIndex.filter(_._2 != startIdx).map(_._1)
    var unused = conditions
    while (remaining.nonEmpty) {
      val candidates = remaining.flatMap { case (p, pe) =>
        val combined = tree.outputSet ++ p.outputSet
        val applicable = unused.filter(c =>
          c.references.subsetOf(combined) &&
            c.references.intersect(p.outputSet).nonEmpty &&
            c.references.intersect(tree.outputSet).nonEmpty)
        if (applicable.isEmpty) None
        else Some((p, pe, applicable, joinEst(treeEst, pe, applicable)))
      }
      if (candidates.isEmpty) return None // would need a cross join: refuse
      val (next, _, conds, joined) = candidates.minBy { c =>
        (c._4.rows, plans.indexWhere(_ eq c._1))
      }
      tree = Join(tree, next, Inner, conds.reduceOption(And), JoinHint.NONE)
      treeEst = joined
      remaining = remaining.filterNot(_._1 eq next)
      unused = unused.filterNot(conds.contains)
    }
    val withResidual = unused.reduceOption(And).map(Filter(_, tree)).getOrElse(tree)
    // picked the order already planned → report "no change" so the
    // fixed-point batch terminates; otherwise preserve the original
    // output attribute order with a capping Project. Leaf flattening
    // stops at the extracted items themselves (an item may be a
    // Filter-over-relation — it must compare as one unit).
    def leavesOf(p: LogicalPlan): Seq[LogicalPlan] =
      if (plans.exists(_ eq p)) Seq(p)
      else p match {
        case Join(l, r, _, _, _) => leavesOf(l) ++ leavesOf(r)
        case Filter(_, c) => leavesOf(c)
        case other => Seq(other)
      }
    val leaves = leavesOf(withResidual)
    if (leaves.size == plans.size &&
        leaves.zip(plans).forall { case (a, b) => a eq b }) None
    else Some(Project(original.output, withResidual))
  }
}

object StatsJoinPlanner {
  /** Add the rule to `spark.experimental.extraOptimizations`
    * (idempotent) — the public hook that works on an already-built
    * session. */
  def install(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[StatsJoinPlanner]))
      spark.experimental.extraOptimizations = cur :+ new StatsJoinPlanner
  }
}
