package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: rewrite a pure interval theta-join
  * `a JOIN b ON v BETWEEN lo AND hi` into the grid equi-join shape of
  * [[graft.operators.RangeJoin]] — automatically.
  *
  * Spark plans an inequality-only inner join as a (broadcast) nested loop:
  * |a|×|b| comparisons, dead at lake scale. With this rule active
  * (`spark.graft.range.grid` set to a cell width near the typical interval
  * length) the same SQL becomes: value side projects its grid cell,
  * interval side explodes the cells each interval overlaps, the join is a
  * hash equi-join on the cell, and the original BETWEEN survives as the
  * exact post-filter. Users keep writing the declarative BETWEEN; the
  * optimizer picks the scale-safe physical shape — the Catalyst-native way
  * to ship an operator Spark lacks.
  *
  * Only fires on inner joins with NO equality conjunct (if an equi-key
  * exists, hash join on it already avoids the nested loop; and the guard
  * makes the rewrite idempotent — the rewritten join gains an equality).
  */
object RangeJoinRule extends Rule[LogicalPlan] {
  val GridConf = "spark.graft.range.grid"

  // the optimizer applies this rule to every plan, possibly several times:
  // warn once per distinct malformed value, not once per apply()
  @volatile private var lastWarnedGrid: String = null

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val gridStr = conf.getConfString(GridConf, "")
    if (gridStr.isEmpty) return plan
    // A malformed conf value must never fail the query (this rule runs on
    // EVERY plan in the session): skip the rewrite instead of throwing.
    scala.util.Try(gridStr.toDouble).toOption.filter(_ > 0) match {
      case None =>
        if (gridStr != lastWarnedGrid) {
          lastWarnedGrid = gridStr
          logWarning(s"$GridConf='$gridStr' is not a positive double; range-join rewrite disabled")
        }
        plan
      case Some(grid) =>
        plan.transformUp {
          case j @ Join(_, _, Inner, Some(cond), _) if noEquiConjunct(cond) =>
            rewrite(j, cond, grid).getOrElse(j)
        }
    }
  }

  private def conjuncts(e: Expression): Seq[Expression] = e match {
    case And(a, b) => conjuncts(a) ++ conjuncts(b)
    case x         => Seq(x)
  }

  private def noEquiConjunct(cond: Expression): Boolean =
    !conjuncts(cond).exists {
      case _: EqualTo | _: EqualNullSafe => true
      case _                             => false
    }

  private def isNum(e: Expression): Boolean = e.dataType.isInstanceOf[NumericType]

  private def rewrite(j: Join, cond: Expression, grid: Double): Option[LogicalPlan] = {
    val cs = conjuncts(cond)
    // normalize both comparison orientations to (value, bound)
    val lowerOf = cs.collect {
      case GreaterThanOrEqual(v, lo) => (v, lo)
      case LessThanOrEqual(lo, v)    => (v, lo)
    }
    val upperOf = cs.collect {
      case LessThanOrEqual(v, hi)    => (v, hi)
      case GreaterThanOrEqual(hi, v) => (v, hi)
    }
    val candidates = for {
      (v1, lo) <- lowerOf
      (v2, hi) <- upperOf
      if v1.semanticEquals(v2) && isNum(v1) && isNum(lo) && isNum(hi)
      swapped <- orientation(j, v1, lo, hi)
    } yield (v1, lo, hi, swapped)

    candidates.headOption.map { case (v, lo, hi, swapped) =>
      val cellOf: Expression => Expression =
        e => Cast(Floor(Divide(Cast(e, DoubleType), Literal(grid))), LongType)
      val (valuePlan, intervalPlan) = if (!swapped) (j.left, j.right) else (j.right, j.left)
      val vCell = Alias(cellOf(v), "__cell")()
      val newValuePlan = Project(valuePlan.output :+ vCell, valuePlan)
      // Sequence is TimeZoneAwareExpression: without a timezone it stays
      // unresolved and plan validation rejects the rewrite
      val cellSeq = Sequence(cellOf(lo), cellOf(hi), None)
        .withTimeZone(conf.sessionLocalTimeZone)
      val iCell = AttributeReference("__cell", LongType, nullable = false)()
      val newIntervalPlan = Generate(Explode(cellSeq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(iCell), intervalPlan)
      val (newLeft, newRight) =
        if (!swapped) (newValuePlan, newIntervalPlan) else (newIntervalPlan, newValuePlan)
      val newCond = And(EqualTo(vCell.toAttribute, iCell), cond)
      Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), j.hint))
    }
  }

  /** Some(false) if the value comes from the left and both bounds from the
    * right, Some(true) for the mirror, None otherwise (literal bounds are a
    * plain filter — Catalyst pushes those down already). */
  private def orientation(j: Join, v: Expression, lo: Expression,
                          hi: Expression): Option[Boolean] = {
    val bounds = lo.references ++ hi.references
    if (v.references.nonEmpty && bounds.nonEmpty &&
      v.references.subsetOf(j.left.outputSet) && bounds.subsetOf(j.right.outputSet))
      Some(false)
    else if (v.references.nonEmpty && bounds.nonEmpty &&
      v.references.subsetOf(j.right.outputSet) && bounds.subsetOf(j.left.outputSet))
      Some(true)
    else None
  }
}
