package graft.plans

import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, EqualTo, Expression, GreaterThan,
  GreaterThanOrEqual, LessThan, LessThanOrEqual, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{
  Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: recognize a declarative point-in-interval join —
  *
  *   l JOIN r ON l.k = r.k AND l.pt >= r.s AND l.pt < r.e
  *
  * — and swap in [[IntervalJoinPlan]], so the custom physical operator
  * is adopted WITHOUT any API change: users keep writing the plain
  * `join(...)`, Catalyst replaces the hash-join-plus-residual-filter
  * shape (which materializes every same-key pair before filtering)
  * with the merge-sweep exec. Inverse bound spellings (`r.s <= l.pt`,
  * `r.e > l.pt`) and the mirrored join order (intervals on the left)
  * normalize to the same triple; the mirrored case is wrapped in a
  * Project restoring the original column order.
  *
  * Conservative by construction:
  *  - INNER joins with no hints, and the condition must be EXACTLY
  *    the three conjuncts (any extra predicate → leave the join
  *    alone; Catalyst has already pushed single-side filters below
  *    the join by this phase, so residuals here are cross-side);
  *  - bare attribute references only (no expressions in the bounds);
  *  - only the half-open `s <= pt < e` form — exactly what the exec
  *    implements.
  *
  * Injected by [[GraftExtensions]] (`injectOptimizerRule`); sessions
  * opt in via extensions rather than getting it globally.
  * RewriteRangeJoinsSpec proves rewritten ≡ unrewritten and that
  * near-miss shapes are left untouched.
  */
object RewriteRangeJoins extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), JoinHint.NONE) =>
      matchTriple(left, right, cond)
        .map { case (lk, rk, pt, s, e) =>
          IntervalJoinPlan(left, right, lk, rk, pt, s, e): LogicalPlan
        }
        .orElse {
          matchTriple(right, left, cond).map { case (lk, rk, pt, s, e) =>
            // probe side was on the right: custom node emits
            // probe++build, restore the join's left++right order
            Project(j.output, IntervalJoinPlan(right, left, lk, rk, pt, s, e))
          }
        }
        .getOrElse(j)
  }

  /** Match `probe.k = build.k AND probe.pt >= build.s AND
    * probe.pt < build.e` (in any conjunct order / bound spelling).
    * Returns (probeKey, buildKey, pt, s, e). */
  private def matchTriple(
      probe: LogicalPlan, build: LogicalPlan,
      cond: Expression): Option[(Attribute, Attribute, Attribute, Attribute, Attribute)] = {
    val conjuncts = splitConjunctivePredicates(cond)
    if (conjuncts.length != 3) return None

    def onProbe(a: Attribute) = probe.outputSet.contains(a)
    def onBuild(a: Attribute) = build.outputSet.contains(a)

    var key: Option[(Attribute, Attribute)] = None
    var lower: Option[(Attribute, Attribute)] = None // (pt, s): pt >= s
    var upper: Option[(Attribute, Attribute)] = None // (pt, e): pt < e

    def asLower(pt: Attribute, s: Attribute): Boolean =
      onProbe(pt) && onBuild(s) && lower.isEmpty && { lower = Some((pt, s)); true }
    def asUpper(pt: Attribute, e: Attribute): Boolean =
      onProbe(pt) && onBuild(e) && upper.isEmpty && { upper = Some((pt, e)); true }

    val allMatched = conjuncts.forall {
      case EqualTo(a: AttributeReference, b: AttributeReference) if key.isEmpty =>
        if (onProbe(a) && onBuild(b)) { key = Some((a, b)); true }
        else if (onProbe(b) && onBuild(a)) { key = Some((b, a)); true }
        else false
      case GreaterThanOrEqual(a: AttributeReference, b: AttributeReference) =>
        asLower(a, b)
      case LessThanOrEqual(a: AttributeReference, b: AttributeReference) =>
        asLower(b, a)
      case LessThan(a: AttributeReference, b: AttributeReference) =>
        asUpper(a, b)
      case GreaterThan(a: AttributeReference, b: AttributeReference) =>
        asUpper(b, a)
      case _ => false
    }
    if (!allMatched) return None

    (key, lower, upper) match {
      case (Some((lk, rk)), Some((pt1, s)), Some((pt2, e)))
          if pt1.semanticEquals(pt2) &&
            lk.dataType == rk.dataType &&
            s.dataType == pt1.dataType && e.dataType == pt1.dataType =>
        Some((lk, rk, pt1, s, e))
      case _ => None
    }
  }
}
