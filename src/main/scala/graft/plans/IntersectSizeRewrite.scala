package graft.plans

import org.apache.spark.sql.catalyst.expressions.{ArrayDistinct, ArrayIntersect, CaseWhen, Expression, If, Literal, Size, SortArray}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, BooleanType, StringType}
import graft.functions.SortedIntersectSize

/** Optimizer rule (SURVEY.md §7.3 route (c) surface, injected via
  * `SparkSessionExtensions.injectOptimizerRule`): rewrites the builtin
  * spelling of a sorted-set intersection COUNT,
  *
  *   `size(array_intersect(sort_array(array_distinct(a)),
  *                         sort_array(array_distinct(b))))`
  *
  * into the native merge scan
  * [[graft.functions.SortedIntersectSize]] — O(|a|+|b|) string
  * comparisons instead of a per-row boxed hash set plus an intersection
  * array nobody reads.
  *
  * The match is deliberately narrow so the rewrite is PROVABLY
  * semantics-preserving — each guard corresponds to a precondition of
  * the merge scan:
  *   - `sort_array(.., asc)` ⇒ input sorted ascending, nulls first;
  *   - `array_distinct` below it ⇒ input duplicate-free, so the scan's
  *     per-element count equals array_intersect's set semantics (incl. a
  *     shared null counting once — see [[SortedIntersectSize]]);
  *   - element type string ⇒ the scan's comparator applies;
  *   - `size`'s legacySizeOfNull = false ⇒ both sides agree null input →
  *     null output (with the legacy flag, size(null) = -1; the rule
  *     stays out of the way).
  *
  * Anything else — unsorted input, descending sort, non-distinct arrays,
  * other element types — keeps the builtin plan. Users writing the
  * canonical declarative spelling get the dedup-verification fast path
  * for free; graft's own operators call the expression directly.
  */
object IntersectSizeRewrite extends Rule[LogicalPlan] {

  /** Provably duplicate-free (or null): ArrayDistinct, a null literal,
    * or a conditional whose every outcome is — the optimizer pushes
    * array_distinct INTO CaseWhen/If branches (e.g.
    * `array_distinct(CASE ...)` → `CASE ... THEN array_distinct(..)`),
    * so the guard must see through that canonicalization. A CaseWhen
    * with no else branch yields null, which is fine.
    */
  private def distinctOrNull(e: Expression): Boolean = e match {
    case ArrayDistinct(_) => true
    case Literal(null, _) => true
    case c: CaseWhen =>
      (c.branches.map(_._2) ++ c.elseValue).forall(distinctOrNull)
    case If(_, t, f) => distinctOrNull(t) && distinctOrNull(f)
    case _ => false
  }

  private def sortedDistinctStrings(e: Expression): Boolean = e match {
    case SortArray(child, Literal(true, BooleanType)) =>
      distinctOrNull(child) && (child.dataType match {
        case ArrayType(StringType, _) => true
        case _ => false
      })
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case Size(ArrayIntersect(a, b), false)
          if sortedDistinctStrings(a) && sortedDistinctStrings(b) =>
        SortedIntersectSize(a, b)
    }
}
