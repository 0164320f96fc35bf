package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Alias, AttributeReference, IntegerLiteral, LessThan, LessThanOrEqual, RowNumber, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.{CurrentRow, RowFrame, SpecifiedWindowFrame, UnboundedPreceding}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (SURVEY §2 escape hatch (c), `Rule[LogicalPlan]`):
  * rewrites the ubiquitous per-group top-k idiom
  *
  *   df.withColumn("rn", row_number().over(Window.partitionBy(k).orderBy(o)))
  *     .filter($"rn" <= n)
  *
  * into [[TopKPerKeyNode]]. The window formulation shuffles and sorts
  * EVERY row of every key; the rewritten plan's map-side phase emits at
  * most n rows per key per partition before the exchange (see
  * [[TopKPerKeyNode]] scaladoc for the 100 TB arithmetic).
  *
  * Guards (rewrite only when provably equivalent):
  *  - the window has exactly one expression, a plain `row_number()` with
  *    the default UnboundedPreceding..CurrentRow row frame;
  *  - the filter is `rn <= lit` / `rn < lit` on that very attribute,
  *    directly above the Window node;
  *  - all partition keys are plain attributes;
  *  - the ordering is non-empty.
  *
  * Registered via `spark.experimental.extraOptimizations` in
  * `Sessions.build` (and by [[graft.GraftExtensions]] for
  * `spark.sql.extensions`-based wiring).
  */
object RewriteRowNumberTopK extends Rule[LogicalPlan] {

  private object RowNumberWindow {
    /** Extracts (rankAlias, partitionAttrs, order, child). */
    def unapply(w: Window): Option[(Alias, Seq[AttributeReference],
        Seq[org.apache.spark.sql.catalyst.expressions.SortOrder], LogicalPlan)] =
      w match {
        case Window(Seq(al @ Alias(WindowExpression(RowNumber(),
              WindowSpecDefinition(parts, order,
                SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
              _, _, child, _)
            if order.nonEmpty && parts.nonEmpty &&
              parts.forall(_.isInstanceOf[AttributeReference]) =>
          Some((al, parts.map(_.asInstanceOf[AttributeReference]), order, child))
        case _ => None
      }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Filter(LessThanOrEqual(a: AttributeReference, IntegerLiteral(k)),
          w @ RowNumberWindow(al, parts, order, child))
        if a.exprId == al.exprId && k > 0 =>
      TopKPerKeyNode(parts, order, k,
        AttributeReference(al.name, al.dataType, al.nullable)(exprId = al.exprId),
        child)
    case Filter(LessThan(a: AttributeReference, IntegerLiteral(k)),
          w @ RowNumberWindow(al, parts, order, child))
        if a.exprId == al.exprId && k > 1 =>
      TopKPerKeyNode(parts, order, k - 1,
        AttributeReference(al.name, al.dataType, al.nullable)(exprId = al.exprId),
        child)
  }
}
