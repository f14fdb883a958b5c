package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule (the `Rule[LogicalPlan]` rung of SURVEY §7.3's custom
  * ladder): rewrite the ubiquitous window top-k idiom
  *
  *   df.withColumn("rn", row_number().over(partitionBy(g).orderBy(o)))
  *     .where($"rn" <= k).select(<columns that don't use rn>)
  *
  * into [[TopKPerGroup]] — unmodified user code gets the bounded-heap exec
  * instead of a full per-group sort. Deliberately conservative; it fires
  * only when:
  *   - the window computes exactly ONE expression, a bare row_number();
  *   - the filter is `rn <= k` / `rn < k` / `rn = 1` on that column
  *     (literal k > 0);
  *   - a Project above drops the rank column (its references stay within
  *     the window child's output), proving nothing downstream reads `rn`
  *     — TopKPerGroup produces no rank, so this is what makes the rewrite
  *     semantics-preserving. Row-number ties under a non-total order are
  *     nondeterministic in BOTH formulations, so the contract is unchanged.
  *
  * `rank()` (the reference's W1 idiom) is an explicit NON-goal: rank ≤ k
  * keeps every row tied at the boundary — potentially more than k rows per
  * group — while the heap keeps exactly k, and whether the ordering is
  * tie-free is a data property no plan inspection can prove. Rewriting
  * would silently change results exactly when ties exist, so W1 stays on
  * the window exec (TopKPerGroupSpec pins the negative case: the rule must
  * NOT fire on rank()).
  *
  * Inject at runtime (`spark.experimental.extraOptimizations`) or session-
  * wide via `graft.GraftExtensions`; pair with [[TopKPerGroupStrategy]] so
  * the rewritten node plans.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  private def limitOf(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k)) if a.exprId == rn => Some(k)
    case LessThan(a: AttributeReference, IntegerLiteral(k)) if a.exprId == rn => Some(k - 1)
    case EqualTo(a: AttributeReference, IntegerLiteral(1)) if a.exprId == rn => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case Project(projList, Filter(cond,
        Window(Seq(alias @ Alias(WindowExpression(_: RowNumber, _), _)),
          part, order, child, _)))
        if limitOf(cond, alias.exprId).exists(_ > 0) &&
          projList.forall(_.references.subsetOf(child.outputSet)) =>
      // Spark's own InferWindowGroupLimit has usually inserted a sort-based
      // WindowGroupLimit below the Window by the time user rules run; the
      // heap exec subsumes it, so strip it rather than stack on top — but
      // ONLY when it provably limits the same grouping at least as
      // generously (same partition/order, limit ≥ k); any other group-limit
      // node is load-bearing and stripping it would return extra rows
      val k = limitOf(cond, alias.exprId).get
      def sameSpec(a: Seq[Expression], b: Seq[Expression]) =
        a.length == b.length && a.zip(b).forall { case (x, y) => x.semanticEquals(y) }
      val base = child match {
        case wgl: WindowGroupLimit
            if sameSpec(wgl.partitionSpec, part) &&
              sameSpec(wgl.orderSpec, order) && wgl.limit >= k =>
          wgl.child
        case other => other
      }
      Project(projList, TopKPerGroup(part, order, k, base))
  }
}
