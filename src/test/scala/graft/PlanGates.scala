package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.window.WindowExec

/** Shared physical-plan gates for the scale anti-patterns the registry
  * and operator specs hunt. Kept in test sources: these are CI
  * assertions, not runtime behavior. */
object PlanGates {

  /** The buildEncoder anti-shape (round-13 finding #1): an UNPARTITIONED
    * window whose nearest "grain reducer" is a DISTINCT-shaped aggregate
    * (grouping keys, NO aggregate functions). A distinct does not bound
    * cardinality — over an id-like column #distinct ≈ #rows, and the
    * window funnels all of it through ONE task. Flagged unless every
    * grouping key is in `boundedCols` (columns whose domain is provably
    * config-sized — band ids, partition ids, source enums).
    *
    * Aggregates WITH aggregate functions (count/sum/… per group) keep
    * the registry gate's existing benefit of the doubt: their grain is
    * the group-by domain, which every audited use bounds by
    * construction. The distinct shape gets none, because it is exactly
    * how the unbounded case slipped through review. */
  def distinctFedGlobalWindows(plan: SparkPlan,
                               boundedCols: Set[String]): Seq[String] =
    plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty =>
        w.child.collectFirst { case a: BaseAggregateExec => a } match {
          case Some(a) if a.aggregateExpressions.isEmpty &&
            a.groupingExpressions.nonEmpty &&
            !a.groupingExpressions.forall(
              _.references.iterator.map(_.name).forall(boundedCols)) =>
            Some("unpartitioned window over distinct(" +
              a.groupingExpressions.map(_.sql).mkString(", ") +
              ") — unbounded cardinality funneled through one task")
          case _ => None
        }
    }.flatten

  /** Unpartitioned WindowExec nodes whose input CARRIES the named
    * column — the operator-spec form of the gate: a build/encode plan
    * may use a global window over partition COUNTS (config-sized by
    * construction), never over the value-carrying frame itself. */
  def globalWindowsCarrying(plan: SparkPlan, col: String): Seq[WindowExec] =
    plan.collect {
      case w: WindowExec if w.partitionSpec.isEmpty &&
        w.child.output.exists(_.name == col) => w
    }
}
