package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Canonical SparkSessionExtensions entry point: activate the engine's
  * native expressions in any session via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`).
  *
  * Functions come from [[graft.functions.SqlSurface]] — the full scalar
  * text/vector surface plus the sketch aggregates — so a pure-SQL user
  * reaches the dedup/curation primitives without the Scala API (a live
  * session registers the same builders via `SqlSurface.register`).
  * Plan slots: the TopKPerGroup strategy and the window-top-k optimizer
  * rewrite, the same mechanism a later Rule/Strategy would use
  * (SURVEY §7.3).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    graft.functions.SqlSurface.all.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
    // whole-operator slot: plans the TopKPerGroup logical node onto its
    // bounded-heap exec (graft.plans.TopKPerGroupExec)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    // optimizer slot: rewrites the window row_number()<=k idiom onto that
    // operator, so unmodified user queries get the heap exec
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
  }
}
