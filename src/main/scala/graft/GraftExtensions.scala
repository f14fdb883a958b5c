package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import graft.functions.catalyst.{CosineSimilarity, DotProduct}

/** Canonical SparkSessionExtensions entry point: activate the engine's
  * native expressions in any session via
  * `spark.sql.extensions=graft.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`), making `dot_product` /
  * `cosine_sim` available to pure-SQL users — the same mechanism a custom
  * Rule/Strategy would use if a later operator needs one (SURVEY §7.3).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[Expression]) => DotProduct(exprs.head, exprs(1))))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSimilarity].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSimilarity(exprs.head, exprs(1))))
    // whole-operator slot: plans the TopKPerGroup logical node onto its
    // bounded-heap exec (graft.plans.TopKPerGroupExec)
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerGroupStrategy)
    // optimizer slot: rewrites the window row_number()<=k idiom onto that
    // operator, so unmodified user queries get the heap exec
    ext.injectOptimizerRule(_ => graft.plans.WindowTopKRewrite)
  }
}
