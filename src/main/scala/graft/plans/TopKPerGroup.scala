package graft.plans

import scala.collection.mutable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftDatasetBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan (the SURVEY §7.3 `LogicalPlan` + `Strategy`
  * + `SparkPlan` slot): top-k rows per group under a sort order, executed
  * with bounded per-group heaps instead of the window formulation's full
  * per-group sort.
  *
  * Why an operator and not a composition: `row_number().over(...) <= k`
  * must SORT every group completely — O(n log n) comparisons and, for
  * jumbo groups, spill — to keep k rows. The heap exec does one pass with
  * an O(k) bound per group: O(n log k) worst case, and in practice most
  * rows fail the cheap `row ≥ heap-max` test without touching the heap.
  * Same distribution contract as the window (hash on the group key), no
  * required child ORDERING — the planner inserts an exchange but never a
  * sort (the spec asserts both).
  *
  * Scale: state is #groups-per-partition × k rows — bounded by design;
  * the comparator is codegen'd (`GenerateOrdering`). Ties: make `order` a
  * total order (include a unique id), exactly like the window form.
  *
  * Relation to Spark's own machinery: since 3.5, `InferWindowGroupLimit`
  * prunes rank filters with sort-based partial/final `WindowGroupLimit`
  * nodes — group limits applied around a still-mandatory per-group sort.
  * This exec removes the sorts entirely (see [[WindowTopKRewrite]], which
  * also strips the native group-limit when it rewrites).
  */
case class TopKPerGroup(group: Seq[Expression], order: Seq[SortOrder],
                        k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, "k must be positive")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      TopKPerGroupExec(g, o, k, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(group: Seq[Expression], order: Seq[SortOrder],
                            k: Int, child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output
  override def requiredChildDistribution: Seq[Distribution] =
    if (group.isEmpty) AllTuples :: Nil else ClusteredDistribution(group) :: Nil
  // deliberately NO requiredChildOrdering — the point is to never sort input
  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = group
    val sortOrder = order
    val kk = k
    val childOutput = child.output
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap under ord: head = worst kept row, evicted when beaten
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      while (it.hasNext) {
        val row = it.next()
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(q) =>
            if (q.size < kk) q.enqueue(row.copy())
            else if (ord.compare(row, q.head) < 0) { q.dequeue(); q.enqueue(row.copy()) }
          case None =>
            val q = mutable.PriorityQueue.empty[InternalRow](ord)
            q.enqueue(row.copy())
            heaps.put(keyProj(row).copy(), q)
        }
      }
      // emit each group's survivors in sort order (deterministic output)
      heaps.valuesIterator.flatMap(q => q.dequeueAll.reverseIterator)
    }, preservesPartitioning = true)
  }
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopK {

  /** Top-k rows of `df` per `groupCols` under `orderKeys` — (column,
    * descending?) pairs, e.g. `Seq("v" -> true, "id" -> false)`. Columns
    * resolve by name against the analyzed child plan (Spark 4 Column
    * objects wrap non-serializable plan nodes, so the catalyst tree is
    * built from the child's own attributes). Registers the planner
    * strategy on the session idempotently (also injectable session-wide
    * via `graft.GraftExtensions`). */
  def topKPerGroup(df: DataFrame, groupCols: Seq[String],
                   orderKeys: Seq[(String, Boolean)], k: Int): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy
    }
    val child = df.queryExecution.analyzed
    def attr(name: String): Attribute =
      child.output.find(a => spark.sessionState.conf.resolver(a.name, name))
        .getOrElse(throw new IllegalArgumentException(
          s"column $name not in ${child.output.map(_.name).mkString(", ")}"))
    val g = groupCols.map(attr)
    val o = orderKeys.map { case (name, desc) =>
      SortOrder(attr(name), if (desc) Descending else Ascending)
    }
    GraftDatasetBridge.ofRows(spark, TopKPerGroup(g, o, k, child))
  }
}
