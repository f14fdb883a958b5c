package graft.plans

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, File, FileInputStream, FileOutputStream}

import scala.collection.mutable

import org.apache.spark.TaskContext
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftDatasetBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.SQLMetrics

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
  * Scale: per-group state is ≤ k rows, but TOTAL state is
  * groups-per-partition × k — data-dependent, so it is bounded explicitly:
  * past `spark.graft.topk.maxStateRows` retained rows the partition spills
  * its heaps as a key-sorted run to local disk and restarts, and the runs
  * merge at emit time (each run holds ≤ k rows per group, so the merge is
  * a bounded per-key heap over run cursors — never a full sort). A hash
  * aggregate in the same plan position degrades to sort-based spilling the
  * same way; before this bound the exec would instead OOM on a caller that
  * packs millions of groups into one task (the round-5 verdict's
  * robustness gap). The `spills` SQLMetric makes the degradation
  * observable (TopKPerGroupSpec pins spilled ≡ in-memory results).
  * The comparator is codegen'd (`GenerateOrdering`). Ties: make `order` a
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
  /** Soft state bound per partition, in retained rows; past it the exec
    * spills a sorted run and continues (degradation, never failure). */
  val MaxStateRowsKey = "spark.graft.topk.maxStateRows"
  val MaxStateRowsDefault: Long = 4L * 1024 * 1024

  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(g, o, k, child) =>
      val bound = org.apache.spark.sql.internal.SQLConf.get
        .getConfString(MaxStateRowsKey, MaxStateRowsDefault.toString).toLong
      // partial → exchange → final, the aggregation shape (guide §2.3
      // "aggregate before you shuffle"): the map-side pass caps what the
      // exchange carries at partitions × groups × k rows, where the single
      // exec shuffled EVERY scored row (the corpus × queries stream for the
      // ANN rerank paths). With the operator's documented total-order
      // contract, top-k over per-partition top-k's is exactly top-k.
      TopKPerGroupExec(g, o, k,
        TopKPerGroupExec(g, o, k, planLater(child), bound, partial = true),
        bound) :: Nil
    case _ => Nil
  }
}

case class TopKPerGroupExec(group: Seq[Expression], order: Seq[SortOrder],
                            k: Int, child: SparkPlan,
                            maxStateRows: Long = TopKPerGroupStrategy.MaxStateRowsDefault,
                            partial: Boolean = false)
    extends UnaryExecNode {
  require(maxStateRows > 0, "maxStateRows must be positive")
  override def output: Seq[Attribute] = child.output
  // the partial (map-side) pass runs on whatever partitioning the child
  // has — only the FINAL pass demands clustering, so EnsureRequirements
  // places the exchange between them and it carries ≤ groups × k rows per
  // map partition instead of the full scored stream
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (group.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(group) :: Nil
  override def nodeName: String =
    if (partial) "TopKPerGroupPartial" else "TopKPerGroup"
  // deliberately NO requiredChildOrdering — the point is to never sort input

  override lazy val metrics = Map(
    "spills" -> SQLMetrics.createMetric(sparkContext, "spilled sorted runs"),
    "spilledRows" -> SQLMetrics.createMetric(sparkContext, "rows written to spill runs"))

  // unsigned lexicographic byte order — any total order works for the run
  // merge, grouping itself is UnsafeRow binary equality (same contract as
  // the in-memory map and Spark's own hash aggregation)
  private def keyCmp(a: Array[Byte], b: Array[Byte]): Int = {
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val x = (a(i) & 0xff) - (b(i) & 0xff)
      if (x != 0) return x
      i += 1
    }
    a.length - b.length
  }

  /** One key-sorted spill run: [keyLen key nRows [rowLen row]*]* then -1.
    * Rows per key are written best→worst, ≤ k of them. */
  private final class RunReader(f: File, rowFields: Int) {
    private val in = new DataInputStream(
      new BufferedInputStream(new FileInputStream(f), 1 << 16))
    var key: Array[Byte] = _
    var rows: Array[UnsafeRow] = _
    def advance(): Boolean = {
      val klen = in.readInt()
      if (klen < 0) { in.close(); f.delete(); false }
      else {
        key = new Array[Byte](klen); in.readFully(key)
        rows = Array.fill(in.readInt()) {
          val rlen = in.readInt()
          val b = new Array[Byte](rlen); in.readFully(b)
          val u = new UnsafeRow(rowFields)
          u.pointTo(b, rlen)
          u
        }
        true
      }
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = group
    val sortOrder = order
    val kk = k
    val childOutput = child.output
    val bound = maxStateRows
    val spillMetric = longMetric("spills")
    val spilledRowsMetric = longMetric("spilledRows")
    child.execute().mapPartitions({ it =>
      val keyProj = UnsafeProjection.create(groupExprs, childOutput)
      val toUnsafe = UnsafeProjection.create(
        childOutput.map(a => a: Expression), childOutput)
      val ord = GenerateOrdering.generate(sortOrder, childOutput)
      // max-heap under ord: head = worst kept row, evicted when beaten
      val heaps = mutable.LinkedHashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      var retained = 0L
      val runs = mutable.ArrayBuffer.empty[File]
      Option(TaskContext.get()).foreach(_.addTaskCompletionListener[Unit] { _ =>
        runs.foreach(_.delete()) // harmless on already-consumed (deleted) runs
      })
      def unsafeBytes(r: InternalRow): Array[Byte] = r match {
        case u: UnsafeRow => u.getBytes
        case other => toUnsafe(other).getBytes // projection copies into bytes
      }
      def bestToWorst(q: mutable.PriorityQueue[InternalRow]): Seq[InternalRow] =
        q.dequeueAll.reverse // PQ dequeues worst-first under ord
      def spill(): Unit = {
        val f = File.createTempFile("graft-topk-spill", ".run")
        runs += f
        val out = new DataOutputStream(
          new BufferedOutputStream(new FileOutputStream(f), 1 << 16))
        try {
          val sorted = heaps.toArray.sortWith((a, b) =>
            keyCmp(a._1.getBytes, b._1.getBytes) < 0)
          sorted.foreach { case (key, q) =>
            val kb = key.getBytes
            out.writeInt(kb.length); out.write(kb)
            val rows = bestToWorst(q)
            out.writeInt(rows.length)
            rows.foreach { r =>
              val b = unsafeBytes(r)
              out.writeInt(b.length); out.write(b)
              spilledRowsMetric += 1
            }
          }
          out.writeInt(-1)
        } finally out.close()
        spillMetric += 1
        heaps.clear()
        retained = 0L
      }
      // ABANDON-PARTIAL heuristic (the map-side pass only — Spark's own
      // skip-partial-aggregate analog, ADVICE r15): with near-unique group
      // keys the heap retains ~every row, and the pass would spill sorted
      // runs to local disk for no shuffle reduction. After a probation
      // window, a retention ratio ≥ 90% switches to PASS-THROUGH: any
      // input superset of the per-partition top-k is a correct partial
      // output (the final pass computes the exact result), so the
      // remaining rows stream straight to the exchange. The probation is
      // capped at the spill bound, so the decision always lands before
      // the first pointless spill.
      val partialPass = partial
      val probation = math.min(bound, 131072L)
      var seen = 0L
      var abandoned = false
      while (it.hasNext && !abandoned) {
        val row = it.next()
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(q) =>
            if (q.size < kk) { q.enqueue(row.copy()); retained += 1 }
            else if (ord.compare(row, q.head) < 0) { q.dequeue(); q.enqueue(row.copy()) }
          case None =>
            val q = mutable.PriorityQueue.empty[InternalRow](ord)
            q.enqueue(row.copy())
            heaps.put(keyProj(row).copy(), q)
            retained += 1
        }
        seen += 1
        if (partialPass && runs.isEmpty && seen >= probation &&
            retained * 10 >= seen * 9) abandoned = true
        else if (retained >= bound) spill()
      }
      if (abandoned) {
        heaps.valuesIterator.flatMap(bestToWorst(_).iterator) ++ it
      } else if (runs.isEmpty) {
        // in-memory fast path: emit each group's survivors in sort order
        heaps.valuesIterator.flatMap(bestToWorst(_).iterator)
      } else {
        // merge: in-memory leftovers become one more key-sorted run (each
        // run holds ≤ k best→worst rows per key; same key across runs
        // re-merges through one bounded heap — state is O(runs · k))
        if (heaps.nonEmpty) spill()
        val readers = runs.toArray.map(new RunReader(_, childOutput.length))
          .filter(_.advance())
        implicit val byKey: Ordering[RunReader] =
          (x: RunReader, y: RunReader) => keyCmp(y.key, x.key) // min-heap
        val pq = mutable.PriorityQueue.empty[RunReader]
        readers.foreach(pq.enqueue(_))
        new Iterator[InternalRow] {
          private var current: Iterator[InternalRow] = Iterator.empty
          private def loadNextKey(): Unit = {
            if (pq.isEmpty) return
            val first = pq.dequeue()
            val key = first.key
            val group = mutable.ArrayBuffer(first)
            while (pq.nonEmpty && keyCmp(pq.head.key, key) == 0)
              group += pq.dequeue()
            val merged = mutable.PriorityQueue.empty[InternalRow](ord)
            group.foreach(_.rows.foreach { r =>
              if (merged.size < kk) merged.enqueue(r)
              else if (ord.compare(r, merged.head) < 0) { merged.dequeue(); merged.enqueue(r) }
            })
            current = bestToWorst(merged).iterator
            group.foreach(r => if (r.advance()) pq.enqueue(r))
          }
          override def hasNext: Boolean = {
            while (!current.hasNext && pq.nonEmpty) loadNextKey()
            current.hasNext
          }
          override def next(): InternalRow = {
            if (!hasNext) throw new NoSuchElementException
            current.next()
          }
        }
      }
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
