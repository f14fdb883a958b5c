package graft.functions.catalyst

import java.nio.ByteBuffer
import scala.collection.mutable
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Misra–Gries frequency sketch over a long key column, as a
  * TypedImperativeAggregate (the custom-aggregate slot SURVEY §4/§7.3
  * reserves for sketches, alongside [[MinHashAgg]]).
  *
  * Buffer: at most `k` (key → count) counters. Update is the classic MG
  * step (increment if present; insert if room; else decrement all). Merge
  * sums counterpart counters, then if more than `k` keys survive, subtracts
  * the (k+1)-th largest count from every counter and drops the non-positive
  * ones — the standard mergeable-summaries construction (Agarwal et al.,
  * "Mergeable Summaries", PODS'12), which preserves the MG guarantee:
  * after any tree of merges over n total rows, every key with true
  * frequency > n/(k+1) is present in the sketch.
  *
  * That guarantee is what makes the two-pass heavy-hitters plan exact (see
  * `operators.HeavyHitters`): pass 1 runs this sketch with partial
  * aggregation (map-side MG per partition, k-bounded merge on the reduce
  * side — the shuffle carries ≤ 2k longs per partition, never per-key
  * rows), pass 2 exact-counts only the ≤ k surviving candidates. At 100 TB
  * the first pass is the only full-data scan and it aggregates into a
  * constant-size buffer; no groupBy over the full key universe ever runs.
  *
  * eval returns the candidate keys sorted ascending (deterministic output;
  * the residual MG counts are lower bounds, deliberately not exposed —
  * downstream must exact-count, never trust sketch counts).
  */
case class FreqSketchAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.LongMap[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "freq_sketch"

  override def createAggregationBuffer(): mutable.LongMap[Long] =
    mutable.LongMap.empty[Long]

  override def update(buf: mutable.LongMap[Long], input: InternalRow): mutable.LongMap[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Long]
      if (buf.contains(key)) buf(key) += 1L
      else if (buf.size < k) buf(key) = 1L
      else {
        // decrement-all; drop zeros. O(k) but amortized O(1) per stream
        // element (each decrement pays back k prior increments).
        val dead = mutable.ArrayBuffer.empty[Long]
        buf.foreachEntry { (ky, c) => if (c == 1L) dead += ky else buf(ky) = c - 1L }
        dead.foreach(buf.remove)
      }
    }
    buf
  }

  override def merge(a: mutable.LongMap[Long], b: mutable.LongMap[Long]): mutable.LongMap[Long] = {
    b.foreachEntry { (ky, c) => a(ky) = a.getOrElse(ky, 0L) + c }
    if (a.size > k) {
      // subtract the (k+1)-th largest count from everything, keep positives
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      val cut = counts(counts.length - (k + 1))
      val dead = mutable.ArrayBuffer.empty[Long]
      a.foreachEntry { (ky, c) => if (c - cut <= 0L) dead += ky else a(ky) = c - cut }
      dead.foreach(a.remove)
    }
    a
  }

  override def eval(buf: mutable.LongMap[Long]): Any = {
    val keys = buf.keys.toArray
    java.util.Arrays.sort(keys)
    new GenericArrayData(keys)
  }

  override def serialize(buf: mutable.LongMap[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + 16 * buf.size)
    bb.putInt(buf.size)
    buf.foreachEntry { (ky, c) => bb.putLong(ky); bb.putLong(c) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): mutable.LongMap[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val m = mutable.LongMap.empty[Long]
    var i = 0
    while (i < n) { m(bb.getLong) = bb.getLong; i += 1 }
    m
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): FreqSketchAgg =
    copy(child = newChildren.head)
}

object FreqSketchAgg {
  /** Column API: Misra–Gries candidate keys over a long key column. */
  def freqSketch(keyCol: Column, k: Int): Column =
    GraftColumnBridge.column(
      FreqSketchAgg(GraftColumnBridge.expression(keyCol), k)
        .toAggregateExpression())
}
