package graft.functions.catalyst

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** MinHash sketch as a TypedImperativeAggregate (the custom-aggregate slot
  * SURVEY §4/§7.3 reserves for sketches): one k-long buffer per group,
  * updated in place per shingle hash — versus k separate min() aggregate
  * expressions each carrying its own buffer slot and projection.
  *
  * The input is the already-hashed shingle (one md5Int long); the aggregate
  * applies the same (a_i·h + b_i) mod M universal family as
  * `operators.Dedup.hashParams`, so signatures are interchangeable with the
  * declarative formulation and with the DuckDB oracle.
  *
  * Partial aggregation works as usual: update on the map side, elementwise-
  * min merge on the reduce side — the shuffle carries k longs per group.
  */
case class MinHashAgg(
    child: Expression,
    k: Int,
    params: Seq[(Long, Long)],
    m: Long,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val as: Array[Long] = params.map(_._1).toArray
  private val bs: Array[Long] = params.map(_._2).toArray

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sketch"

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(k)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var i = 0
      while (i < k) {
        val hv = (as(i) * h + bs(i)) % m
        if (hv < buf(i)) buf(i) = hv
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < k) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * k)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(k)(bb.getLong)
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): MinHashAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Column API: minhash sketch over a long hash column. */
  def minhashSketch(hashCol: Column, k: Int, params: Seq[(Long, Long)],
                    m: Long): Column =
    GraftColumnBridge.column(
      MinHashAgg(GraftColumnBridge.expression(hashCol), k, params, m)
        .toAggregateExpression())
}
