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

/** KMV / bottom-k distinct sketch (Bar-Yossef et al. 2002; the theta-sketch
  * building block) as a TypedImperativeAggregate — the set-operation slot of
  * the mergeable-summaries family: [[HllSketchAgg]] answers "how many
  * distinct", KMV additionally answers "how much do two segments OVERLAP"
  * from sketches alone, because the k smallest hashes of a set are a
  * uniform sample of its distinct universe that is CLOSED under union
  * (bottom-k of A ∪ B = bottom-k of bottom-k(A) ∪ bottom-k(B)).
  *
  * Input is the repo's deterministic NON-NEGATIVE 60-bit md5 hash; the
  * buffer keeps the K smallest DISTINCT hash values seen (a capped ordered
  * set — duplicates are absorbed, so the sketch is a pure function of the
  * distinct key set, never of row multiplicity or order). Update is an
  * O(log K) probe that most rows fail cheaply against the current max;
  * merge is set-union-then-trim. Everything is integer comparisons on a
  * deterministic hash, so a SQL oracle (`ORDER BY h LIMIT k` over distinct
  * hashes) rebuilds the sketch bit-for-bit.
  *
  * Scale shape: a `count(distinct)`-style pre-shuffle of (group, key) pairs
  * is avoided entirely — partial aggregation ships ≤ K longs per
  * (group × partition), and per-segment sketch tables at rest support
  * union / intersection / Jaccard estimates across arbitrary segment pairs
  * later without rescanning the data (the "audience overlap at 100 TB"
  * problem). Estimators (all replayable SQL arithmetic over the returned
  * array): with the union sketch U = first K of sort(union(sa, sb)) and
  * θ = max(U): |A ∪ B| ≈ (K−1) · 2^60 / θ when |U| = K (exact |U|
  * otherwise, since both sets were then captured completely), Jaccard
  * ≈ |{x ∈ U : x ∈ sa ∧ x ∈ sb}| / K.
  */
case class KmvSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.TreeSet[Long]] {

  import KmvSketchAgg.K

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): mutable.TreeSet[Long] =
    mutable.TreeSet.empty[Long]

  override def update(buf: mutable.TreeSet[Long], input: InternalRow): mutable.TreeSet[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (buf.size < K) buf += h
      else if (h < buf.last && !buf.contains(h)) { buf += h; buf -= buf.last }
    }
    buf
  }

  override def merge(a: mutable.TreeSet[Long], b: mutable.TreeSet[Long]): mutable.TreeSet[Long] = {
    a ++= b
    while (a.size > K) a -= a.last
    a
  }

  override def eval(buf: mutable.TreeSet[Long]): Any =
    new GenericArrayData(buf.toArray)

  override def serialize(buf: mutable.TreeSet[Long]): Array[Byte] = {
    val bytes = new Array[Byte](buf.size * 8)
    val bb = ByteBuffer.wrap(bytes).asLongBuffer()
    buf.foreach(bb.put)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): mutable.TreeSet[Long] = {
    val lb = ByteBuffer.wrap(bytes).asLongBuffer()
    val buf = mutable.TreeSet.empty[Long]
    while (lb.hasRemaining) buf += lb.get()
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): KmvSketchAgg =
    copy(child = newChildren.head)
}

object KmvSketchAgg {
  /** K = 64 retained hashes; fixed so the SQL oracle and the aggregate can
    * never drift on geometry. Relative error of the union estimator is
    * ~1/sqrt(K−2) ≈ 13% — the HLL-m=64 band. */
  val K = 64

  /** 2^60 as an exact double literal (the hash-space size; 60-bit hashes
    * convert to double with round-to-nearest identically in Spark and
    * DuckDB). */
  val HashSpace = "CAST(1152921504606846976 AS DOUBLE)"

  /** Column API: ascending array of the K smallest distinct hash values. */
  def kmvSketch(hashCol: Column): Column =
    GraftColumnBridge.column(
      KmvSketchAgg(GraftColumnBridge.expression(hashCol))
        .toAggregateExpression())
}
