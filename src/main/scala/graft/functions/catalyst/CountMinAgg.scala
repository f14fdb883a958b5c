package graft.functions.catalyst

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005) as a
  * TypedImperativeAggregate — the frequency slot of the mergeable-summaries
  * family next to [[HllSketchAgg]] (distinct) and the Misra-Gries pass in
  * `HeavyHitters` (exact top offenders).
  *
  * Input is the repo's deterministic NON-NEGATIVE 60-bit md5 hash
  * (`conv(substr(md5(k), 1, 15), 16, 10)`; oracle replay
  * `('0x' || substr(md5(k), 1, 15))::BIGINT`). Row `i` of the D×W counter
  * matrix buckets the key by the `i`-th disjoint 9-bit field of the hash:
  * `col_i = (h >>> 9·i) & (W-1)` — 4×9 = 36 of the 60 bits, no field
  * overlap. Disjoint fields of one md5 are uniform and mix independently
  * for data workloads; an adversarial-input deployment would swap in
  * per-row universal hashing ((a·h+b) mod p), which needs 128-bit mulmod
  * and cannot be replayed exactly in portable SQL — determinism and
  * oracle-replayability win here, and the estimate guarantee
  * (overcount-only, ε ≈ e/W with probability 1−e^−D) is unchanged.
  *
  * Scale shape: the buffer is a CONSTANT D·W longs (16 KB) per group
  * regardless of key cardinality, update is D increments, merge is
  * element-wise sum — partial aggregation ships matrices, never keys, and
  * per-day/per-source sketch tables at rest roll up to any window by
  * matrix addition alone (the additive twin of HLL's register max). The
  * point estimate `min_i M[i][col_i(h)]` NEVER undercounts; it overcounts
  * by at most ε·N with high probability. Exact per-key counts (a plain
  * groupBy) remain the right call when the data is being scanned anyway —
  * the sketch is the pre-aggregated / incremental / bounded-memory path
  * ("how often did key k occur last quarter" without re-scanning 100 TB).
  *
  * eval returns the flattened row-major D·W matrix (Array[Long]) so
  * downstream rollups keep merging; the estimator is exposed as
  * [[CountMinAgg.cmsEstimate]] — pure integer arithmetic, so Spark and a
  * SQL oracle replaying the same fields agree bit-for-bit.
  */
case class CountMinAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  import CountMinAgg.{D, LogW, Size, W}

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Size)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] // 60-bit non-negative by construction
      var i = 0
      while (i < D) {
        val col = ((h >>> (LogW * i)) & (W - 1)).toInt
        buf(i * W + col) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < Size) { a(j) += b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bytes = new Array[Byte](Size * 8)
    ByteBuffer.wrap(bytes).asLongBuffer().put(buf)
    bytes
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = new Array[Long](Size)
    ByteBuffer.wrap(bytes).asLongBuffer().get(buf)
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CountMinAgg =
    copy(child = newChildren.head)
}

object CountMinAgg {
  /** D = 4 rows × W = 512 columns; fixed so the SQL oracle and the
    * aggregate can never drift apart on geometry. 4 disjoint 9-bit hash
    * fields need 36 ≤ 60 hash bits; counters are longs, so no overflow
    * below 2^63 total increments per cell. */
  val D = 4
  val LogW = 9
  val W: Int = 1 << LogW
  val Size: Int = D * W

  /** Column API: CMS counter matrix over a 60-bit non-negative hash
    * column (one increment per row). */
  def cmsSketch(hashCol: Column): Column =
    GraftColumnBridge.column(
      CountMinAgg(GraftColumnBridge.expression(hashCol))
        .toAggregateExpression())

  /** Point estimate for the key with hash `hashSql` against a flattened
    * row-major matrix column (by NAME, so the probe stays one codegen'd
    * SQL expression): `min_i M[i][ (h >>> 9i) & 511 ]`. Pure integer ops —
    * engine-exact. `element_at` is 1-based, mirrored by the oracle's
    * 1-based list indexing. */
  def cmsEstimate(matrixCol: String, hashSql: String): Column = {
    val probes = (0 until D).map { i =>
      s"element_at($matrixCol, CAST(1 + $i * $W + " +
        s"((($hashSql) >> ${LogW * i}) % $W) AS INT))"
    }
    expr(s"least(${probes.mkString(", ")})")
  }
}
