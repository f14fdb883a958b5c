package graft.functions.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) as a
  * TypedImperativeAggregate — the mergeable-summaries slot SURVEY §4/§7.3
  * reserves alongside [[MinHashAgg]] and [[FreqSketchAgg]].
  *
  * Input is a NON-NEGATIVE 60-bit hash (the repo's deterministic md5
  * convention: `conv(substr(md5(k), 1, 15), 16, 10)`, replayed in the
  * oracle as `('0x' || substr(md5(k), 1, 15))::BIGINT`). The low
  * [[HllSketchAgg.LogM]] bits pick a register; the register keeps the
  * maximum over rows of `rho(w)` = 1 + number of leading zero bits of the
  * remaining `60 - LogM`-bit suffix `w` (so `rho = WBits + 1 - bitlen(w)`,
  * and `WBits + 1` when `w = 0`). Every step is integer arithmetic on a
  * deterministic hash, so a SQL oracle can rebuild the exact registers
  * with `GROUP BY h % m` + `MAX(rho)` and must agree bit-for-bit.
  *
  * Scale shape (the reason this exists): the aggregation buffer is a
  * CONSTANT m bytes regardless of group cardinality, update is O(1), and
  * merge is an element-wise max — so Spark's partial aggregation ships m
  * bytes per (group × partition) through the shuffle instead of per-key
  * rows, and sketches persisted per partition/day/source can be rolled up
  * to any window later by register-max alone, never rescanning the data.
  * At 100 TB that turns "distinct users over an arbitrary date range" from
  * a full-corpus shuffle into an aggregation over a sketch table. Exact
  * `count(distinct)` (q34's Expand-free form) remains the right call when
  * the result must be exact and the data is already being scanned; the
  * sketch is the pre-aggregated / incremental path.
  *
  * eval returns all m registers (Array[Int], zeros included) rather than
  * the estimate, so rollups can keep merging downstream; the standard
  * estimator (`alpha_m * m^2 / sum(2^-M_j)` with the small-range
  * linear-counting branch) is exposed as [[HllSketchAgg.hllEstimate]] over
  * the register array, written with the exact-integer-sum + identical-IEEE
  * -ops discipline of Qutil so Spark and DuckDB produce identical bits.
  */
case class HllSketchAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  import HllSketchAgg.{LogM, M, MaxRho, WBits}

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long] // 60-bit non-negative by construction
      val j = (h & (M - 1)).toInt
      val w = h >>> LogM
      val rho =
        if (w == 0L) MaxRho
        else WBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(j)) buf(j) = rho.toByte
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < M) { if (b(j) > a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any =
    new GenericArrayData(buf.map(_.toInt))

  override def serialize(buf: Array[Byte]): Array[Byte] = buf

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HllSketchAgg =
    copy(child = newChildren.head)
}

object HllSketchAgg {
  /** m = 64 registers; fixed so the SQL oracle and the aggregate can never
    * drift apart on geometry. 60-bit hash → 6 register bits + 54 suffix
    * bits → rho ∈ [0, 55] fits a byte and 2^(55-rho) fits a long. */
  val LogM = 6
  val M: Int = 1 << LogM
  val WBits: Int = 60 - LogM
  val MaxRho: Int = WBits + 1

  /** Column API: HLL registers over a 60-bit non-negative hash column. */
  def hllSketch(hashCol: Column): Column =
    GraftColumnBridge.column(
      HllSketchAgg(GraftColumnBridge.expression(hashCol))
        .toAggregateExpression())

  /** Cardinality estimate from a register array column (by NAME, so the
    * whole estimator stays one codegen'd SQL expression).
    *
    * Float determinism (Qutil discipline): `sum(2^-M_j)` is computed as the
    * EXACT integer `sum(2^(MaxRho - M_j))` (≤ m · 2^55 = 2^61, inside
    * long), so the only floating-point steps are one int→double
    * conversion, literal-for-literal identical multiply/divide chains, and
    * the deterministic floor-round — identical IEEE ops on identical bits
    * in Spark and DuckDB. The small-range linear-counting branch
    * (`raw ≤ 2.5 m` with empty registers) is part of the estimator's
    * contract; `ln` there is libm-dependent, so oracle queries should pick
    * groupings with cardinality ≫ 2.5 m (= 160) where the branch is dead.
    */
  def hllEstimate(regsCol: String, roundDecimals: Int = 2): Column = {
    val intsum =
      s"aggregate($regsCol, CAST(0 AS BIGINT), " +
        s"(acc, r) -> acc + shiftleft(CAST(1 AS BIGINT), $MaxRho - r))"
    val v = s"size(filter($regsCol, r -> r = 0))"
    // alpha_64 * m^2 * 2^MaxRho. Every constant is CAST(… AS DOUBLE) so
    // neither engine's bare-decimal-literal typing (Spark expr() and DuckDB
    // both parse `0.7213` as DECIMAL) can leak decimal arithmetic in —
    // the oracle SQL uses the identical cast chain.
    val raw = s"((CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE) + " +
      s"CAST(1.079 AS DOUBLE) / CAST(64 AS DOUBLE))) * CAST(4096 AS DOUBLE)) * " +
      s"CAST(36028797018963968 AS DOUBLE) / CAST($intsum AS DOUBLE)"
    val est = s"CASE WHEN $raw <= CAST(160 AS DOUBLE) AND $v > 0 " +
      s"THEN CAST(64 AS DOUBLE) * ln(CAST(64 AS DOUBLE) / CAST($v AS DOUBLE)) " +
      s"ELSE $raw END"
    val p = math.pow(10, roundDecimals).toLong
    expr(s"floor(($est) * CAST($p AS DOUBLE) + CAST(0.5 AS DOUBLE)) / " +
      s"CAST($p AS DOUBLE)")
  }
}
