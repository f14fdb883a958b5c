package graft.functions.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the [[graft.io.Layout]] BOUNDARY
  * dimension encoder (the above-dictionary-limit path): map a value to
  * the code of the greatest boundary ≤ value, where the boundaries are
  * the encoder's equal-frequency cut points — provably ≤ 2^bits of them,
  * so they bake into the expression as a config-sized sorted array and
  * encoding is an O(log 2^bits) binary search per row.
  *
  * Why a custom expression (SURVEY §7.3 discipline): the relational
  * alternative is a non-equi join against the boundary table, which
  * Spark plans as BroadcastNestedLoopJoin — rows × 2^bits comparisons on
  * the table-REWRITE hot path (every z-clustered write/append of the
  * layout encodes every row). The expression keeps the lookup inside
  * whole-stage codegen: one static binary-search call per row, no join,
  * no per-row allocation. A value below the FIRST boundary yields NULL —
  * the z-layout's NULL guard turns that into a loud write abort instead
  * of a silently wrong bucket (the append contract: new values may sort
  * above the built dictionary, never below it).
  *
  * `boundaries` are the child's INTERNAL Catalyst values (micros for
  * timestamps, days for dates, UTF8String for strings), sorted ascending;
  * `codes(i)` is the persisted code of `boundaries(i)` — code classes can
  * be empty, so codes are sparse and looked up by index, not equal to it.
  */
case class BoundaryCode(child: Expression,
                        boundaries: IndexedSeq[Any],
                        codes: IndexedSeq[Long])
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "boundary_code"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType | DateType |
         TimestampType | TimestampNTZType | StringType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName: unsupported dimension type ${t.simpleString} " +
        "(orderable scalar expected: integral, date, timestamp, string)")
  }

  private def isString = child.dataType == StringType

  @transient private lazy val longBounds: Array[Long] =
    if (isString) null
    else boundaries.map(_.asInstanceOf[Number].longValue).toArray

  @transient private lazy val utf8Bounds: Array[UTF8String] =
    if (isString) boundaries.map(_.asInstanceOf[UTF8String]).toArray
    else null

  @transient private lazy val codeArr: Array[Long] = codes.toArray

  override def nullSafeEval(v: Any): Any = {
    val i =
      if (isString) LayoutCodecs.searchUtf8(utf8Bounds, v.asInstanceOf[UTF8String])
      else LayoutCodecs.searchLong(longBounds, v.asInstanceOf[Number].longValue)
    if (i < 0) null else codeArr(i)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cRef = ctx.addReferenceObj("codes", codeArr, "long[]")
      val idx = ctx.freshName("idx")
      val search =
        if (isString) {
          val bRef = ctx.addReferenceObj("bounds", utf8Bounds,
            "org.apache.spark.unsafe.types.UTF8String[]")
          s"graft.functions.catalyst.LayoutCodecs.searchUtf8($bRef, $c)"
        } else {
          val bRef = ctx.addReferenceObj("bounds", longBounds, "long[]")
          s"graft.functions.catalyst.LayoutCodecs.searchLong($bRef, (long)$c)"
        }
      s"""
         |int $idx = $search;
         |if ($idx < 0) { ${ev.isNull} = true; } else { ${ev.value} = $cRef[$idx]; }
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): BoundaryCode =
    copy(child = c)
}

/** Static binary-search kernels shared by the interpreted eval and the
  * generated code (the generated class calls them by fully-qualified
  * name — keep them dependency-free and Java-callable). */
object LayoutCodecs {

  /** Greatest index i with b(i) <= v; -1 when v sorts below b(0). */
  def searchLong(b: Array[Long], v: Long): Int = {
    var lo = 0; var hi = b.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (b(mid) <= v) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    ans
  }

  def searchUtf8(b: Array[UTF8String], v: UTF8String): Int = {
    var lo = 0; var hi = b.length - 1; var ans = -1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      if (b(mid).compareTo(v) <= 0) { ans = mid; lo = mid + 1 } else hi = mid - 1
    }
    ans
  }
}

object LayoutExpressions {
  /** Column surface of [[BoundaryCode]]: `boundaries` in the child's
    * EXTERNAL type (the encoder table's collected values); converted to
    * internal representation here against `dt`. */
  def boundaryCode(child: Column, dt: DataType, boundaries: Seq[Any],
                   codes: Seq[Long]): Column = {
    val conv = org.apache.spark.sql.catalyst.CatalystTypeConverters
      .createToCatalystConverter(dt)
    GraftColumnBridge.column(BoundaryCode(
      GraftColumnBridge.expression(child),
      boundaries.map(conv).toIndexedSeq, codes.toIndexedSeq))
  }
}
