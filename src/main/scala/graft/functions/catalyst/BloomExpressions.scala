package graft.functions.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.StringType
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.BloomFilter

/** Membership test against a pre-built Bloom filter, as a native codegen'd
  * predicate.
  *
  * Why an expression and not a UDF: this sits in the per-row hot path of
  * incremental ingest (every new document's fingerprint is probed), and a
  * Scala UDF would break whole-stage codegen around it. The filter object
  * itself ships inside the expression (spark.util.sketch.BloomFilter is
  * Serializable) and surfaces in generated code via `addReferenceObj` —
  * the same mechanism Spark's internal runtime-filter expression uses.
  *
  * Guarantee relied on by `Dedup.dedupeAgainstIndexBloom`: NO false
  * negatives — `false` proves the key was never inserted, so negative rows
  * can skip the exact anti-join entirely; `true` rows (false-positive rate
  * `fpp`) still get exact verification. */
case class BloomMightContain(child: Expression, filter: BloomFilter)
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${t.simpleString}")
  }
  override def prettyName: String = "bloom_might_contain"

  // BloomFilter.putString hashes the UTF-8 bytes, which is exactly what
  // UTF8String carries — so probing with getBytes matches string inserts.
  override def nullSafeEval(v: Any): Any =
    filter.mightContainBinary(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bf.mightContainBinary($c.getBytes())")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Long-key twin of [[BloomMightContain]] for integral join keys.
  *
  * `DataFrameStatFunctions.bloomFilter` inserts integral columns via
  * `putLong`, so the probe must be `mightContainLong` — probing the
  * decimal-string rendering would hash different bytes and lose the
  * no-false-negative guarantee the semi-join reduction relies on. */
case class BloomMightContainLong(child: Expression, filter: BloomFilter)
    extends UnaryExpression with Predicate {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a bigint argument, got ${t.simpleString}")
  }
  override def prettyName: String = "bloom_might_contain_long"

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bf = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    defineCodeGen(ctx, ev, c => s"$bf.mightContainLong($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): BloomMightContainLong =
    copy(child = newChild)
}

object BloomExpressions {
  def mightContain(c: Column, filter: BloomFilter): Column =
    GraftColumnBridge.column(BloomMightContain(
      GraftColumnBridge.expression(c), filter))

  def mightContainLong(c: Column, filter: BloomFilter): Column =
    GraftColumnBridge.column(BloomMightContainLong(
      GraftColumnBridge.expression(c), filter))
}
