package graft.functions.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}
import org.apache.spark.sql.functions.{aggregate, lit, zip_with}
import org.apache.spark.sql.GraftColumnBridge

/** Native Catalyst expressions for the similarity hot path.
  *
  * Why custom expressions here (SURVEY §7.3: "custom Expression only where
  * built-ins genuinely can't express it *efficiently*"): the composable
  * alternative — `aggregate(zip_with(a,b,*), 0, +)` — allocates an
  * intermediate array per row and interprets the lambda per element, which
  * is the inner loop of a 100 TB ANN scan. `CosineSimilarity` fuses the
  * three accumulators (x·y, x·x, y·y) into one codegen'd loop: no
  * allocation, no virtual calls, stays inside whole-stage codegen.
  *
  * Summation order is the same sequential left fold as the higher-order
  * function AND DuckDB's `list_reduce`, so results are bit-identical across
  * all three formulations (the DuckDB oracle for q25 relies on this).
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // ctx.freshName for every local: many instances of this expression can
      // land in one generated function (q26 projects 8 tables × 6 planes), and
      // fixed names make Janino reject the class → silent interpreted fallback.
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Fused cosine similarity: one pass computing x·y, ‖x‖², ‖y‖². Returns
  * null for zero-norm inputs (instead of NaN) — callers decide the default. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var xy = 0.0; var xx = 0.0; var yy = 0.0; var i = 0
    while (i < n) {
      val xi = x.getDouble(i); val yi = y.getDouble(i)
      xy += xi * yi; xx += xi * xi; yy += yi * yi; i += 1
    }
    if (xx == 0.0 || yy == 0.0) null
    else java.lang.Double.valueOf(xy / (math.sqrt(xx) * math.sqrt(yy)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // See DotProduct.doGenCode: freshName per local or Janino rejects the
      // generated class when two instances share a function.
      val n = ctx.freshName("n")
      val xy = ctx.freshName("xy")
      val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy")
      val i = ctx.freshName("i")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $xy = 0.0, $xx = 0.0, $yy = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $a.getDouble($i);
         |  double $yi = $b.getDouble($i);
         |  $xy += $xi * $yi; $xx += $xi * $xi; $yy += $yi * $yi;
         |}
         |if ($xx == 0.0 || $yy == 0.0) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $xy / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

/** Fused squared-L2 distance: one pass accumulating (x_i - y_i)², same
  * sequential left fold as DuckDB's list_reduce over the per-element
  * squared differences — the PQ code-assignment metric (argmin ties are
  * broken by code id, so bit-identical distances are what keep Spark and
  * the SQL oracle assigning identical codes near Voronoi boundaries). */
case class L2Squared(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    VectorExpressions.checkDoubleArrays(prettyName, left, right)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "l2_squared"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      val d = x.getDouble(i) - y.getDouble(i); acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName per local — see DotProduct.doGenCode
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $a.getDouble($i) - $b.getDouble($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): L2Squared =
    copy(left = l, right = r)
}

object VectorExpressions {

  private[catalyst] def checkDoubleArrays(name: String, l: Expression,
                                          r: Expression): TypeCheckResult = {
    val ok = Seq(l, r).forall(_.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires two array<double> arguments, got " +
        s"(${l.dataType.simpleString}, ${r.dataType.simpleString})")
  }

  def dotProduct(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def cosineSim(a: Column, b: Column): Column =
    GraftColumnBridge.column(CosineSimilarity(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  def l2Squared(a: Column, b: Column): Column =
    GraftColumnBridge.column(L2Squared(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Reference HOF formulation of l2Squared — same fold order; spec pin. */
  def l2SquaredHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0d),
      (acc, x) => acc + x)

  /** Reference formulation via built-in higher-order functions — same fold
    * order, used by specs to pin bit-equality with the native expressions. */
  def dotProductHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0d), (acc, x) => acc + x)

  /** Register `dot_product` / `cosine_sim` for SQL use. Idempotent. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    registry.createOrReplaceTempFunction(
      "dot_product", exprs => DotProduct(exprs.head, exprs(1)), "built-in")
    registry.createOrReplaceTempFunction(
      "cosine_sim", exprs => CosineSimilarity(exprs.head, exprs(1)), "built-in")
  }
}
