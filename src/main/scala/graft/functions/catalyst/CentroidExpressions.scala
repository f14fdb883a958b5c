package graft.functions.catalyst

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}
import org.apache.spark.sql.GraftColumnBridge

/** Size-independent centroid assignment for the IVF quantizer paths.
  *
  * The original formulation unrolled ONE expression per centroid
  * (`array_max(array(struct(dot_product(v, lit(c0))...), ...))` — and its
  * SQL-TVF twin generated a `named_struct` cascade per cell), so plan size
  * and Janino compile time grew linearly with nLists: measured cold
  * compiles of 2.1 s → 5.9 s → 8.3 s at nLists 16 → 256 → 1024 on the
  * Column path (tools/ProbeArgmax) and ~2 minutes at just 16 cells × 64
  * dims on the generated-SQL TVF path (SCALE.md). Production IVF wants
  * nLists in the thousands, where the cascade blows past JVM method-size
  * limits into interpreted fallback.
  *
  * These expressions take the centroids as ONE `array<array<double>>`
  * value — a single literal in the plan, so plan size and compile time are
  * flat at any nLists — and run the argmax as a loop. When the matrix is
  * foldable (every call site: trained centroids are literals), it is
  * flattened ONCE into a plain `double[]` + offsets and embedded as a
  * codegen reference object, so the hot loop reads a contiguous Java
  * array with no per-(row, cell) ArrayData view allocation; a generic
  * ArrayData path covers non-literal matrices.
  *
  * Bit-compatibility contract (what keeps q41/q140/q221–q223 oracle
  * hashes unchanged): the per-centroid score is the same sequential
  * left-fold dot product as [[DotProduct]], cells are scanned in
  * ascending index order, and a candidate replaces the incumbent only on
  * a STRICTLY greater score — exactly the `max by (score, -index)` tie
  * break of the struct-cascade (ties keep the lowest index).
  */
/** A centroid matrix as a COMPACT foldable leaf: evaluates to the same
  * `array<array<double>>` value as `typedlit(cells)` but renders as
  * `centroid_matrix(<nLists>x<dims>)` in plan strings — a plain Literal
  * prints every element, which at production nLists (thousands of cells ×
  * hundreds of dims) bloats every explain/UI/event-log rendering by
  * megabytes (measured 1.3 MB of plan string at 1024×64 via typedlit).
  * Codegen embeds the value as a reference object, exactly like Literal
  * does for non-primitive types. */
case class CentroidMatrixLiteral(cells: Seq[Seq[Double]])
    extends org.apache.spark.sql.catalyst.expressions.LeafExpression {
  // NOT foldable, deliberately: ConstantFolding replaces any foldable
  // non-Literal with a plain Literal of its value — which reintroduces the
  // full-matrix plan print this node exists to avoid. The value is still a
  // constant (eval ignores the row; the assignment expressions flatten it
  // once at codegen).
  override def foldable: Boolean = false
  override def nullable: Boolean = false
  override def dataType: DataType =
    ArrayType(ArrayType(DoubleType, containsNull = false), containsNull = false)
  override def prettyName: String = "centroid_matrix"
  override def toString: String =
    s"centroid_matrix(${cells.length}x${cells.headOption.fold(0)(_.length)})"
  override def sql: String = toString

  @transient private lazy val value: ArrayData =
    new GenericArrayData(cells.map(c =>
      new GenericArrayData(c.toArray): Any).toArray)

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = value

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centMatrix", value,
      "org.apache.spark.sql.catalyst.util.ArrayData")
    ev.copy(
      code = org.apache.spark.sql.catalyst.expressions.codegen.EmptyBlock,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral,
      value = org.apache.spark.sql.catalyst.expressions.codegen.JavaCode
        .global(ref, dataType))
  }
}

trait CentroidMatrixSupport { self: BinaryExpression =>

  /** Constant matrix flattened to (values, offsets): centroid c spans
    * flat[offs(c) until offs(c+1)]. None for non-constant or null-bearing
    * matrices → the generic ArrayData path. */
  @transient protected lazy val folded: Option[(Array[Double], Array[Int])] =
    if (!right.foldable && !right.isInstanceOf[CentroidMatrixLiteral]) None
    else {
      val m = right.eval(null)
      if (m == null) None
      else {
        val md = m.asInstanceOf[ArrayData]
        val nc = md.numElements()
        var anyNull = false
        val cells = new Array[ArrayData](nc)
        var c = 0
        while (c < nc && !anyNull) {
          if (md.isNullAt(c)) anyNull = true
          else cells(c) = md.getArray(c)
          c += 1
        }
        if (anyNull) None
        else {
          val offs = new Array[Int](nc + 1)
          c = 0
          while (c < nc) { offs(c + 1) = offs(c) + cells(c).numElements(); c += 1 }
          val flat = new Array[Double](offs(nc))
          c = 0
          while (c < nc) {
            var i = 0
            val cell = cells(c)
            val n = cell.numElements()
            while (i < n) { flat(offs(c) + i) = cell.getDouble(i); i += 1 }
            c += 1
          }
          Some((flat, offs))
        }
      }
    }
}

case class NearestCell(left: Expression, right: Expression)
    extends BinaryExpression with CentroidMatrixSupport {

  override def checkInputDataTypes(): TypeCheckResult =
    CentroidExpressions.checkVecMatrix(prettyName, left, right)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_cell"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    folded match {
      case Some((flat, offs)) =>
        val nc = offs.length - 1
        var best = Double.NegativeInfinity
        var bi = -1
        var c = 0
        while (c < nc) {
          val n = math.min(v.numElements(), offs(c + 1) - offs(c))
          var acc = 0.0
          var i = 0
          while (i < n) { acc += v.getDouble(i) * flat(offs(c) + i); i += 1 }
          if (acc > best) { best = acc; bi = c }
          c += 1
        }
        bi
      case None =>
        val m = b.asInstanceOf[ArrayData]
        val nc = m.numElements()
        var best = Double.NegativeInfinity
        var bi = -1
        var c = 0
        while (c < nc) {
          val cv = m.getArray(c)
          val n = math.min(v.numElements(), cv.numElements())
          var acc = 0.0
          var i = 0
          while (i < n) { acc += v.getDouble(i) * cv.getDouble(i); i += 1 }
          if (acc > best) { best = acc; bi = c }
          c += 1
        }
        bi
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // freshName per local — see DotProduct.doGenCode
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val body = folded match {
        case Some((flat, offs)) =>
          val flatRef = ctx.addReferenceObj("centFlat", flat, "double[]")
          val offsRef = ctx.addReferenceObj("centOffs", offs, "int[]")
          val base = ctx.freshName("base")
          s"""
             |for (int $c = 0; $c < ${offs.length - 1}; $c++) {
             |  int $base = $offsRef[$c];
             |  int $n = java.lang.Math.min($a.numElements(), $offsRef[$c + 1] - $base);
             |  double $acc = 0.0;
             |  for (int $i = 0; $i < $n; $i++) {
             |    $acc += $a.getDouble($i) * $flatRef[$base + $i];
             |  }
             |  if ($acc > $best) { $best = $acc; $bi = $c; }
             |}
           """.stripMargin
        case None =>
          val nc = ctx.freshName("nc")
          val cv = ctx.freshName("cv")
          s"""
             |int $nc = $b.numElements();
             |for (int $c = 0; $c < $nc; $c++) {
             |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $b.getArray($c);
             |  int $n = java.lang.Math.min($a.numElements(), $cv.numElements());
             |  double $acc = 0.0;
             |  for (int $i = 0; $i < $n; $i++) {
             |    $acc += $a.getDouble($i) * $cv.getDouble($i);
             |  }
             |  if ($acc > $best) { $best = $acc; $bi = $c; }
             |}
           """.stripMargin
      }
      s"""
         |double $best = Double.NEGATIVE_INFINITY;
         |int $bi = -1;
         |$body
         |${ev.value} = $bi;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCell =
    copy(left = l, right = r)
}

/** The `nProbe` nearest cell indices, best first — the multi-probe sibling
  * of [[NearestCell]], replacing the
  * `transform(slice(reverse(array_sort(<struct cascade>)), 1, n), ...)`
  * formulation with one insertion loop (bounded scratch: nProbe scores +
  * nProbe ids). Ordering contract matches the sort-based form: descending
  * score, ascending index on ties (ascending scan + strict comparisons
  * reproduce it exactly). Returns min(nProbe, nLists) ids. */
case class NearestCells(left: Expression, right: Expression, nProbe: Int)
    extends BinaryExpression with CentroidMatrixSupport {
  require(nProbe >= 1, s"nProbe must be ≥ 1, got $nProbe")

  override def checkInputDataTypes(): TypeCheckResult =
    CentroidExpressions.checkVecMatrix(prettyName, left, right)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "nearest_cells"

  private def insertLoop(v: ArrayData, score: Int => Double, nc: Int): Any = {
    val bs = new Array[Double](nProbe)
    val bidx = new Array[Int](nProbe)
    var filled = 0
    var c = 0
    while (c < nc) {
      val acc = score(c)
      if (filled < nProbe || acc > bs(nProbe - 1)) {
        var pos = if (filled < nProbe) { filled += 1; filled - 1 } else nProbe - 1
        while (pos > 0 && bs(pos - 1) < acc) {
          bs(pos) = bs(pos - 1); bidx(pos) = bidx(pos - 1); pos -= 1
        }
        bs(pos) = acc; bidx(pos) = c
      }
      c += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(bidx, filled))
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    folded match {
      case Some((flat, offs)) =>
        insertLoop(v, { c =>
          val n = math.min(v.numElements(), offs(c + 1) - offs(c))
          var acc = 0.0
          var i = 0
          while (i < n) { acc += v.getDouble(i) * flat(offs(c) + i); i += 1 }
          acc
        }, offs.length - 1)
      case None =>
        val m = b.asInstanceOf[ArrayData]
        insertLoop(v, { c =>
          val cv = m.getArray(c)
          val n = math.min(v.numElements(), cv.numElements())
          var acc = 0.0
          var i = 0
          while (i < n) { acc += v.getDouble(i) * cv.getDouble(i); i += 1 }
          acc
        }, m.numElements())
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val bs = ctx.freshName("bs")
      val bidx = ctx.freshName("bidx")
      val filled = ctx.freshName("filled")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val pos = ctx.freshName("pos")
      def insert = // shared tail: insertion of (acc, c) into the heap arrays
        s"""
           |  if ($filled < $nProbe || $acc > $bs[$nProbe - 1]) {
           |    int $pos;
           |    if ($filled < $nProbe) { $pos = $filled; $filled++; }
           |    else { $pos = $nProbe - 1; }
           |    while ($pos > 0 && $bs[$pos - 1] < $acc) {
           |      $bs[$pos] = $bs[$pos - 1]; $bidx[$pos] = $bidx[$pos - 1]; $pos--;
           |    }
           |    $bs[$pos] = $acc; $bidx[$pos] = $c;
           |  }
         """.stripMargin
      val scan = folded match {
        case Some((flat, offs)) =>
          val flatRef = ctx.addReferenceObj("centFlat", flat, "double[]")
          val offsRef = ctx.addReferenceObj("centOffs", offs, "int[]")
          val base = ctx.freshName("base")
          s"""
             |for (int $c = 0; $c < ${offs.length - 1}; $c++) {
             |  int $base = $offsRef[$c];
             |  int $n = java.lang.Math.min($a.numElements(), $offsRef[$c + 1] - $base);
             |  double $acc = 0.0;
             |  for (int $i = 0; $i < $n; $i++) {
             |    $acc += $a.getDouble($i) * $flatRef[$base + $i];
             |  }
             |$insert
             |}
           """.stripMargin
        case None =>
          val nc = ctx.freshName("nc")
          val cv = ctx.freshName("cv")
          s"""
             |int $nc = $b.numElements();
             |for (int $c = 0; $c < $nc; $c++) {
             |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $b.getArray($c);
             |  int $n = java.lang.Math.min($a.numElements(), $cv.numElements());
             |  double $acc = 0.0;
             |  for (int $i = 0; $i < $n; $i++) {
             |    $acc += $a.getDouble($i) * $cv.getDouble($i);
             |  }
             |$insert
             |}
           """.stripMargin
      }
      s"""
         |double[] $bs = new double[$nProbe];
         |int[] $bidx = new int[$nProbe];
         |int $filled = 0;
         |$scan
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  java.util.Arrays.copyOf($bidx, $filled));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCells =
    copy(left = l, right = r)
}

/** Argmin squared-L2 code assignment — the PQ sibling of [[NearestCell]]:
  * codebooks as ONE matrix value, the argmin as a loop, ties to the LOWEST
  * code id (exactly the `array_min(struct(l2_sq, code))` cascade this
  * replaces — ascending scan + strictly-smaller replacement). The cascade
  * unrolled nSub × nCodes L2Squared expressions through pqTopK/ivfPqTopK;
  * production PQ (nCodes = 256) hits the same compile ceiling the centroid
  * cascade did. The distance is the same sequential (x−y)² left fold as
  * [[L2Squared]], so q119/q140 oracle replays hash unchanged. */
case class NearestCodeL2(left: Expression, right: Expression)
    extends BinaryExpression with CentroidMatrixSupport {

  override def checkInputDataTypes(): TypeCheckResult =
    CentroidExpressions.checkVecMatrix(prettyName, left, right)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_code_l2"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    folded match {
      case Some((flat, offs)) =>
        val nc = offs.length - 1
        var best = Double.PositiveInfinity
        var bi = -1
        var c = 0
        while (c < nc) {
          val n = math.min(v.numElements(), offs(c + 1) - offs(c))
          var acc = 0.0
          var i = 0
          while (i < n) {
            val d = v.getDouble(i) - flat(offs(c) + i); acc += d * d; i += 1
          }
          if (acc < best) { best = acc; bi = c }
          c += 1
        }
        bi
      case None =>
        val m = b.asInstanceOf[ArrayData]
        val nc = m.numElements()
        var best = Double.PositiveInfinity
        var bi = -1
        var c = 0
        while (c < nc) {
          val cv = m.getArray(c)
          val n = math.min(v.numElements(), cv.numElements())
          var acc = 0.0
          var i = 0
          while (i < n) {
            val d = v.getDouble(i) - cv.getDouble(i); acc += d * d; i += 1
          }
          if (acc < best) { best = acc; bi = c }
          c += 1
        }
        bi
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val best = ctx.freshName("best")
      val bi = ctx.freshName("bi")
      val c = ctx.freshName("c")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val d = ctx.freshName("d")
      val body = folded match {
        case Some((flat, offs)) =>
          val flatRef = ctx.addReferenceObj("codeFlat", flat, "double[]")
          val offsRef = ctx.addReferenceObj("codeOffs", offs, "int[]")
          val base = ctx.freshName("base")
          s"""
             |for (int $c = 0; $c < ${offs.length - 1}; $c++) {
             |  int $base = $offsRef[$c];
             |  int $n = java.lang.Math.min($a.numElements(), $offsRef[$c + 1] - $base);
             |  double $acc = 0.0;
             |  for (int $i = 0; $i < $n; $i++) {
             |    double $d = $a.getDouble($i) - $flatRef[$base + $i];
             |    $acc += $d * $d;
             |  }
             |  if ($acc < $best) { $best = $acc; $bi = $c; }
             |}
           """.stripMargin
        case None =>
          val nc = ctx.freshName("nc")
          val cv = ctx.freshName("cv")
          s"""
             |int $nc = $b.numElements();
             |for (int $c = 0; $c < $nc; $c++) {
             |  org.apache.spark.sql.catalyst.util.ArrayData $cv = $b.getArray($c);
             |  int $n = java.lang.Math.min($a.numElements(), $cv.numElements());
             |  double $acc = 0.0;
             |  for (int $i = 0; $i < $n; $i++) {
             |    double $d = $a.getDouble($i) - $cv.getDouble($i);
             |    $acc += $d * $d;
             |  }
             |  if ($acc < $best) { $best = $acc; $bi = $c; }
             |}
           """.stripMargin
      }
      s"""
         |double $best = Double.POSITIVE_INFINITY;
         |int $bi = -1;
         |$body
         |${ev.value} = $bi;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): NearestCodeL2 =
    copy(left = l, right = r)
}

object CentroidExpressions {

  private[catalyst] def checkVecMatrix(name: String, vec: Expression,
                                       matrix: Expression): TypeCheckResult = {
    val vecOk = vec.dataType match {
      case ArrayType(DoubleType, _) => true
      case _ => false
    }
    val matOk = matrix.dataType match {
      case ArrayType(ArrayType(DoubleType, _), _) => true
      case _ => false
    }
    if (vecOk && matOk) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$name requires (array<double>, array<array<double>>), got " +
        s"(${vec.dataType.simpleString}, ${matrix.dataType.simpleString})")
  }

  def nearestCell(vec: Column, matrix: Column): Column =
    GraftColumnBridge.column(NearestCell(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(matrix)))

  def nearestCells(vec: Column, matrix: Column, nProbe: Int): Column =
    GraftColumnBridge.column(NearestCells(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(matrix),
      nProbe))

  /** Trained-model entry points: the matrix rides as the compact
    * [[CentroidMatrixLiteral]] (plan strings stay config-sized at any
    * nLists). */
  def nearestCell(vec: Column, cents: Seq[Array[Double]]): Column =
    GraftColumnBridge.column(NearestCell(
      GraftColumnBridge.expression(vec),
      CentroidMatrixLiteral(cents.map(_.toSeq))))

  def nearestCells(vec: Column, cents: Seq[Array[Double]],
                   nProbe: Int): Column =
    GraftColumnBridge.column(NearestCells(
      GraftColumnBridge.expression(vec),
      CentroidMatrixLiteral(cents.map(_.toSeq)), nProbe))

  /** The matrix itself as a compact Column (drift report's element_at
    * lookups). */
  def matrixLit(cents: Seq[Array[Double]]): Column =
    GraftColumnBridge.column(CentroidMatrixLiteral(cents.map(_.toSeq)))

  /** PQ code assignment against a trained codebook (compact matrix). */
  def nearestCodeL2(vec: Column, codes: Seq[Array[Double]]): Column =
    GraftColumnBridge.column(NearestCodeL2(
      GraftColumnBridge.expression(vec),
      CentroidMatrixLiteral(codes.map(_.toSeq))))

  def nearestCodeL2(vec: Column, matrix: Column): Column =
    GraftColumnBridge.column(NearestCodeL2(
      GraftColumnBridge.expression(vec), GraftColumnBridge.expression(matrix)))
}
