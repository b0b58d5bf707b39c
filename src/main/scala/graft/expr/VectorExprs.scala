package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Vector math as codegen'd Catalyst expressions. The composable
  * formulation (`aggregate(zip_with(...))`) runs on the interpreted
  * higher-order-function path — fine for one evaluation, hostile in an
  * all-pairs similarity join where the dot product is the innermost
  * loop of millions of rows.
  *
  * Accepts array<float> or array<double>; floats are widened exactly.
  * Accumulation is sequential IEEE double, matching a left-to-right
  * `aggregate` fold.
  */
object VectorExprs {

  def dotProduct(ad: ArrayData, bd: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(ad.numElements(), bd.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) ad.getFloat(i).toDouble else ad.getDouble(i)
      val y = if (bFloat) bd.getFloat(i).toDouble else bd.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** The oracle-portable quantized dot: per element, product in IEEE
    * double, scaled by 1e12, truncated toward zero to a long, summed
    * exactly; result divided back. Bit-identical to the SQL
    * `aggregate(zip_with(a, b, (x, y) -> CAST((x*y)*1e12 AS BIGINT)))`
    * formula (same op sequence per element; long sum is exact and
    * order-free) but codegen'd instead of interpreted.
    */
  def quantizedDot(ad: ArrayData, bd: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(ad.numElements(), bd.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val x = if (aFloat) ad.getFloat(i).toDouble else ad.getDouble(i)
      val y = if (bFloat) bd.getFloat(i).toDouble else bd.getDouble(i)
      acc += ((x * y) * 1e12).toLong // toLong truncates toward zero, like CAST
      i += 1
    }
    acc.toDouble / 1e12
  }

  /** [[quantizedDot]] over plain JVM arrays — the same truncation/long
    * accumulation, for callers outside the expression tree (streaming
    * state handlers) that must agree bit-for-bit with the column form.
    */
  def quantizedDotArr(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += ((a(i) * b(i)) * 1e12).toLong
      i += 1
    }
    acc.toDouble / 1e12
  }

  /** [[quantizedDot]] between a column-side [[ArrayData]] and a plain
    * JVM array (a codebook entry held by an expression) — same
    * truncation/long accumulation as the other two forms, so all three
    * agree bit-for-bit.
    */
  def quantizedDotMixed(ad: ArrayData, b: Array[Double], aFloat: Boolean): Double = {
    val n = math.min(ad.numElements(), b.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      val x = if (aFloat) ad.getFloat(i).toDouble else ad.getDouble(i)
      acc += ((x * b(i)) * 1e12).toLong
      i += 1
    }
    acc.toDouble / 1e12
  }

  /** Exact integer dot product over two array<bigint> columns — the
    * codegen twin of `aggregate(zip_with(a, b, (x, y) -> x * y), 0L,
    * (acc, x) -> acc + x)` for equal-length, null-free arrays (the only
    * shape the int8-code search path produces): long multiply/add is
    * exact and order-free, so the value is bit-identical to the
    * interpreted fold, including two's-complement wraparound should a
    * caller ever overflow (s21's codes bound |dot| ≤ 64·127² « 2^63).
    * Like [[dotProduct]], iterates to the SHORTER length — the HOF form
    * instead null-pads (yielding NULL), so callers must pass
    * equal-length arrays, which every quantized-code column does by
    * construction.
    */
  def longDot(ad: ArrayData, bd: ArrayData): Long = {
    val n = math.min(ad.numElements(), bd.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += ad.getLong(i) * bd.getLong(i)
      i += 1
    }
    acc
  }

  /** Exact integer L1 distance over two array<bigint> columns — the
    * codegen twin of `aggregate(zip_with(a, b, (x, y) -> abs(x - y)),
    * 0L, (acc, v) -> acc + v)` under the same equal-length, null-free
    * contract as [[longDot]]: per element `math.abs` of the long
    * difference (two's-complement semantics identical to the HOF's
    * `abs`), long sum is exact and order-free. Callers keep |x−y|
    * far below 2^63 by construction (m03's histogram counts are
    * bounded by n_bytes).
    */
  def longL1(ad: ArrayData, bd: ArrayData): Long = {
    val n = math.min(ad.numElements(), bd.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += math.abs(ad.getLong(i) - bd.getLong(i))
      i += 1
    }
    acc
  }

  /** Quantized squared-L2 distance in integer picounits: per element,
    * the squared difference in IEEE double, scaled by 1e12, truncated
    * toward zero to a long, summed exactly. Bit-identical to the SQL
    * `aggregate(zip_with(a, b, (x, y) -> CAST(((x-y)*(x-y))*1e12 AS
    * BIGINT)), 0L, (a, y) -> a + y)` fold — the innermost loop of a
    * PQ / k-means assignment, codegen'd instead of interpreted.
    */
  def quantizedL2(ad: ArrayData, bd: ArrayData, aFloat: Boolean, bFloat: Boolean): Long = {
    val n = math.min(ad.numElements(), bd.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      val x = if (aFloat) ad.getFloat(i).toDouble else ad.getDouble(i)
      val y = if (bFloat) bd.getFloat(i).toDouble else bd.getDouble(i)
      val d = x - y
      acc += ((d * d) * 1e12).toLong // toLong truncates toward zero, like CAST
      i += 1
    }
    acc
  }

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def quantized_dot(a: Column, b: Column): Column =
    ColumnBridge.column(QuantizedDotExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def quantized_l2(a: Column, b: Column): Column =
    ColumnBridge.column(QuantizedL2Expr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def long_dot(a: Column, b: Column): Column =
    ColumnBridge.column(LongDotExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def long_l1(a: Column, b: Column): Column =
    ColumnBridge.column(LongL1Expr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))

  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }
}

case class DotProductExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"dot_product expects array<float|double>, got $t")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.dotProduct(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.VectorExprs.dotProduct($a, $b, ${isFloat(left)}, ${isFloat(right)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProductExpr =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd [[VectorExprs.quantizedDot]] — see that scaladoc. */
case class QuantizedDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantized_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"quantized_dot expects array<float|double>, got $t")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.quantizedDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.VectorExprs.quantizedDot($a, $b, ${isFloat(left)}, ${isFloat(right)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDotExpr =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd [[VectorExprs.longDot]] — exact array<bigint> dot. */
case class LongDotExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "long_dot"

  // lazy like DotProductExpr.isFloat: dataType is unavailable before
  // resolution, so the shape check runs at eval/codegen time
  private def checkType(e: Expression): Unit = e.dataType match {
    case ArrayType(LongType, _) => ()
    case t => throw new IllegalArgumentException(
      s"long_dot expects array<bigint>, got $t")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    checkType(left); checkType(right)
    VectorExprs.longDot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    checkType(left); checkType(right)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.VectorExprs.longDot($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotExpr =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd [[VectorExprs.longL1]] — exact array<bigint> L1 distance. */
case class LongL1Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "long_l1"

  // lazy like LongDotExpr.checkType: dataType is unavailable before
  // resolution, so the shape check runs at eval/codegen time
  private def checkType(e: Expression): Unit = e.dataType match {
    case ArrayType(LongType, _) => ()
    case t => throw new IllegalArgumentException(
      s"long_l1 expects array<bigint>, got $t")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    checkType(left); checkType(right)
    VectorExprs.longL1(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    checkType(left); checkType(right)
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.VectorExprs.longL1($a, $b);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongL1Expr =
    copy(left = newLeft, right = newRight)
}

/** Codegen'd [[VectorExprs.quantizedL2]] — picounit long result. */
case class QuantizedL2Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "quantized_l2"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case ArrayType(DoubleType, _) => false
    case t => throw new IllegalArgumentException(
      s"quantized_l2 expects array<float|double>, got $t")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VectorExprs.quantizedL2(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      isFloat(left), isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expr.VectorExprs.quantizedL2($a, $b, ${isFloat(left)}, ${isFloat(right)});")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedL2Expr =
    copy(left = newLeft, right = newRight)
}
