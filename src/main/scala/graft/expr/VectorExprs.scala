package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

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

  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(
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
