package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Parse a human-formatted count string ("25", "532k", "25.5k", "1M")
  * into an integer; any unparseable input yields null.
  *
  * Reference semantics: `convert_follower_count` at
  * `(Clone) mount_s3_in_databricks.py:102-121` (duplicated at
  * `(Clone) kinesis_streaming_process_in_databricks.py:158-180`): a
  * Python UDF that multiplies a "k" suffix by 1e3 and an "M" suffix by
  * 1e6, truncating toward zero, with failure -> null. The reference pays
  * a Python-worker round trip per batch for this; here it is a native
  * Catalyst expression with codegen, so the whole cleaning stage stays
  * inside WholeStageCodegen. We generalize suffixes to be
  * case-insensitive and add "b" (1e9).
  */
object HumanCount {
  /** Shared by interpreted eval and generated code. Returns a boxed
    * Integer or null; kept dependency-free so codegen can call it
    * statically.
    */
  def parse(s: String): Integer = {
    if (s == null) return null
    val t = s.trim
    if (t.isEmpty) return null
    val last = t.charAt(t.length - 1)
    val mult: Long = last match {
      case 'k' | 'K' => 1000L
      case 'm' | 'M' => 1000000L
      case 'b' | 'B' => 1000000000L
      case _         => 1L
    }
    val num = if (mult == 1L) t else t.substring(0, t.length - 1)
    try {
      val v: Double =
        if (mult == 1L) java.lang.Long.parseLong(num).toDouble
        else java.lang.Double.parseDouble(num) * mult
      if (v.isNaN || v > Int.MaxValue || v < Int.MinValue) null
      else Integer.valueOf(v.toInt) // truncate toward zero, like Python int()
    } catch { case _: NumberFormatException => null }
  }

  /** Column API: `human_count($"follower_count")`. */
  def human_count(c: Column): Column =
    graft.expr.ColumnBridge.column(HumanCountExpr(graft.expr.ColumnBridge.expression(c)))

  /** Equivalent pure-builtin formulation (no custom expression): useful
    * where a plan must stay entirely on stock Spark, and as a
    * cross-check for HumanCountExpr in tests. Slightly stricter than the
    * Python original on exotic floats ("1e3", ".5" are rejected here).
    */
  def humanCountBuiltin(c: Column): Column = {
    val t = trim(c)
    val suffix = lower(t.substr(length(t), lit(1)))
    val prefix = t.substr(lit(1), length(t) - 1)
    val prefixNum = when(
      prefix.rlike("^[+-]?([0-9]*\\.)?[0-9]+$"), prefix.try_cast("double"))
    val intOnly = when(t.rlike("^[+-]?[0-9]+$"), t.try_cast("bigint"))
    val scaled = when(suffix === "k", prefixNum * 1000d)
      .when(suffix === "m", prefixNum * 1000000d)
      .when(suffix === "b", prefixNum * 1000000000d)
      .otherwise(intOnly.cast("double"))
    when(scaled.between(Int.MinValue, Int.MaxValue), scaled.cast("int"))
  }
}

/** Native Catalyst expression for HumanCount.parse. Null-intolerant on
  * input (null in -> null out) but may also produce null on parse
  * failure, so codegen sets isNull from the parse result.
  */
case class HumanCountExpr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "human_count"

  override protected def nullSafeEval(input: Any): Any = {
    val parsed = HumanCount.parse(input.asInstanceOf[UTF8String].toString)
    if (parsed == null) null else parsed.intValue()
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null else nullSafeEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val parsed = ctx.freshName("parsed")
      s"""
         |java.lang.Integer $parsed = graft.expr.HumanCount.parse($c.toString());
         |if ($parsed == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} = $parsed.intValue();
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HumanCountExpr =
    copy(child = newChild)
}
