package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column, in one JVM pass.
  *
  * The composable formulation —
  * `array_distinct(transform(sequence(...), i -> concat_ws(' ',
  * element_at(toks, i), ...)))` — is semantically identical but runs on
  * Catalyst's interpreted higher-order-function path (HOFs are
  * CodegenFallback), which measured ~6s for 5k docs at sf0.1. This
  * expression does the same work in a tight loop and is the engine's
  * second custom-`Expression` extension after HumanCountExpr
  * (SURVEY.md §7.3 decision table, revised by this measurement).
  */
object WordShingles {

  /** Shared by eval and codegen. Distinct (insertion-ordered) n-gram
    * shingles of the space-tokenized input; <n tokens -> empty array.
    * Tokenization matches `split(text, ' ')` / DuckDB `string_split`:
    * trailing empty tokens are kept.
    */
  def compute(text: UTF8String, n: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String]((toks.length - n + 1) * 2)
    var i = 0
    val sb = new java.lang.StringBuilder(64)
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  def word_shingles(c: Column, n: Int): Column =
    ColumnBridge.column(WordShinglesExpr(ColumnBridge.expression(c), n))
}

case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  require(n >= 1, "shingle size must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.WordShingles.compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}
