package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document n-gram repetition statistics in one pass:
  * `struct(n_bigrams, top_bigram_cnt, dup_bigram, n_trigrams,
  * dup_trigram)` under split-on-single-space tokenization (empty tokens
  * preserved, exactly like `split(text, ' ')` / `string_split`).
  *
  * Replaces t13's relational formulation — explode every bigram AND
  * trigram (≈2x the corpus tokens as shuffle rows), shuffle each on
  * (doc_id, gram), reduce to doc_id, join — with a zero-shuffle map
  * stage. The statistics are per-document, so no cross-row state is
  * needed; the relational pipeline lives on as this expression's
  * executable spec in ExprSpec.
  *
  * A gram's text is the ORIGINAL substring from token i's start to
  * token (i+n-1)'s end: the separators inside that slice are single
  * spaces by construction, so the slice is byte-identical to
  * `concat_ws(' ', t_i, ..., t_{i+n-1})` — no per-gram string building
  * beyond the substring key.
  */
object RepetitionProfile {

  private def stats(s: String, starts: Array[Int], ends: Array[Int],
      n: Int): (Long, Long, Long) = {
    val m = starts.length - (n - 1)
    if (m <= 0) return (0L, 0L, 0L)
    val counts = new java.util.HashMap[String, Integer]()
    var i = 0
    while (i < m) {
      counts.merge(s.substring(starts(i), ends(i + n - 1)), 1,
        (a: Integer, b: Integer) => Integer.valueOf(a + b))
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next().toLong
      if (c > top) top = c
      if (c > 1) dup += c
    }
    (m.toLong, top, dup)
  }

  def compute(text: UTF8String): InternalRow = {
    val s = text.toString
    var ntok = 1
    var i = 0
    while (i < s.length) { if (s.charAt(i) == ' ') ntok += 1; i += 1 }
    val starts = new Array[Int](ntok)
    val ends = new Array[Int](ntok)
    var t = 0
    var st = 0
    i = 0
    while (i < s.length) {
      if (s.charAt(i) == ' ') { starts(t) = st; ends(t) = i; t += 1; st = i + 1 }
      i += 1
    }
    starts(t) = st
    ends(t) = s.length
    val (nb, topb, dupb) = stats(s, starts, ends, 2)
    val (nt, _, dupt) = stats(s, starts, ends, 3)
    new GenericInternalRow(Array[Any](nb, topb, dupb, nt, dupt))
  }

  val outputType: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("top_bigram_cnt", LongType, nullable = false),
    StructField("dup_bigram", LongType, nullable = false),
    StructField("n_trigrams", LongType, nullable = false),
    StructField("dup_trigram", LongType, nullable = false)))

  def repetition_profile(c: Column): Column =
    ColumnBridge.column(RepetitionProfileExpr(ColumnBridge.expression(c)))
}

case class RepetitionProfileExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RepetitionProfile.outputType
  override def prettyName: String = "repetition_profile"

  override protected def nullSafeEval(input: Any): Any =
    RepetitionProfile.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.RepetitionProfile.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): RepetitionProfileExpr =
    copy(child = newChild)
}
