package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** 64-bit SimHash fingerprint (16 hex chars) of a text column, in one
  * JVM pass — bitwise majority vote over the distinct-token md5 hashes.
  *
  * Semantics are EXACTLY the relational formulation the d05 oracle
  * verifies (explode distinct tokens -> md5 -> per-nibble majority):
  * position p of the output is the hex digit whose bit b is set iff
  * more than half of the distinct tokens have bit b set at hex position
  * p of their md5. The relational form pays two shuffles over a 16x
  * exploded token frame; this expression is a zero-shuffle codegen'd
  * map — the shape that survives a 100 TB corpus (measured ~2s -> scan
  * cost at sf0.1).
  */
object SimHash {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hex = "0123456789abcdef".toCharArray

  /** Shared by eval and codegen. Tokenization matches
    * `split(text, ' ')` (trailing empty tokens kept, `array_distinct`
    * keeps one copy of each).
    */
  def compute(text: UTF8String): UTF8String = {
    val toks = text.toString.split(" ", -1)
    val seen = new java.util.LinkedHashSet[String](toks.length * 2)
    var i = 0
    while (i < toks.length) { seen.add(toks(i)); i += 1 }
    val n = seen.size
    // bit-set counts: 16 hex positions x 4 bits, laid out [p * 4 + b]
    val counts = new Array[Int](64)
    val digest = md5.get()
    val it = seen.iterator()
    while (it.hasNext) {
      digest.reset()
      val h = digest.digest(it.next().getBytes("UTF-8"))
      var p = 0
      while (p < 16) {
        val nib = if ((p & 1) == 0) (h(p >> 1) >> 4) & 0xf else h(p >> 1) & 0xf
        if ((nib & 8) != 0) counts(p * 4) += 1
        if ((nib & 4) != 0) counts(p * 4 + 1) += 1
        if ((nib & 2) != 0) counts(p * 4 + 2) += 1
        if ((nib & 1) != 0) counts(p * 4 + 3) += 1
        p += 1
      }
    }
    val out = new Array[Char](16)
    var p = 0
    while (p < 16) {
      var c = 0
      if (2 * counts(p * 4) > n) c |= 8
      if (2 * counts(p * 4 + 1) > n) c |= 4
      if (2 * counts(p * 4 + 2) > n) c |= 2
      if (2 * counts(p * 4 + 3) > n) c |= 1
      out(p) = hex(c)
      p += 1
    }
    UTF8String.fromString(new String(out))
  }

  def sim_hash(c: Column): Column =
    ColumnBridge.column(SimHashExpr(ColumnBridge.expression(c)))
}

case class SimHashExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "sim_hash"

  override protected def nullSafeEval(input: Any): Any =
    SimHash.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.SimHash.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}
