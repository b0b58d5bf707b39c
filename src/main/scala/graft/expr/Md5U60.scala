package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** The house 60-bit portable-uniform draw, as one codegen'd JVM pass:
  * `md5_u60(s, off)` ≡ `CAST(conv(substr(md5(s), off + 1, 15), 16, 10)
  * AS BIGINT)` for off ∈ {0, 16} — the value of 15 hex digits of the
  * md5, i.e. 60 bits of the digest, read straight from the digest
  * BYTES instead of through the hex round-trip.
  *
  * Why an expression (the WordShingles/SimHash precedent, SURVEY §7.3
  * decision table): the composable formulation materializes a 32-char
  * hex string per row, `substr`s it, and re-parses the 15-char slice
  * back to a number through `conv`'s string machinery — measured on
  * g25's 11.3M-row pair stream at sf0.1 (min-of-3, noop sink): the
  * full conv-form coin costs 2.67 s of which the substr+conv+cast
  * tail alone is 1.25 s, vs 1.42 s for the plain md5 — the hex parse
  * costs more than the hash. This expression keeps the md5 (the
  * cross-engine portability anchor the DuckDB oracles replay) and
  * deletes only the representation detour: 15 leading nibbles of
  * digest half `off/16` = (that half's 8 bytes as an unsigned
  * big-endian long) >>> 4.
  *
  * Semantics pinned by Md5U60Spec against the conv form on random,
  * empty, unicode and null inputs, and by every banded-LSH / sampled
  * oracle that replays the identical draw in DuckDB SQL.
  */
object Md5U60 {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Shared by eval and codegen. `off` is the hex-character offset of
    * the 15-digit slice: 0 = digest bytes 0..7, 16 = bytes 8..15.
    */
  def compute(s: UTF8String, off: Int): Long = {
    val digest = md5.get()
    digest.reset()
    val h = digest.digest(s.getBytes)
    val b = off >> 1 // 0 or 8
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (h(b + i) & 0xffL); i += 1 }
    v >>> 4
  }

  def md5_u60(c: Column, off: Int): Column =
    ColumnBridge.column(Md5U60Expr(ColumnBridge.expression(c), off))
}

case class Md5U60Expr(child: Expression, off: Int) extends UnaryExpression {
  require(off == 0 || off == 16, s"off must be 0 or 16, got $off")

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_u60"

  override protected def nullSafeEval(input: Any): Any =
    Md5U60.compute(input.asInstanceOf[UTF8String], off)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.Md5U60.compute($c, $off);")

  override protected def withNewChildInternal(newChild: Expression): Md5U60Expr =
    copy(child = newChild)
}
