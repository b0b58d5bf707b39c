package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Rolling-window document fingerprint in one pass:
  * `struct(fp_min, fp_max, n_windows)` over the md5 of every 8-char
  * window of the text (window count = max(len - 7, 1); a shorter text
  * hashes its whole self once).
  *
  * Replaces the relational formulation — explode one row PER CHARACTER
  * POSITION (each carrying the full text) + a min/max shuffle — whose
  * intermediate is ~250x the input bytes. Same semantics, zero
  * shuffles: min/max over hex strings equals unsigned byte order of the
  * digests, so the loop tracks 16-byte digests and hexifies once at the
  * end.
  */
object RollingFingerprint {

  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  private val hex = "0123456789abcdef".toCharArray

  private def toHex(d: Array[Byte]): UTF8String = {
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hex((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hex(d(i) & 0xf)
      i += 1
    }
    UTF8String.fromString(new String(out))
  }

  /** a < b in unsigned byte order (== hex-string order). */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < 16) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  def compute(text: UTF8String): InternalRow = {
    // Windows are 8 Unicode CODE POINTS, matching the relational
    // formulation's length()/substr() (DuckDB counts code points).
    // Java String.length/substring count UTF-16 units, which diverges on
    // supplementary characters and can split surrogate pairs — so walk
    // the UTF-8 bytes once, recording the byte offset where each code
    // point starts (a UTF-8 continuation byte is 10xxxxxx), and hash
    // byte slices directly.
    val bytes = text.getBytes
    var n = 0
    var b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xc0) != 0x80) n += 1
      b += 1
    }
    val offsets = new Array[Int](n + 1)
    var cp = 0
    b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xc0) != 0x80) { offsets(cp) = b; cp += 1 }
      b += 1
    }
    offsets(n) = bytes.length
    val wins = math.max(n - 7, 1)
    val digest = md5.get()
    var mn: Array[Byte] = null
    var mx: Array[Byte] = null
    var i = 0
    while (i < wins) {
      digest.reset()
      val start = offsets(i)
      val end = offsets(math.min(i + 8, n))
      digest.update(bytes, start, end - start)
      val d = digest.digest()
      if (mn == null || less(d, mn)) mn = d
      if (mx == null || less(mx, d)) mx = d
      i += 1
    }
    new GenericInternalRow(Array[Any](toHex(mn), toHex(mx), wins.toLong))
  }

  val outputType: StructType = StructType(Seq(
    StructField("fp_min", StringType, nullable = false),
    StructField("fp_max", StringType, nullable = false),
    StructField("n_windows", LongType, nullable = false)))

  def rolling_fingerprint(c: Column): Column =
    ColumnBridge.column(RollingFingerprintExpr(ColumnBridge.expression(c)))
}

case class RollingFingerprintExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = RollingFingerprint.outputType
  override def prettyName: String = "rolling_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    RollingFingerprint.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expr.RollingFingerprint.compute($c);")

  override protected def withNewChildInternal(newChild: Expression): RollingFingerprintExpr =
    copy(child = newChild)
}
