package graft.expr

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed exact-median Aggregator — the engine's demonstration of the
  * `Aggregator[IN, BUF, OUT]` extension axis (SURVEY.md §7.3).
  *
  * Production queries use the built-in `percentile` (which aggregates a
  * count-map and scales); this buffer collects values, so it is for
  * per-group cardinalities that fit an executor (documented trade-off).
  * Interpolation is continuous ((a+b)/2 on even counts), matching
  * `percentile(col, 0.5)` and DuckDB `quantile_cont`.
  */
object ExactMedian extends Aggregator[Double, ArrayBuffer[Double], Option[Double]] {

  override def zero: ArrayBuffer[Double] = ArrayBuffer.empty

  override def reduce(b: ArrayBuffer[Double], a: Double): ArrayBuffer[Double] = {
    b += a; b
  }

  override def merge(x: ArrayBuffer[Double], y: ArrayBuffer[Double]): ArrayBuffer[Double] = {
    x ++= y; x
  }

  override def finish(b: ArrayBuffer[Double]): Option[Double] = {
    if (b.isEmpty) return None
    val s = b.sorted
    val n = s.length
    Some(
      if (n % 2 == 1) s(n / 2)
      else {
        val lo = s(n / 2 - 1)
        val hi = s(n / 2)
        lo + (hi - lo) / 2
      })
  }

  override def bufferEncoder: Encoder[ArrayBuffer[Double]] =
    Encoders.kryo[ArrayBuffer[Double]]

  override def outputEncoder: Encoder[Option[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()

  /** UDAF form for untyped DataFrame call sites:
    * `df.agg(ExactMedian.udaf(col("x")))`.
    */
  lazy val udaf: org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(ExactMedian)
}
