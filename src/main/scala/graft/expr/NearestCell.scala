package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Two-level (IVF-style) nearest-centroid index, evaluated inside a
  * single codegen'd projection — the assignment stage of SemDeDup-style
  * semantic dedup ([[graft.api.Dedup.semanticDupPairs]]).
  *
  * Why this exists: the declarative formulation — `vecs crossJoin
  * broadcast(centroids)` then `max_by` per vector — materializes N×k
  * joined rows (each carrying the full embedding) through a hash
  * aggregate. With a SemDeDup codebook sized k ∝ N/cellSize (cells must
  * stay bounded for the within-cell verify to be linear), that stage is
  * O(N²/cellSize) ROWS — the round-11 curve flagged exactly this
  * (d14 big-rung 12.9×). Here the codebook ships once per executor as
  * an expression reference, assignment is one Long per input row (no
  * row explosion, no aggregate), and the scan is two-level: argmax over
  * ~√k group representatives, then argmax over the winner's ~√k member
  * fines — N·O(√k) dot products instead of N·k, the standard coarse-
  * quantizer shape (IVF / SemDeDup §3 "we first cluster").
  *
  * Determinism contract (what the DuckDB oracle mirrors, CTE for CTE):
  *  - fines are ranked by centroid id ascending (0-based `rn`);
  *  - `gsize = max(8, ceil(sqrt(k)))`; representatives are the fines
  *    with `rn % gsize = 0` (so k ≤ 8 degenerates to a single group =
  *    exact flat argmax — the shape at the small fixtures);
  *  - every NON-REP fine belongs to its nearest representative's group
  *    (quantized cosine, ties to the smaller rep id); a rep is FORCED
  *    into its own group rather than argmax-assigned — under a
  *    quantized-cosine near-tie the argmax could send a rep to an
  *    earlier rep's group and leave its own empty — so no group is
  *    empty by construction (the oracles' fg CTE mirrors the CASE);
  *  - a vector goes to its nearest representative (same rule), then to
  *    the nearest fine WITHIN that group (same rule). All cosines are
  *    `quantized_dot(a,b) / (nrm_a * nrm_b)` with the engine's
  *    truncation-quantized dot, so every comparison is bit-reproducible
  *    across engines and the argmax order matches the oracle's
  *    `ORDER BY cos DESC, c_id ASC` exactly.
  *
  * Scale: the codebook must fit in executor memory (it is an expression
  * reference, i.e. broadcast-sized — same contract as any broadcast
  * codebook: s04/s09). At k beyond broadcast size the top level itself
  * would be hierarchized (three-level), not shuffled.
  */
final class CellIndex(centroids: Array[(Long, Array[Double])])
    extends Serializable {
  require(centroids.nonEmpty, "CellIndex needs a non-empty codebook")

  import VectorExprs.quantizedDotArr

  // fines sorted by centroid id: (c_id, vector, norm)
  private val fines: Array[(Long, Array[Double], Double)] =
    centroids.sortBy(_._1).map { case (cid, cv) =>
      (cid, cv, math.sqrt(quantizedDotArr(cv, cv)))
    }

  /** Group width AND rep stride: every `gsize`-th fine (by id rank) is a
    * representative, giving ~√k reps × ~√k fines per group.
    */
  val gsize: Int =
    math.max(8, math.ceil(math.sqrt(fines.length.toDouble)).toInt)

  private val reps: Array[(Long, Array[Double], Double)] =
    fines.zipWithIndex.collect { case (f, i) if i % gsize == 0 => f }

  // argmax over reps for a plain-array vector (driver-side grouping);
  // strict > over ascending ids == (cos DESC, c_id ASC)
  private def nearestRepArr(v: Array[Double], nrm: Double): Int = {
    var bi = 0
    var best = Double.NegativeInfinity
    var i = 0
    while (i < reps.length) {
      val r = reps(i)
      val cos = quantizedDotArr(v, r._2) / (nrm * r._3)
      if (cos > best) { best = cos; bi = i }
      i += 1
    }
    bi
  }

  // group members, ordered by c_id ascending within each group. Each
  // representative is FORCED into its own group (not argmax-assigned):
  // two near-identical centroids within ~1 ulp of quantized cosine
  // could otherwise send a rep to an earlier rep's group, leaving its
  // own group empty — and a query strictly preferring that rep would
  // then index into an empty array. The "a rep is its own nearest rep"
  // invariant holds by construction, so every group is non-empty.
  private val groups: Array[Array[(Long, Array[Double], Double)]] = {
    val bs = Array.fill(reps.length)(
      scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Double], Double)])
    fines.zipWithIndex.foreach { case (f, i) =>
      val b = if (i % gsize == 0) i / gsize else nearestRepArr(f._2, f._3)
      bs(b) += f
    }
    bs.map(_.toArray)
  }

  /** The assignment: nearest rep, then nearest fine in its group.
    * `nrm` is passed in (not recomputed) so it is the SAME double the
    * plan computed for the verify stage.
    */
  def cell(v: ArrayData, nrm: Double): Long = {
    val isFloat = false // callers widen to array<double>; see NearestCellExpr
    var bi = 0
    var best = Double.NegativeInfinity
    var i = 0
    while (i < reps.length) {
      val r = reps(i)
      val cos = VectorExprs.quantizedDotMixed(v, r._2, isFloat) / (nrm * r._3)
      if (cos > best) { best = cos; bi = i }
      i += 1
    }
    val g = groups(bi)
    var bestId = g(0)._1
    best = Double.NegativeInfinity
    i = 0
    while (i < g.length) {
      val f = g(i)
      val cos = VectorExprs.quantizedDotMixed(v, f._2, isFloat) / (nrm * f._3)
      if (cos > best) { best = cos; bestId = f._1 }
      i += 1
    }
    bestId
  }
}

object NearestCell {
  def nearest_cell(v: Column, nrm: Column, index: CellIndex): Column =
    ColumnBridge.column(NearestCellExpr(
      ColumnBridge.expression(v), ColumnBridge.expression(nrm), index))
}

/** Codegen'd [[CellIndex.cell]] over an `array<double>` column and its
  * precomputed norm. Strictly `array<double>`: the float path would
  * need widened per-element handling in [[CellIndex]]; semantic-dedup
  * callers already cast (the oracle computes on `::DOUBLE[]` too).
  */
case class NearestCellExpr(left: Expression, right: Expression,
    index: CellIndex) extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "nearest_cell"

  // children are unresolved at construction; type-check at analysis
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), DoubleType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_cell expects (array<double>, double), got ($l, $r)")
    }

  override protected def nullSafeEval(v: Any, nrm: Any): Any =
    index.cell(v.asInstanceOf[ArrayData],
      nrm.asInstanceOf[Number].doubleValue())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val idx = ctx.addReferenceObj("cellIndex", index,
      classOf[CellIndex].getName)
    nullSafeCodeGen(ctx, ev, (v, nrm) =>
      s"${ev.value} = $idx.cell($v, (double)$nrm);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCellExpr =
    copy(left = newLeft, right = newRight)
}
