package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, BoundReference, Expression, GenericInternalRow, JoinedRow, NullsFirst, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** As-of (backward) join as a first-class operator: for every left row,
  * the single right row with equal keys and the greatest right-time
  * `<=` left-time — the "state of the world when the event happened"
  * join (pandas `merge_asof`, kdb/QuestDB `ASOF JOIN`). Left outer:
  * right columns are NULL when no prior right row exists.
  *
  * The composable formulations all pay for generality: a non-equi
  * range join explodes every (left, candidate) pair before ranking
  * them; the carry-forward window (e07) needs the two streams unioned,
  * globally sorted per key, and re-filtered. This operator asks the
  * planner for exactly what the semantics need — both sides hash
  * -clustered on the keys and sorted by (keys, time) — and then ONE
  * forward merge pass per partition produces the answer: no candidate
  * explosion, no union, nothing retained but the single current-best
  * right row per key. At 100 TB that is the difference between a
  * shuffle of candidate PAIRS (quadratic per hot key) and a shuffle of
  * each input exactly once.
  *
  * Determinism: among right rows sharing the maximal time, the last in
  * `(rightTime, rightTiebreak...)` ascending order wins — callers pass
  * a tie-break that makes that order total (same requirement the
  * window formulation has). Keys match by grouping semantics (NULL
  * keys group together, like GROUP BY — the pandas/kdb convention),
  * not SQL-predicate semantics; rows with a NULL time never match.
  */
case class AsOfJoin(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[SortOrder],
    toleranceUs: Option[Long],
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  require(toleranceUs.forall(_ >= 0), s"negative tolerance: $toleranceUs")
  require(leftKeys.length == rightKeys.length && leftKeys.nonEmpty,
    "as-of join needs matching non-empty key lists")
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(lk, rk, lt, rt, tb, tol, l, r) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, tol, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Seq[SortOrder],
    toleranceUs: Option[Long],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override def outputPartitioning: Partitioning = left.outputPartitioning

  // both sides clustered on the keys (EnsureRequirements co-partitions
  // them exactly as it does for a sort-merge join) ...
  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(leftKeys), ClusteredDistribution(rightKeys))

  // ... and sorted by (keys, time[, tiebreak]) so one forward pass per
  // partition suffices
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending, NullsFirst, Seq.empty)) :+
      SortOrder(leftTime, Ascending, NullsFirst, Seq.empty),
    rightKeys.map(SortOrder(_, Ascending, NullsFirst, Seq.empty)) ++
      (SortOrder(rightTime, Ascending, NullsFirst, Seq.empty) +: rightTiebreak))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val tol = toleranceUs
    val lOutput = left.output
    val rOutput = right.output
    val allOutput = output
    left.execute().zipPartitions(right.execute(), preservesPartitioning = true) {
      (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
        val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
        val keyOrd = GenerateOrdering.generate(
          lKeys.zipWithIndex.map { case (e, i) =>
            SortOrder(BoundReference(i, e.dataType, e.nullable), Ascending)
          })
        val lTimeBound = BindReferences.bindReference(lTime, lOutput)
        val rTimeBound = BindReferences.bindReference(rTime, rOutput)
        val nullRight = new GenericInternalRow(rOutput.size)
        val joiner = new JoinedRow
        val resultProj = UnsafeProjection.create(allOutput, allOutput)

        // right rows are copied on read: the scan reuses its row buffer,
        // and both the lookahead and the retained current-best row must
        // survive subsequent next() calls
        val rit = rIter.map(_.copy()).buffered
        // the single current-best right row for the key under the merge
        // cursor (null when none seen yet)
        var curKey: InternalRow = null
        var best: InternalRow = null

        lIter.map { l =>
          val lKey = lKeyProj(l)
          if (curKey == null || keyOrd.compare(curKey, lKey) != 0) {
            curKey = lKey.copy()
            best = null
            // discard right rows for keys already passed
            while (rit.hasNext && keyOrd.compare(rKeyProj(rit.head), curKey) < 0)
              rit.next()
          }
          val lT = lTimeBound.eval(l)
          if (lT != null) {
            val lTv = lT.asInstanceOf[Long]
            // consume right rows of this key up to the left time; the
            // last one in sort order is the as-of match
            var advancing = true
            while (advancing && rit.hasNext &&
                keyOrd.compare(rKeyProj(rit.head), curKey) == 0) {
              val rT = rTimeBound.eval(rit.head)
              if (rT != null && rT.asInstanceOf[Long] <= lTv) best = rit.next()
              else if (rT == null) rit.next() // null time never matches
              else advancing = false
            }
            // tolerance gates only the EMIT: `best` is the max right
            // time <= lT, so if it misses the window no earlier row can
            // make it — but a later left row of the same key still can,
            // so the state must survive
            val inWindow = best != null && tol.forall { t =>
              val bT = rTimeBound.eval(best)
              bT != null && lTv - bT.asInstanceOf[Long] <= t
            }
            resultProj(joiner(l, if (inWindow) best else nullRight))
          } else {
            // null left time: no match by contract
            resultProj(joiner(l, nullRight))
          }
        }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}
