package graft.plans

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.{Partitioner, RangePartitioner, TaskContext}
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Interval-overlap join as a first-class operator: all (left, right)
  * pairs whose half-open long intervals `[lStart, lEnd)` and
  * `[rStart, rEnd)` overlap — no shared entity key assumed (the case
  * the as-of operator cannot cover, and the one Spark itself plans as
  * BroadcastNestedLoop or cartesian).
  *
  * The composable formulation (`api.Joins.intervalJoin`) buckets time
  * at a FIXED width chosen by the caller: per-row fan-out is
  * `span/bucketUs + 1`, so one mis-sized bucket either explodes long
  * intervals into thousands of copies or funnels everything into a few
  * hot buckets. This operator removes the knob: it RANGE-partitions the
  * time domain by sampling the actual interval starts (the same
  * machinery as a global sort), replicates each interval only to the
  * partitions its span truly covers, and runs a plane sweep per
  * partition — fan-out adapts to the data distribution, and parallelism
  * equals the partition count regardless of interval length skew.
  *
  * Exactly-once without a dedup pass: a pair overlapping in several
  * partitions is emitted only where `max(lStart, rStart)` falls — both
  * rows are provably present there (that instant lies inside both
  * spans), and the emitting side's sweep event IS that instant, so the
  * check is one `getPartition` call per candidate.
  *
  * Memory contract: each sweep holds one partition's replicated rows
  * in memory (the plane sweep needs them start-sorted). Partition
  * count is the scale dial — at 100 TB this operator runs with
  * thousands of range partitions, each array-sized; the production
  * upgrade is sort-spilling the per-partition buffers, which changes
  * no semantics. Rows with NULL or empty (`end <= start`) intervals
  * join nothing, matching the SQL predicate's NULL semantics.
  */
case class IntervalJoin(
    leftStart: Expression, leftEnd: Expression,
    rightStart: Expression, rightEnd: Expression,
    numPartitions: Option[Int],
    left: LogicalPlan, right: LogicalPlan) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoin =
    copy(left = newLeft, right = newRight)
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoin(ls, le, rs, re, n, l, r) =>
      IntervalJoinExec(ls, le, rs, re, n, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class IntervalJoinExec(
    leftStart: Expression, leftEnd: Expression,
    rightStart: Expression, rightEnd: Expression,
    numPartitions: Option[Int],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val allOut = output
    val lS = leftStart; val lE = leftEnd
    val rS = rightStart; val rE = rightEnd
    val parts = numPartitions.getOrElse(
      org.apache.spark.sql.internal.SQLConf.get.numShufflePartitions)

    // own the rows (scans reuse buffers) and force UnsafeRow so the
    // replication shuffle can serialize them
    def owned(plan: SparkPlan, out: Seq[Attribute]): RDD[InternalRow] =
      plan.execute().mapPartitions { it =>
        val proj = UnsafeProjection.create(out, out)
        it.map(r => proj(r).copy().asInstanceOf[InternalRow])
      }
    val lRows = owned(left, lOut)
    val rRows = owned(right, rOut)

    // sample the union of interval starts — the same job a global sort
    // runs — to cut the time domain into `parts` contiguous ranges
    def starts(rdd: RDD[InternalRow], out: Seq[Attribute],
        sExpr: Expression): RDD[(Long, Unit)] =
      rdd.mapPartitions { it =>
        val sB = BindReferences.bindReference(sExpr, out)
        it.flatMap { row =>
          val v = sB.eval(row)
          if (v == null) Iterator.empty else Iterator((v.asInstanceOf[Long], ()))
        }
      }
    val part = new RangePartitioner(parts,
      starts(lRows, lOut, lS).union(starts(rRows, rOut, rS)),
      ascending = true)
    val exact = new Partitioner {
      override def numPartitions: Int = part.numPartitions
      override def getPartition(key: Any): Int = key.asInstanceOf[Int]
    }

    // replicate each interval to exactly the range partitions its span
    // covers; empty/NULL intervals replicate nowhere
    def replicate(rdd: RDD[InternalRow], out: Seq[Attribute],
        sExpr: Expression, eExpr: Expression): RDD[(Int, InternalRow)] =
      rdd.mapPartitions { it =>
        val sB = BindReferences.bindReference(sExpr, out)
        val eB = BindReferences.bindReference(eExpr, out)
        it.flatMap { row =>
          val sv = sB.eval(row); val ev = eB.eval(row)
          if (sv == null || ev == null) Iterator.empty
          else {
            val s = sv.asInstanceOf[Long]; val e = ev.asInstanceOf[Long]
            if (e <= s) Iterator.empty
            else (part.getPartition(s) to part.getPartition(e - 1)).iterator
              .map(p => (p, row))
          }
        }
      }.partitionBy(exact)

    replicate(lRows, lOut, lS, lE).values
      .zipPartitions(replicate(rRows, rOut, rS, rE).values) { (li, ri) =>
        val pid = TaskContext.get().partitionId()
        val lsB = BindReferences.bindReference(lS, lOut)
        val leB = BindReferences.bindReference(lE, lOut)
        val rsB = BindReferences.bindReference(rS, rOut)
        val reB = BindReferences.bindReference(rE, rOut)
        def load(it: Iterator[InternalRow], sB: Expression, eB: Expression)
            : Array[(Long, Long, InternalRow)] = {
          val arr = it.map { r =>
            (sB.eval(r).asInstanceOf[Long], eB.eval(r).asInstanceOf[Long], r)
          }.toArray
          java.util.Arrays.sort(arr,
            Ordering.by((t: (Long, Long, InternalRow)) => t._1))
          arr
        }
        val lefts = load(li, lsB, leB)
        val rights = load(ri, rsB, reB)
        val joiner = new JoinedRow
        val resultProj = UnsafeProjection.create(allOut, allOut)

        // plane sweep in start order (left first on ties, so every pair
        // is emitted exactly once — by whichever row starts second,
        // against the other side's still-active set)
        new Iterator[InternalRow] {
          private var i = 0
          private var j = 0
          private val activeL = ArrayBuffer.empty[(Long, Long, InternalRow)]
          private val activeR = ArrayBuffer.empty[(Long, Long, InternalRow)]
          private var pending: Iterator[UnsafeRow] = Iterator.empty
          private def prune(buf: ArrayBuffer[(Long, Long, InternalRow)],
              now: Long): Unit = {
            var k = 0
            while (k < buf.length) {
              if (buf(k)._2 <= now) buf.remove(k) else k += 1
            }
          }
          private def advance(): Unit = {
            while (!pending.hasNext && (i < lefts.length || j < rights.length)) {
              val takeLeft = j >= rights.length ||
                (i < lefts.length && lefts(i)._1 <= rights(j)._1)
              if (takeLeft) {
                val l = lefts(i); i += 1
                prune(activeR, l._1)
                // emit only in the partition owning max(ls, rs) = ls
                pending =
                  if (part.getPartition(l._1) != pid) Iterator.empty
                  else activeR.iterator.map(r => resultProj(joiner(l._3, r._3)))
                activeL += l
              } else {
                val r = rights(j); j += 1
                prune(activeL, r._1)
                pending =
                  if (part.getPartition(r._1) != pid) Iterator.empty
                  else activeL.iterator.map(l => resultProj(joiner(l._3, r._3)))
                activeR += r
              }
            }
          }
          override def hasNext: Boolean = { advance(); pending.hasNext }
          override def next(): InternalRow = { advance(); pending.next() }
        }
      }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)
}
