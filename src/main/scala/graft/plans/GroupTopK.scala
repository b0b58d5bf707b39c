package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Group-wise top-k as a first-class operator.
  *
  * The composable formulation — `row_number() OVER (PARTITION BY g
  * ORDER BY s) <= k` then filter — shuffles EVERY row of every group
  * and fully sorts each group, only to discard all but k rows. At
  * 100 TB ("top 3 products per category over billions of events") the
  * sort is the cost: O(n log n) per group on data that is thrown away.
  *
  * This operator keeps a bounded heap of k rows per group and runs in
  * two phases exactly like partial aggregation: a map-side pass caps
  * every partition's contribution at k rows per group BEFORE the
  * shuffle (top-k is distributive: the global top-k of a union is
  * contained in the union of per-part top-ks), then the post-shuffle
  * pass merges. The shuffle moves at most `parts x k` rows per group
  * instead of the whole group; nothing is ever sorted beyond the heap's
  * O(n log k).
  *
  * Memory contract: one k-row heap per group per partition — the same
  * shape as hash aggregation's per-group state, appropriate while
  * `k x groups-per-partition` rows fit an executor (k is 3-100 in
  * every real use). Ties must be broken by the caller's sort order
  * (include a unique column) for deterministic output, same as the
  * window formulation.
  */
case class GroupTopK(
    groupCols: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive: $k")
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): GroupTopK =
    copy(child = newChild)
}

/** Planner strategy: logical GroupTopK -> final-over-partial exec pair;
  * EnsureRequirements inserts the hash exchange between them from the
  * final node's required distribution.
  */
object GroupTopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GroupTopK(groupCols, sortOrder, k, child) =>
      GroupTopKExec(groupCols, sortOrder, k, partial = false,
        GroupTopKExec(groupCols, sortOrder, k, partial = true,
          planLater(child))) :: Nil
    case _ => Nil
  }
}

case class GroupTopKExec(
    groupCols: Seq[Expression],
    sortOrder: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupCols) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupExprs = groupCols
    val orders = sortOrder
    val limit = k
    val childOutput = child.output
    child.execute().mapPartitions({ iter =>
      val groupProj = UnsafeProjection.create(groupExprs, childOutput)
      // codegen'd row comparator for the caller's sort order; the heap
      // is a max-heap of the k currently-best rows (worst kept on top)
      val ordering = GenerateOrdering.generate(
        BindReferences.bindReferences(orders, childOutput))
      val heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
      val reversed: java.util.Comparator[InternalRow] =
        (a: InternalRow, b: InternalRow) => ordering.compare(b, a)
      iter.foreach { row =>
        val key = groupProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = new java.util.PriorityQueue[InternalRow](limit + 1, reversed)
          heaps.put(key.copy(), heap)
        }
        if (heap.size() < limit) {
          heap.add(row.copy())
        } else if (ordering.compare(row, heap.peek()) < 0) {
          heap.poll()
          heap.add(row.copy())
        }
      }
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator().asScala)
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GroupTopKExec =
    copy(child = newChild)
}
