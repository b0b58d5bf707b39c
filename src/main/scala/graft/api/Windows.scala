package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, NullsFirst, NullsLast, SortOrder}

import graft.plans.GroupTopK

/** Window-family operators that outgrow the window-function plan. */
object Windows {

  /** Top `k` rows per group under an explicit sort order — the custom
    * whole-operator path ([[graft.plans.GroupTopK]]): bounded heaps and
    * a map-side partial pass instead of the `row_number OVER (...)`
    * full-sort-per-group plan. See the operator's Scaladoc for the
    * shuffle/memory contract.
    *
    * `order` entries are (column name, descending?); include a unique
    * tie-break column for deterministic output (same requirement the
    * window formulation has). Sorts place NULLs the way the default
    * `ORDER BY` does (ASC -> nulls first, DESC -> nulls last).
    */
  def topKPerGroup(df: DataFrame, group: Seq[String],
      order: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(group.nonEmpty && order.nonEmpty, "group and order must be non-empty")
    val plan = df.queryExecution.analyzed
    def attr(name: String) = plan.output
      .find(_.name.equalsIgnoreCase(name))
      .getOrElse(throw new IllegalArgumentException(
        s"column $name not in ${plan.output.map(_.name).mkString(",")}"))
    val sortOrder = order.map { case (name, desc) =>
      if (desc) SortOrder(attr(name), Descending, NullsLast, Seq.empty)
      else SortOrder(attr(name), Ascending, NullsFirst, Seq.empty)
    }
    org.apache.spark.sql.GraftSqlBridge.dataFrame(df.sparkSession,
      GroupTopK(group.map(attr), sortOrder, k, plan))
  }
}
