package graft.api

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending, NullsFirst, NullsLast, SortOrder}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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

  /** Quantile read-off from a fixed-width histogram: given per-group
    * (bucket, cnt) rows, returns one row per (group, q) with the
    * interpolated quantile estimate in bucket-value units (error bound:
    * half a bucket). The shared read-off behind the r40 batch query and
    * [[graft.stream.Pipelines.windowedHistQuantiles]] — one
    * implementation so the two cannot silently diverge.
    *
    * Every input count is an exact integer; the single interpolating
    * division is one IEEE double op, so results are reproducible (and
    * DuckDB-oracle-checkable) bit for bit. The histogram is assumed
    * small (bounded bucket count per group) — the windows here run on
    * the post-aggregation frame, never on raw data.
    */
  def histogramQuantiles(hist: DataFrame, group: Seq[String],
      bucketCol: String, cntCol: String, qs: Seq[Double],
      bucketWidth: Long): DataFrame = {
    require(qs.nonEmpty, "need at least one quantile")
    import hist.sparkSession.implicits._
    val grp = group.map(col)
    val wAll = if (group.isEmpty) Window.partitionBy()
      else Window.partitionBy(grp: _*)
    val wCum = wAll.orderBy(col(bucketCol))
    val cum = hist.select(grp ++ Seq(col(bucketCol), col(cntCol)): _*)
      .withColumn("_cum", sum(col(cntCol)).over(
        wCum.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_prev", coalesce(sum(col(cntCol)).over(
        wCum.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("_n", sum(col(cntCol)).over(wAll))
    val qdf = qs.toDF("q")
    val wHit = wAll.partitionBy(grp :+ col("q"): _*).orderBy(col(bucketCol))
    cum.crossJoin(qdf)
      .withColumn("_target", ceil(col("q") * col("_n")).cast("bigint"))
      .filter(col("_cum") >= col("_target"))
      .withColumn("_rn", row_number().over(wHit))
      .filter(col("_rn") === 1)
      .select(grp ++ Seq(col("q"), col("_n").as("n"),
        (col(bucketCol) * bucketWidth
          + (col("_target") - col("_prev")).cast("double") / col(cntCol)
            * bucketWidth).as("est")): _*)
  }
}
