package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge. Spark 4's `ExpressionUtils` is
  * `private[sql]`, so the engine exposes it through this one-file shim in
  * the `org.apache.spark.sql` package; all graft code goes through
  * [[graft.expr.ColumnBridge]].
  */
object GraftSqlBridge {
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)

  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** Build a DataFrame from a hand-constructed logical plan —
    * `Dataset.ofRows` is `private[sql]`, needed by the custom
    * whole-operator API ([[graft.api.Windows.topKPerGroup]]).
    */
  def dataFrame(spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Free the blocks behind an eagerly `localCheckpoint`ed DataFrame —
    * its analyzed plan is a `LogicalRDD` over the checkpointed RDD,
    * which `SparkContext.getPersistentRDDs` only releases at driver GC.
    * Iterative kernels (k-core, HyperBall, cluster fixpoints) call this
    * on each superseded generation so per-round blocks don't pile up in
    * storage memory for the rest of the job. No-op for any other plan
    * shape.
    */
  def unpersistCheckpointed(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false); ()
      case _ => ()
    }

  /** Listener events are delivered async; `listenerBus` is
    * `private[spark]`, so the flush Bench needs between per-query
    * shuffle-volume readings lives in this shim too. A slow drain makes
    * one shuffle_mb reading approximate — it must not abort the whole
    * benchmark run, so the timeout is swallowed.
    */
  def flushListenerBus(sc: org.apache.spark.SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty(10000)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
