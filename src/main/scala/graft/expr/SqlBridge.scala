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
}
