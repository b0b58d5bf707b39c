package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 moved `Column` to a ColumnNode representation; converting
  * between `Column` and a Catalyst `Expression` goes through
  * `org.apache.spark.sql.classic.ExpressionUtils`. Centralised here so
  * every custom expression in the engine shares one bridge.
  */
object ColumnBridge {
  def expression(c: Column): Expression =
    org.apache.spark.sql.GraftSqlBridge.expression(c)

  def column(e: Expression): Column =
    org.apache.spark.sql.GraftSqlBridge.column(e)
}
