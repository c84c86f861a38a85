package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Access bridge into Spark's `private[sql]` Column↔Expression conversions
  * (Spark 4 hid `Column.expr` / `new Column(expr)` behind ColumnNode).
  * Lives under the org.apache.spark.sql package solely to gain package
  * visibility — the standard technique for Catalyst-extending libraries.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
