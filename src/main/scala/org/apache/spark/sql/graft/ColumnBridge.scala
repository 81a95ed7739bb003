package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters so
  * custom Catalyst expressions (e.g. graft.functions.RollingHashExpr)
  * can be exposed as user-facing `Column`s. Lives in an
  * `org.apache.spark.sql` subpackage by design — the supported
  * pattern for session-extension libraries that add native
  * expressions.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
