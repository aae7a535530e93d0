package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge.
  *
  * Spark 4 made `Column` wrap a `ColumnNode` (the Connect refactor) and
  * scoped the converters `private[sql]`; libraries that ship native
  * Catalyst expressions conventionally expose them through a shim in an
  * `org.apache.spark.sql` subpackage. This is the only place the engine
  * touches a non-public Spark API, and it is a two-line adapter.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
