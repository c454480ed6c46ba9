package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Wraps a raw Catalyst [[Expression]] into a user-facing [[Column]].
  *
  * Spark 4's classic `ExpressionUtils.column` is `private[sql]`, so
  * libraries that build native expressions programmatically (with
  * plan-time constants a FunctionRegistry builder can't carry, like
  * [[graft.functions.NearestCells]]'s centroid matrix) need this one-line
  * bridge in the `org.apache.spark.sql` namespace — the same pattern
  * Delta Lake and Frameless use for their expression columns.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
}
