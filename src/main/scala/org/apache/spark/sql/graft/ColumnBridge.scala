package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ↔ Catalyst Expression bridge for graft's native expressions.
  *
  * Spark 4 made `Column` wrap a ColumnNode and scoped the conversion
  * helpers `private[sql]`; this shim lives in the sql package namespace to
  * re-expose exactly the two conversions a library defining its own
  * codegen'd expressions needs (the same seam spark-internal functions use,
  * org.apache.spark.sql.classic.columnNodeSupport).
  */
object ColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
