package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to build a Column from a raw Catalyst Expression. Spark 4 made the
  * Column(expr) constructor private for the Connect split; classic-mode
  * libraries use ExpressionUtils, which is private[sql] — hence this shim
  * package.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
