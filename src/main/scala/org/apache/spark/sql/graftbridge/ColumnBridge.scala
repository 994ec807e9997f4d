package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.{ColumnNodeToExpressionConverter, ExpressionColumnNode}

/** Bridge between the public `Column` API and Catalyst `Expression`s.
  *
  * Spark 4 made the Column<->Expression converters `private[sql]`
  * (columnNodeSupport.scala); custom native expressions still need them,
  * so this lives under the org.apache.spark.sql package namespace — the
  * standard pattern for Spark extension libraries.
  */
object ColumnBridge {
  def expression(c: Column): Expression = ColumnNodeToExpressionConverter(c.node)
  def column(e: Expression): Column = new Column(ExpressionColumnNode(e))
}
