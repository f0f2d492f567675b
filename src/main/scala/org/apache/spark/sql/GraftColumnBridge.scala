package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql-private Column↔Expression converters so graft's
  * custom Catalyst expressions can expose a public Column API (the
  * converters are private[sql] in Spark 4's classic module). */
object GraftColumnBridge {
  def toColumn(e: Expression): Column = classic.ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** EAGER node-tree conversion for SQL function-registry builders: the
    * lazy [[toExpression]] wrapper is only unwrapped on the normal
    * DataFrame path; inside a FunctionRegistry builder it survives to
    * codegen unresolved ("Cannot generate code for expression:
    * columnnodeexpression"). This converts the whole Column node tree
    * to a catalyst tree up front, leaving ordinary unresolved
    * attributes/functions for the analyzer. */
  def toExpressionEager(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
