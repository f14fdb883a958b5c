package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge: Spark 4 scopes ExpressionUtils private[sql],
  * so custom Catalyst expressions need this one-hop inside the sql package
  * to surface as user-facing Columns. */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** EAGER Column → Expression conversion. `expression` defers through a
    * lazy ColumnNodeExpression wrapper that the analyzer treats as opaque —
    * fine when the Column feeds a Dataset operation (the converter runs at
    * plan build), but a function-registry builder must hand the analyzer a
    * real catalyst tree (any UnresolvedFunction leaves then resolve on the
    * analyzer's next fixed-point pass). */
  def expressionEager(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
