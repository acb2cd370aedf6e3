/** Bridge into `private[sql]` surface needed by custom-expression authors:
  * Column ⇄ Expression conversion lives in `org.apache.spark.sql.classic.
  * ExpressionUtils` (Spark 4 sql-api split) and is not exported. Placing
  * this one-file accessor in the sql package is the established pattern
  * for Catalyst extension libraries.
  */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

object GraftColumnBridge {
  def toColumn(e: Expression): Column = ExpressionUtils.column(e)
  def toExpression(c: Column): Expression = ExpressionUtils.expression(c)
}
