package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's native Catalyst expressions and the public
  * Column API: `classic.ExpressionUtils` is private[sql] in Spark 4, so
  * the lift/unlift pair is re-exported from inside the sql package —
  * the conventional pattern for Spark-extension libraries.
  */
package object graftshim {
  def columnOf(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expressionOf(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
