/* Bridge into Spark's private[sql] Column↔Expression converters —
 * the standard technique for third-party Catalyst expressions (the
 * public Column constructor was removed in Spark 4's classic API).
 */
package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
