package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the node-backed public `Column` of Spark 4 and Catalyst
  * `Expression`s, for registering custom expressions from graft code.
  * Lives under `org.apache.spark.sql` to reach the `private[sql]` helpers —
  * the standard extension-library pattern.
  */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
