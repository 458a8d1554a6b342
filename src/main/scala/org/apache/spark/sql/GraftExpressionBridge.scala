package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between Catalyst `Expression`s and the public `Column` API.
  *
  * Spark 4 moved the Expression⇄Column constructors behind
  * `private[sql] classic.ExpressionUtils`; this one-file shim (in the sql
  * package, the standard technique for Spark-native libraries) re-exports
  * exactly the two conversions graft's custom expressions need.
  */
object GraftExpressionBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
