package org.apache.spark.sql.classic

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for graft's custom Catalyst expressions.
  * ExpressionUtils is private[sql] in Spark 4's Scala signatures; exposing
  * these two calls from inside the package is the standard extension
  * pattern (the bytecode is public — only the Scala access modifier
  * blocks direct use).
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
