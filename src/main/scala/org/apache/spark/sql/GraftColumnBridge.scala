package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between graft's custom Catalyst expressions and the public
  * Column API. Spark 4 hides Column(expr) behind `private[sql]`
  * (columnNodeSupport.scala); the standard extension-library pattern is a
  * tiny shim inside the org.apache.spark.sql namespace — same approach as
  * public Spark-extension projects. Nothing else in this repo lives
  * outside the graft namespace. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
