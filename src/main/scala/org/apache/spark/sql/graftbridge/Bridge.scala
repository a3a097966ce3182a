package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge exposing the `private[sql]` Column ⇄ Expression
  * converters to the graft engine — the supported pattern for
  * third-party native expressions (the converters live in
  * `org.apache.spark.sql.classic.ExpressionUtils`, Spark 4's
  * columnNodeSupport).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
