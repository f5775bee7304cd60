package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal accessor for `private[sql]` Column<->Expression conversion —
  * the supported way for third-party Catalyst expressions to expose a
  * Column API in Spark 4 (the helpers live behind package-private
  * visibility, so extension libraries host a bridge in an
  * `org.apache.spark.sql` subpackage).
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
