package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal access bridge: `ExpressionUtils.column/expression` are
  * `private[sql]` in Spark 4.x, so wrapping a custom Catalyst Expression
  * into a public `Column` requires one object inside the
  * `org.apache.spark.sql` package tree. This is the only class graft
  * places there; everything else lives under `graft.*`.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
