package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters so the
  * graft library can expose custom Catalyst expressions as plain `Column`s
  * (the standard extension technique for libraries compiled against the
  * Spark classic API). */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** Accessible alias for the private[sql] AbstractDataType, so graft
    * expressions can declare `inputTypes` (ImplicitCastInputTypes). */
  type ADT = org.apache.spark.sql.types.AbstractDataType
}
