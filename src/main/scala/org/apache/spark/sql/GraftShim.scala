package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge between [[Column]] and Catalyst [[Expression]] for graft's
  * custom expressions.
  *
  * Spark 4.x made `org.apache.spark.sql.classic.ExpressionUtils`
  * `private[sql]`; this file lives in the `org.apache.spark.sql`
  * package purely to re-export the two conversions graft needs. No
  * other Spark internals are touched.
  */
object GraftShim {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}

/** Mixin declaring "exactly one StringType input" for graft's unary
  * string expressions. Lives here because `AbstractDataType` (the
  * `inputTypes` element type) is `private[sql]` in Spark 4.x, so the
  * override cannot be written outside this package.
  */
trait GraftStringUnaryInput
    extends org.apache.spark.sql.catalyst.expressions.ExpectsInputTypes {
  self: Expression =>
  override def inputTypes: Seq[types.AbstractDataType] = Seq(types.StringType)
}
