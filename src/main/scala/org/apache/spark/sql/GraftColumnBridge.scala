package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the sql package-private Column↔Expression converters
  * (`org.apache.spark.sql.classic.ExpressionUtils`), so graft's native
  * Catalyst expressions can surface as `Column`s in the public DSL — the
  * classic extension-library pattern.
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
