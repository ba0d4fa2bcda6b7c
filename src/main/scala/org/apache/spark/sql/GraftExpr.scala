package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the `private[sql]` Column ⇄ Expression converters.
  *
  * Graft binds plan-time configuration (a broadcast dictionary, a MinHash
  * family, a tokenizer schema) into custom Catalyst Expressions. Building the
  * `Column` directly keeps that binding on the expression object itself;
  * routing through `FunctionRegistry.createOrReplaceTempFunction` — the only
  * public alternative — keys it on a registry NAME, which both leaks one
  * registration per binding for the session lifetime and lets two bindings
  * that hash to the same name silently rebind each other's not-yet-analyzed
  * Columns.
  */
object GraftExpr {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
