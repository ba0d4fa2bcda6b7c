package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the one `private[sql]` API this library needs: Column →
  * Catalyst Expression (removed from Column's public surface in Spark 4's
  * Connect-compatible API). Used for driver-side constant-fold checks on
  * compiled predicates before any plan is built — the same package-placed
  * accessor pattern other Spark extension libraries use. */
object GraftInternals {
  def expression(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
