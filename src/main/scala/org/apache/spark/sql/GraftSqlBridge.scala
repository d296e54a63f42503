package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into the `private[sql]` classic Column↔Expression converters —
  * the standard Spark-extension idiom for libraries that construct custom
  * Catalyst expressions as Columns WITHOUT a per-session function-registry
  * round-trip (graft's registry path, `call_function`, needs
  * `GraftFunctions.register(spark)` first; pure Column helpers like
  * TextAnalysis must work on any session).
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
