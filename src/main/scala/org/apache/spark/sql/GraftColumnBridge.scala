package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge to the sql-private Column ⇄ Expression converters
  * (`classic.ExpressionUtils`, spark/sql/classic/columnNodeSupport
  * .scala). Needed for expressions that close over runtime state a
  * `FunctionRegistry` constructor cannot carry — e.g. graft's
  * broadcast-bloom probe, whose child is a `Broadcast` handle, not a
  * literal. Registry-constructible expressions keep using
  * `call_function`; this is the narrow escape hatch, placed in the
  * Spark namespace the way Spark extension libraries conventionally
  * do. */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
