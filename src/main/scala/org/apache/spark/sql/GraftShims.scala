package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column ⇄ Catalyst-Expression bridge for the engine's native
  * expressions (`graft.plans.*`). Spark 4's Column wraps a ColumnNode and
  * the conversion helpers (`classic.ExpressionUtils`) are `private[sql]`,
  * so pure Column→Column operators (e.g. `Dedup.hash60`, which has no
  * SparkSession in scope to register a function against) need this
  * one-file shim in the sql package — the same pattern Delta Lake and
  * Frameless use for their native expressions. Everything else in the
  * engine lives under `graft.*`; keep this file to conversions only.
  */
object GraftShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
