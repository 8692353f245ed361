package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge for wrapping a raw catalyst [[Expression]] in a user-facing
  * [[Column]] — Spark 4's Column is a connect-compatible node tree with
  * no public Expression constructor (`new Column(expr)` and `.expr`
  * are gone). Needed where graft applies a custom Expression (e.g.
  * [[graft.catalog.PosDeleted]]) through the Dataset API. */
object ColumnBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  /** The catalyst expression behind a classic Column node. */
  def expression(c: Column): Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
