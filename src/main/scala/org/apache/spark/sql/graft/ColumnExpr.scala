package org.apache.spark.sql.graft

import org.apache.spark.sql.{classic, Column}
import org.apache.spark.sql.catalyst.expressions.Expression

/** Spark 4 moved `Column.expr` behind the connect/classic split:
  * the Column → Catalyst [[Expression]] conversion now lives in
  * `classic.ExpressionUtils`, which is `private[sql]`. This one-line
  * shim re-exports it for [[graft.etl.ZoneMaps]]'s predicate analysis —
  * the standard extension-library pattern (Delta, Iceberg, and Spark's
  * own test kits host helpers inside `org.apache.spark.sql.*` for the
  * same reason). Nothing else in the engine needs package-private
  * access. */
object ColumnExpr {
  def expr(c: Column): Expression =
    classic.ColumnNodeToExpressionConverter(c.node)
}
