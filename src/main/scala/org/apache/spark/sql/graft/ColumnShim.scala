package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's parameterized native
  * expressions (e.g. [[graft.functions.TopCells]], which carries a
  * centroid matrix as constructor data and so cannot be built through
  * the name-based function registry without per-snapshot registration
  * churn). Spark 4 gates `ExpressionUtils` behind `private[sql]`; this
  * one-object subpackage shim is the conventional extension-library
  * escape hatch (the same move public Spark connectors/extensions use
  * for Column construction) and keeps the rest of graft outside Spark's
  * namespace.
  */
object ColumnShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
