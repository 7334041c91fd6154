package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge. Spark 4 made `new Column(expr)` private to
  * the `org.apache.spark.sql` package (connect-agnostic Column); this
  * object lives under that namespace to lend the conversion to graft's
  * custom Catalyst expressions — the same access pattern third-party
  * Spark extensions (e.g. connectors that predate the API split) use. */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}
