package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Column <-> Expression bridge for graft's custom Catalyst expressions.
  *
  * Spark 4 made `classic.ExpressionUtils` private[sql]; the supported
  * public route is `call_function` + registry, which graft uses for the
  * vector kernels (registered via GraftExtensions / register()). The
  * h60 hash primitive, however, is called from EVERY operator family and
  * from test sessions that never install the extension, so it must not
  * depend on registry state — this thin same-package forwarder exposes
  * exactly the two conversions (a standard Spark-extension idiom; no
  * internals beyond the two public-shaped methods are touched).
  */
object GraftColumnBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)
}
