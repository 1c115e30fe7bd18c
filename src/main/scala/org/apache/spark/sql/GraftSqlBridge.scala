package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal bridge into the `private[sql]` Column ⇄ Expression converters —
  * the supported-in-practice seam every Spark extension library uses to
  * wrap a custom Catalyst [[Expression]] as a user-facing [[Column]]
  * without a per-session function-registry round trip. Only the two
  * converters are exposed; nothing else of the package internals leaks.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Non-blocking read of an [[Observation]]'s metrics (`getOrEmpty` is
    * `private[sql]`): empty until the listener delivering the observed
    * row has fired. Lets a caller poll with its own deadline instead of
    * parking forever in `get`.
    */
  def observedOrEmpty(o: Observation): Map[String, Any] = o.getOrEmpty
}
