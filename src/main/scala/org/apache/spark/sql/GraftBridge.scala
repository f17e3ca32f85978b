package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge to the `private[sql]` Column ↔ Expression converters, so graft's
  * custom Catalyst expressions can be exposed as `Column`s (the supported
  * extension seam in Spark 4's classic API).
  */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The complete `explain("formatted")` text of a frame — the string
    * `Dataset.explain` prints, returned instead of printed (plan-capture
    * deliverables want files, not stdout).
    */
  def explainString(df: Dataset[_]): String =
    df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))

  /** Block until the async listener bus has delivered every queued event
    * (or the timeout passes) — the deterministic between-queries drain for
    * measurement harnesses, instead of a best-effort sleep.
    */
  def drainListenerBus(sc: org.apache.spark.SparkContext,
                       timeoutMs: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch { case _: java.util.concurrent.TimeoutException => () }
}
