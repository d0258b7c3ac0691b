package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge between the node-backed public `Column` of Spark 4 and Catalyst
  * `Expression`s, for registering custom expressions from graft code.
  * Lives under `org.apache.spark.sql` to reach the `private[sql]` helpers —
  * the standard extension-library pattern.
  */
object GraftShims {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Unload every loaded state-store provider and stop the maintenance
    * thread. Streaming queries (MemoryStream replays, session gates) leave
    * loaded providers + a maintenance task behind after `query.stop()`;
    * under a measurement harness that residue taxes the NEXT queries
    * (round-6 bench read six queries 1.7–2.7× slower in-suite than in
    * isolation). Safe to call between queries — a later streaming query
    * re-loads providers from its checkpoint. */
  def stopStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.stop()
}
