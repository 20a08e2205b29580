package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column <-> Expression bridge for graft's native Catalyst
  * expressions. Spark keeps these converters `private[sql]`, so —
  * like every Spark extension library shipping custom expressions —
  * we expose them from a shim inside the sql package namespace.
  */
object GraftShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Bounded-wait observation read (≤100ms): `getRowOrEmpty` is
    * `private[sql]`, but it is the only safe way to consume observed
    * metrics from a context where the listener event may never arrive
    * (a merge nested in a streaming foreachBatch). `getOrEmpty` is NOT
    * usable for this: on a missing row it maps over `Row.empty.schema`,
    * which is null → NPE.
    */
  def observedOrEmpty(obs: org.apache.spark.sql.Observation): Option[org.apache.spark.sql.Row] =
    obs.getRowOrEmpty

  /** Build a DataFrame from a custom LogicalPlan node (the entry every
    * custom-operator library needs; `Dataset.ofRows` is `private[sql]`).
    */
  def ofRows(
      spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Register a native expression as a SQL function on a LIVE session
    * (the session-build-time path is `spark.sql.extensions` →
    * [[graft.GraftExtensions]], pure public API; this covers sessions
    * that already exist — `sessionState` is `private[sql]`).
    */
  def registerFunction(
      spark: org.apache.spark.sql.SparkSession,
      name: String,
      info: org.apache.spark.sql.catalyst.expressions.ExpressionInfo,
      builder: Seq[Expression] => Expression): Unit =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
      .registerFunction(org.apache.spark.sql.catalyst.FunctionIdentifier(name), info, builder)
}
