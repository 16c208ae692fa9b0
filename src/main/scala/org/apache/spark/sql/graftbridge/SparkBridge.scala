package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic

/** Bridge into `private[sql]` Spark internals the DSv2 DML commands
  * need: running an already-analyzed LogicalPlan as a DataFrame, and
  * converting between resolved `Expression`s and public `Column`s.
  *
  * Living under `org.apache.spark.sql` to reach package-private API is
  * the established pattern for Spark connectors that implement SQL DML
  * (Delta Lake's `org.apache.spark.sql.delta` does exactly this); the
  * rest of the engine stays in `graft.*` and goes through this one
  * narrow seam.
  */
object SparkBridge {

  /** Wraps an analyzed plan as a DataFrame (exprIds survive re-analysis,
    * so expressions resolved against `plan`'s output stay bound).
    */
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** A Column over an arbitrary (possibly already-resolved) expression. */
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)

  /** The Catalyst expression behind a Column. */
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Like [[expression]], but with the lazy `ColumnNodeExpression`
    * wrapper (public-API columns like `functions.avg` carry a
    * ColumnNode, converted only at analysis) eagerly converted, so
    * callers can pattern-match the Catalyst shape (e.g.
    * `UnresolvedFunction`) before a plan exists.
    */
  def convertedExpression(c: Column): Expression =
    classic.ExpressionUtils.expression(c) match {
      case classic.ColumnNodeExpression(node) =>
        classic.ColumnNodeToExpressionConverter(node)
      case e => e
    }

  /** A DataFrame flagged isStreaming=true over an InternalRow RDD —
    * what a V1 streaming `Source.getBatch` must return
    * (MicroBatchExecution asserts the plan is streaming). Same
    * internal API FileStreamSource uses.
    */
  def streamingDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)
}
