package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Minimal bridge into the `private[sql]` classic-session internals the
  * SQL DML router needs (the same seam Delta/Iceberg open with their
  * own `org.apache.spark.sql.*` shim files): wrap a Catalyst expression
  * as a public [[Column]], and resolve a parsed logical plan to a
  * [[DataFrame]]. Nothing else crosses this boundary. */
object ClassicBridge {
  def column(e: Expression): Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** Rebind a streaming micro-batch's ALREADY-COMPUTED rows as a batch
    * DataFrame (the `Sink.addBatch` contract hands a DF that cannot be
    * re-planned for a batch write) — the standard V1-sink capture:
    * `toRdd` of the executed batch, wrapped without recompute. */
  def capturedBatch(data: DataFrame): DataFrame = {
    val spark = data.sparkSession.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val rows = data.queryExecution.toRdd.map(_.copy())
    spark.internalCreateDataFrame(rows, data.schema, isStreaming = false)
  }
}
