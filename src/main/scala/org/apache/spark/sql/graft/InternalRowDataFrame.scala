package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** Bridge to `SparkSession.internalCreateDataFrame` (`private[sql]`):
  * builds a DataFrame over an RDD of INTERNAL rows, skipping the
  * external-Row round trip `createDataFrame(RDD[Row], schema)` pays
  * (internal→Scala conversion per value on the producer side plus a
  * Catalyst re-conversion per value inside the scan). The standard
  * connector-shim pattern: a one-call object placed under
  * `org.apache.spark.sql` so the `private[sql]` member resolves —
  * no Spark internals are copied or re-implemented.
  *
  * Producers must emit values in the Catalyst internal domain
  * (UTF8String, Decimal, ArrayData, µs longs for timestamps). */
object InternalRowDataFrame {
  def create(spark: SparkSession, rdd: RDD[InternalRow], schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = false)
}

/** Two more `private[sql]` one-liners the SQL DML rules need (same
  * connector-shim pattern, nothing copied or re-implemented):
  * Expression → Column, and DataFrame-over-analyzed-plan. */
object GraftSqlBridge {
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)

  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
