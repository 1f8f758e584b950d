package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Bridge into Spark's `private[sql]` Column↔Expression converters so the
  * graft library can expose custom Catalyst expressions as plain `Column`s
  * (the standard extension technique for libraries compiled against the
  * Spark classic API). */
object GraftColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  /** Accessible alias for the private[sql] AbstractDataType, so graft
    * expressions can declare `inputTypes` (ImplicitCastInputTypes). */
  type ADT = org.apache.spark.sql.types.AbstractDataType

  /** Build a DataFrame from a custom LogicalPlan (private[sql]
    * Dataset.ofRows) — needed to surface custom operators like the as-of
    * join as ordinary DataFrames. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** The analyzed logical plan of a DataFrame. */
  def analyzed(df: DataFrame):
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.queryExecution.analyzed

  /** Build a DataFrame from an InternalRow RDD with a known schema
    * (private[sql] SparkSession.internalCreateDataFrame) — needed for
    * RDD-level operators (e.g. zipWithIndex global indexing) that must
    * re-enter the DataFrame world without a Row round-trip. */
  def internalCreateDataFrame(
      spark: SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)

  /** Install the functions injected into a [[SparkSessionExtensions]] into
    * an EXISTING session's function registry (private[sql]
    * `registerFunctions`) — lets driver-owned sessions (no
    * `spark.sql.extensions` config) use the graft_* SQL surface. */
  def registerExtensionFunctions(ext: SparkSessionExtensions,
                                 spark: SparkSession): Unit = {
    ext.registerFunctions(
      spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry)
    ()
  }
}
