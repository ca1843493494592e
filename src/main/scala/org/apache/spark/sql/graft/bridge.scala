package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Minimal bridge to the `private[sql]` Column <-> Expression converters in
 * Spark 4's classic API, so graft's native Catalyst expressions can be
 * exposed as public `Column` functions. Lives under the spark.sql package
 * namespace for access, exactly like other Spark session extensions do.
 */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def analyzedPlan(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.analyzed

  /** The pushdown path's Expression → v1 source Filter translation
    * (`DataSourceStrategy.translateFilter` is protected[sql]) — used to
    * decide whether a DELETE condition stays on the SupportsDelete route
    * or needs the file-level rewrite. */
  def translateFilter(e: Expression)
      : Option[org.apache.spark.sql.sources.Filter] =
    org.apache.spark.sql.execution.datasources.DataSourceStrategy
      .translateFilter(e, supportNestedPredicatePushdown = true)

  /** The executed plan's InternalRow RDD (r18): the UnsafeRow-level twin
    * of `Dataset.rdd`, minus the boxed `Row` conversion that round-trips
    * every field through external objects. Lazily cached on the Dataset's
    * QueryExecution, so two passes over the same Dataset share one RDD
    * lineage (and its shuffle files), exactly like `.rdd` did. */
  def toInternalRdd(df: org.apache.spark.sql.DataFrame)
      : org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow] =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.toRdd

  /** `private[sql] SparkSession.internalCreateDataFrame` — build a
    * DataFrame over an InternalRow RDD without the external-Row encode
    * pass `createDataFrame(RDD[Row], schema)` pays. */
  def internalCreateDataFrame(spark: org.apache.spark.sql.SparkSession,
      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
      schema: org.apache.spark.sql.types.StructType)
      : org.apache.spark.sql.DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
