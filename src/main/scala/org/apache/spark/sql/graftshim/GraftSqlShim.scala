package org.apache.spark.sql.graftshim

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge between user-facing Column and Catalyst Expression for the classic
 * (non-connect) Spark 4 API, where the converters are private[sql].
 */
object GraftSqlShim {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** The session's effective autoBroadcastJoinThreshold in bytes (−1 =
    * broadcast disabled) — `sessionState` is private[sql], hence here. */
  def autoBroadcastThreshold(spark: org.apache.spark.sql.SparkSession): Long =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.conf.autoBroadcastJoinThreshold
}
