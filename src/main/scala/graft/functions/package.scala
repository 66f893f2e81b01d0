package graft

import org.apache.spark.sql.Column

/** Column-level function library (SURVEY.md §2.7, §2.9). */
package object functions {
  /** Wrap a Catalyst Expression as a user-facing Column (Spark 4 classic API). */
  private[graft] def exprToColumn(e: org.apache.spark.sql.catalyst.expressions.Expression): Column =
    org.apache.spark.sql.graftshim.GraftSqlShim.column(e)

  private[graft] def columnToExpr(c: Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.graftshim.GraftSqlShim.expression(c)

  /** OSA (restricted Damerau-Levenshtein) string distance — see [[OsaDistance]]. */
  def osa_distance(a: Column, b: Column): Column =
    exprToColumn(OsaDistance(columnToExpr(a), columnToExpr(b)))
}
