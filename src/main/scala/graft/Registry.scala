package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One declared query per implemented operator (SURVEY.md §2). `oracle` is
 * the equivalent DuckDB SQL over the same parquet tables; None for
 * operators not expressible in ANSI SQL (driver then does a rows-only
 * check). Column names/aliases MUST match between the Spark result and the
 * oracle — the driver sorts columns by name before hashing.
 */
case class QueryDef(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

object Registry {
  def all: Seq[QueryDef] =
    QueriesRelational.defs ++ QueriesFunctions.defs ++
      QueriesText.defs ++ QueriesEvents.defs ++ QueriesMultimodal.defs ++
      QueriesOps2.defs ++ QueriesScale.defs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
