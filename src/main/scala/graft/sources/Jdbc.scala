package graft.sources

import java.util.Properties
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/**
 * S4 ingest (SURVEY §2.1): database pulls with the WHERE pushed down to
 * the database — every reference script opens with an ODBC query carrying
 * its predicate server-side (docs/notebooks/template_submitters.Rmd:142-163,
 * docs/notebooks/fuzzy.Rmd:213-228: `SELECT ... WHERE CODE = 'SARS' AND
 * STATUS != 6`).
 *
 * Two pull shapes:
 * - [[pull]]: Catalyst pushes `.filter(...)` predicates into the JDBC
 *   scan (visible as `PushedFilters` on the plan — asserted in JdbcSpec,
 *   not assumed). Column pruning reaches the database the same way.
 * - [[pullPartitioned]]: the 100 TB shape — N parallel connections each
 *   reading one stride of `partitionCol`, so a big table lands as N
 *   partitions instead of one serialized result set.
 *
 * Arbitrary server-side SQL (joins, DISTINCT) goes through [[pullQuery]]
 * — the text is wrapped as a derived table and evaluated by the database.
 */
object Jdbc {

  private def props(extra: Map[String, String]): Properties = {
    val p = new Properties()
    extra.foreach { case (k, v) => p.setProperty(k, v) }
    p
  }

  /** Read `table`; apply `predicate` so Catalyst pushes it into the scan. */
  def pull(spark: SparkSession, url: String, table: String,
      predicate: Option[Column] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val df = spark.read.jdbc(url, table, props(options))
    predicate.fold(df)(df.filter)
  }

  /** Read with N parallel per-stride connections on a numeric column. */
  def pullPartitioned(spark: SparkSession, url: String, table: String,
      partitionCol: String, lower: Long, upper: Long, numPartitions: Int,
      predicate: Option[Column] = None,
      options: Map[String, String] = Map.empty): DataFrame = {
    val df = spark.read.jdbc(url, table, partitionCol, lower, upper,
      numPartitions, props(options))
    predicate.fold(df)(df.filter)
  }

  /** Push an arbitrary SQL text server-side as a derived table. */
  def pullQuery(spark: SparkSession, url: String, sql: String,
      options: Map[String, String] = Map.empty): DataFrame =
    spark.read.jdbc(url, s"($sql) pushed", props(options))
}
