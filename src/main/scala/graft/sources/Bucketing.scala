package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * Bucketed state tables for co-located joins (SURVEY §4: "repartition()/
 * bucketing for co-located joins"). Writing both sides of a recurring join
 * bucketed by the join key lets every subsequent join run shuffle-free —
 * the plan shows SortMergeJoin with NO Exchange on either side. At 100 TB
 * this turns the nightly match join's two full-table shuffles into zero.
 */
object Bucketing {

  /** Write `df` as a bucketed managed table on `key`. */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key: shuffle-free. */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
      key: String, joinType: String = "inner"): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), Seq(key), joinType)

  /** True when the executed plan contains no shuffle exchange — the
    * bucketing contract held. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")
}
