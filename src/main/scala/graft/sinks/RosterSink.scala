package graft.sinks

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Roster sinks (SURVEY §2.1): S7 CSV with NA-as-empty, S9 chunked ≤500-row
 * files (the WDRS upload limit, docs/notebooks/ROSTER_COMPILE.Rmd:396-432),
 * S8 append with conservation check.
 */
object RosterSink {

  /**
   * S9 chunk assignment: global row_number over a deterministic order,
   * then chunk id = ceil(rn / maxRows). The global row_number is a single
   * total order — fine for roster-sized outputs (≤ thousands); for 100 TB
   * outputs use per-partition chunking (partition id ++ local chunk) via
   * `spark_partition_id`, which needs no global sort.
   */
  def withChunkId(roster: DataFrame, orderCols: Seq[String],
      maxRows: Int = 500): DataFrame =
    roster.withColumn("_chunk",
      ceil(row_number().over(
        Window.orderBy(orderCols.map(col): _*)) / lit(maxRows.toDouble))
        .cast("int"))

  /** S7: write CSV with null→empty (write_csv(..., na="")) partitioned by
    * chunk — each chunk lands as its own directory of ≤maxRows files. */
  def writeChunked(roster: DataFrame, path: String, orderCols: Seq[String],
      maxRows: Int = 500): Unit =
    withChunkId(roster, orderCols, maxRows)
      .repartition(col("_chunk"))
      .write.mode("overwrite")
      .partitionBy("_chunk")
      .option("header", "true")
      .option("emptyValue", "")
      .option("nullValue", "")
      .csv(path)

  /**
   * S8 append-with-conservation: append `delta` to the state table at
   * `path`, then verify the re-read row count grew by exactly delta.count
   * (template_submitters.Rmd:961-985). Returns the post-append count;
   * throws on conservation failure (the reference diverts to a holding
   * folder — callers catch and route).
   */
  def appendWithCheck(delta: DataFrame, path: String): Long = {
    val spark = delta.sparkSession
    val before =
      try spark.read.option("header", "true").csv(path).count()
      catch { case _: Throwable => 0L }
    val expected = delta.count()
    delta.write.mode("append").option("header", "true")
      .option("emptyValue", "").option("nullValue", "").csv(path)
    val after = spark.read.option("header", "true").csv(path).count()
    if (after != before + expected)
      throw new IllegalStateException(
        s"conservation check failed: $before + $expected != $after")
    after
  }
}
