package graft.qa

import graft.sources.SnapshotStore
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Weekly QA error-summary with week-over-week "Change" comparison
 * (SURVEY §2.8; reference scripts/QA/wdrs_qa/wdrs_qa_main.R:303-341):
 * this run's per-error-type / per-year violation counts are pivoted wide,
 * totaled, and full-joined against the most recent persisted summary;
 * `Change = Total - prev Total` is the regression signal a reviewer
 * actually reads.
 *
 * Scale note: the reference gathers every *_warn column into long form
 * FIRST and then counts — at 100 TB that multiplies the row count by the
 * number of rules before any aggregation. Here the order is inverted:
 * one hash aggregation with map-side partial combine reduces the corpus
 * to (#years) rows of per-rule sums, and ALL reshaping (unpivot, pivot,
 * totals, the join against last week) happens on that dozens-of-rows
 * result. The previous summary is broadcast — it is never big.
 */
object WeeklyChange {

  /**
   * Error-summary pivot (wdrs_qa_main.R:303-311): rows = rule name
   * ("error"), columns = y<year> counts + Total, zero-filled, sorted by
   * Total descending. `flagged` must already carry the 0/1 flag columns
   * (QaRules.applyBattery output).
   */
  def errorSummary(flagged: DataFrame, flagCols: Seq[String],
      yearCol: Column, years: Seq[Int]): DataFrame = {
    // single corpus-wide pass: per-year sums of every flag column
    val perYear = flagged.groupBy(yearCol.as("year"))
      .agg(sum(col(flagCols.head)).cast("long").as(flagCols.head),
        flagCols.tail.map(c => sum(col(c)).cast("long").as(c)): _*)
    // reshape the tiny result: unpivot to (error, year, n), pivot years wide
    val kv = perYear.select(col("year"),
        explode(array(flagCols.map(c =>
          struct(lit(c).as("error"), col(c).as("n"))): _*)).as("kv"))
      .select(col("year"), col("kv.error").as("error"), col("kv.n").as("n"))
    val wide0 = kv.groupBy("error")
      .pivot("year", years.map(_.toString)).agg(sum("n"))
    val wide = years.foldLeft(wide0)((d, y) =>
      d.withColumnRenamed(y.toString, s"y$y")).na.fill(0L)
    wide
      .withColumn("Total", years.map(y => col(s"y$y")).reduce(_ + _))
      .orderBy(col("Total").desc, col("error"))
  }

  /**
   * The week-over-week comparison (wdrs_qa_main.R:314-341): full-join
   * this run's summary with the previous one on the error type, zero-fill
   * both sides, Change = Total - previous Total. Error types that
   * disappeared this week survive the full join with all-zero year
   * columns and a negative Change, exactly like the reference's
   * `replace(is.na(.), 0)` full_join.
   */
  def change(current: DataFrame, previous: DataFrame): DataFrame = {
    val prev = broadcast(previous.select(col("error"),
      col("Total").cast("long").as("__prev_total")))
    current.join(prev, Seq("error"), "full_outer")
      .na.fill(0L)
      .withColumn("Change", col("Total") - col("__prev_total"))
      .drop("__prev_total")
  }

  /**
   * The full weekly job: read the latest persisted summary from the
   * store (the reference's `summary_table*.csv` most-recent pick,
   * wdrs_qa_main.R:314-321 — here the SnapshotStore's published version),
   * compute the comparison, and publish this week's summary for next
   * week's run. First run (no published summary) compares against an
   * empty previous: every Change equals this week's Total.
   */
  def weeklyChange(store: SnapshotStore, table: String,
      current: DataFrame): DataFrame = {
    // resolve the PREVIOUS version's path before publishing flips _CURRENT
    // (readOrEmpty pins the version dir eagerly)
    val prev = store.readOrEmpty(table,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("error",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("Total",
          org.apache.spark.sql.types.LongType))))
    store.publish(table, current)
    // build the comparison from the PUBLISHED parquet, not the live plan:
    // the corpus-wide summary aggregation already ran for the publish, and
    // a caller materializing the returned frame must re-read a version
    // dir, not replay the aggregation a third time
    change(store.read(table), prev.select("error", "Total"))
  }
}
