package graft.qa

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Lab-submission freshness monitoring (SURVEY §2.8 family; reference
 * scripts/QA/lab_submissions_monitoring.Rmd): walk the landing-zone
 * folders ("Submitted" and "Completed" trees), take the most recent file
 * per folder, compute the days-lag to the run date, map folders to lab
 * names, and report (a) the detailed per-folder table and (b) a per-lab
 * summary keeping each lab's SMALLEST lag (ties collapsed), sorted most
 * stale first — the weekly "lags in receiving lab files" artifact,
 * written as a two-sheet workbook via [[graft.sinks.XlsxSink]].
 *
 * The directory walk is driver-side Hadoop FS METADATA (same as the
 * reference's list.files; thousands of entries, no file contents) — the
 * frame logic downstream is ordinary distributed ops, so a cloud landing
 * zone with millions of objects can swap the walk for an inventory table
 * without touching the report.
 */
object LabMonitoring {

  /** One landing-zone file: full path, parent dir, modification TIMESTAMP
    * (an absolute instant — the day boundary is applied later in the
    * SESSION timezone, so the lag never shifts with the driver JVM's
    * default zone), tree label ("Submitted" / "Completed"). `_RUNNING`
    * temp files are excluded, like the reference's
    * `!str_detect(files, "_RUNNING.*")`. */
  def scanLandingZone(spark: SparkSession, roots: Seq[(String, String)],
      extensions: Seq[String] = Seq(".xlsx", ".csv", ".xls")): DataFrame = {
    import spark.implicits._
    val conf = spark.sessionState.newHadoopConf()
    val rows = roots.flatMap { case (label, root) =>
      val p = new org.apache.hadoop.fs.Path(root)
      val fs = p.getFileSystem(conf)
      if (!fs.exists(p)) Seq.empty
      else {
        val buf = scala.collection.mutable.ArrayBuffer
          .empty[(String, String, java.sql.Timestamp, String)]
        graft.operators.FsWalk.foreachFile(fs, p) { st =>
          val name = st.getPath.getName
          if (extensions.exists(name.toLowerCase.endsWith) &&
              !name.contains("_RUNNING")) {
            buf += ((st.getPath.toString, st.getPath.getParent.toString,
              new java.sql.Timestamp(st.getModificationTime), label))
          }
        }
        buf.toSeq
      }
    }
    rows.toDF("path", "folder", "mtime", "type")
  }

  /**
   * Most recent file per folder + days-lag (lab_submissions_monitoring
   * .Rmd:40-110): one row per (folder, type) carrying its newest file.
   */
  def latestPerFolder(files: DataFrame, asOf: Column): DataFrame =
    files
      .withColumn("__rn", row_number().over(
        Window.partitionBy(col("folder"), col("type"))
          .orderBy(col("mtime").desc, col("path"))))
      .filter(col("__rn") === 1)
      .drop("__rn")
      // cast-to-date happens HERE, in the session timezone — consistent
      // with an asOf of current_date()
      .withColumn("datediff", datediff(asOf, col("mtime").cast("date")))

  /** Folder -> lab mapping: first matching pattern wins, no match => ""
    * (the reference's grepl case_when chain — a vocab-standardization
    * when-chain, not a join, because patterns are substrings). */
  def labFromFolder(patterns: Seq[(String, String)]): Column =
    patterns.foldRight(lit(""): Column) { case ((pat, lab), els) =>
      when(col("folder").contains(pat), lit(lab)).otherwise(els)
    }

  /**
   * The weekly report: detailed per-folder rows (labeled, excluded labs
   * filtered out, sorted by lab then lag) and the per-lab summary keeping
   * the smallest lag, distinct, sorted most-stale-first.
   */
  def report(recent: DataFrame, patterns: Seq[(String, String)],
      excludeLabs: Seq[String] = Seq.empty): (DataFrame, DataFrame) = {
    val labeled = recent
      .withColumn("Lab", labFromFolder(patterns))
      .filter(col("Lab") =!= "" && !col("Lab").isin(excludeLabs: _*))
    val detailed = labeled
      .select(col("Lab"), col("path"), col("folder"), col("mtime"),
        col("type"), col("datediff"))
      .orderBy(col("Lab"), col("datediff"))
    val summary = labeled
      .withColumn("__min", min(col("datediff")).over(Window.partitionBy(col("Lab"))))
      .filter(col("datediff") === col("__min"))
      .select(col("Lab"), col("datediff"))
      .distinct()
      .orderBy(col("datediff").desc, col("Lab"))
    (detailed, summary)
  }

  /** End-to-end: scan, report, write the two-sheet workbook. */
  def run(spark: SparkSession, roots: Seq[(String, String)],
      patterns: Seq[(String, String)], outPath: String,
      asOf: Column, excludeLabs: Seq[String] = Seq.empty): (DataFrame, DataFrame) = {
    val (detailed, summary) =
      report(latestPerFolder(scanLandingZone(spark, roots), asOf),
        patterns, excludeLabs)
    graft.sinks.XlsxSink.write(outPath,
      Seq("Summary" -> summary, "Detailed" -> detailed))
    (detailed, summary)
  }
}
