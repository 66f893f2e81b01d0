package graft.qa

import java.io.{BufferedReader, InputStreamReader}
import java.util.zip.GZIPInputStream
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Q3: the template file-level validation battery
 * (docs/notebooks/template_submitters.Rmd:394-538) — eight per-FILE
 * checks that route a whole submission file to invalid ("work-stop
 * errors"):
 *
 *   1. format: header names match the template, set AND order
 *   2. gisaid: per-submitter GISAID_ID regex x SEQUENCE_STATUS
 *      consistency (id present+well-formed iff status COMPLETE/LOW
 *      QUALITY; absent when not COMPLETE)
 *   3. lab: SUBMITTING_LAB values in the accepted vocabulary
 *   4. reason: upper(SEQUENCE_REASON) in the accepted vocabulary
 *   5. status: upper(SEQUENCE_STATUS) in the accepted vocabulary
 *   6. coll_date: SPECIMEN_COLLECTION_DATE present and in one of the
 *      accepted shapes (m-d-Y / Y-m-d / 5-digit Excel serial)
 *   7. lineage: upper(PANGO_LINEAGE) in the accepted list
 *   (+ the submission path itself, column 1 in the reference's frame)
 *
 * Spark shape: the reference loops files on the driver; here every check
 * is a row-level boolean folded per `_provenance` with bool_and in ONE
 * grouped aggregation — file count can be millions without a driver loop.
 */
object FileValidation {

  /** Per-submitter GISAID_ID formats (template_submitters.Rmd:424-496),
    * matched against the submission path. POSIX classes translated to
    * Java regex. */
  val defaultSubmitterRules: Seq[(String, String)] = Seq(
    "Submissions/Aegis" -> "^ASC(\\d)*-B.*",
    "Submissions/Helix" -> "USA/WA-CDC-STM-.*",
    "Submissions/Labcorp" -> "^LC\\d*$",
    "" -> "^(hCoV-19/)?USA/WA-.*/\\d{4}$") // fallback: all other submitters

  /** The reference's date-shape alternation (template_submitters.Rmd:522),
    * unanchored like str_detect. */
  val dateShapes: String =
    "\\d{1,2}\\p{Punct}\\d{1,2}\\p{Punct}\\d{4}|\\d{4}\\p{Punct}\\d{1,2}\\p{Punct}\\d{1,2}|\\d{5}"

  private def inVocab(c: Column, vocab: Seq[String]): Column =
    coalesce(c.isin(vocab: _*), lit(false)) // NA %in% set is FALSE in R too

  /** Row-level GISAID consistency for one resolved (per-row) regex:
    * id present and well-formed when COMPLETE/LOW QUALITY, absent when
    * not COMPLETE (null status counts as not-COMPLETE). regexp_count
    * because rlike needs a literal pattern and the regex is a column. */
  private def gisaidRowOk(status: Column, gisaid: Column, regex: Column): Column = {
    val st = upper(status)
    val matches = coalesce(regexp_count(gisaid, regex) > 0, lit(false))
    (st.isin("COMPLETE", "LOW QUALITY") && matches) ||
      (coalesce(st =!= "COMPLETE", lit(true)) && gisaid.isNull)
  }

  /**
   * Validate data rows per file. `df` must carry `_provenance` plus the
   * template columns. Returns one row per file with a boolean per check
   * and `valid` = all checks pass (format/header is checked separately by
   * [[headerCheck]] — join on `_provenance`).
   */
  def validate(df: DataFrame,
      submitterRules: Seq[(String, String)] = defaultSubmitterRules,
      labValues: Seq[String],
      reasonValues: Seq[String],
      statusValues: Seq[String],
      lineageValues: Seq[String]): DataFrame = {
    // resolve the submitter regex from the path ONCE per row (a when
    // chain over path substrings; last rule with empty prefix = fallback)
    val regex = submitterRules.init.foldRight(
      lit(submitterRules.last._2)) { case ((prefix, re), els) =>
      when(col("_provenance").contains(prefix), lit(re)).otherwise(els)
    }
    val rowOk = Map(
      "gisaid_ok" -> gisaidRowOk(col("SEQUENCE_STATUS"), col("GISAID_ID"), regex),
      "lab_ok" -> inVocab(col("SUBMITTING_LAB"), labValues),
      "reason_ok" -> inVocab(upper(col("SEQUENCE_REASON")), reasonValues),
      "status_ok" -> inVocab(upper(col("SEQUENCE_STATUS")), statusValues),
      "coll_date_ok" -> coalesce(col("SPECIMEN_COLLECTION_DATE").rlike(dateShapes), lit(false)),
      "lineage_ok" -> inVocab(upper(col("PANGO_LINEAGE")), lineageValues))
    val agg = rowOk.toSeq.sortBy(_._1).map { case (name, okCol) =>
      bool_and(okCol).as(name)
    }
    df.groupBy(col("_provenance"))
      .agg(agg.head, agg.tail: _*)
      .withColumn("valid",
        rowOk.keys.toSeq.sorted.map(col).reduce(_ && _))
  }

  /**
   * Format check (check 1): the raw first line of each file must equal the
   * template header exactly — same names, same order
   * (template_submitters.Rmd:416-422's `all(names(f) == template)`).
   * Distributed: one bounded read per file on the executors; .gz handled.
   */
  def headerCheck(spark: SparkSession, paths: Seq[String],
      templateCols: Seq[String], sep: String = ","): DataFrame = {
    import spark.implicits._
    val expected = templateCols.mkString(sep)
    spark.sparkContext.binaryFiles(paths.mkString(","))
      .map { case (path, pds) =>
        val raw = pds.open()
        val in = new BufferedReader(new InputStreamReader(
          if (path.endsWith(".gz")) new GZIPInputStream(raw) else raw, "UTF-8"))
        val header = try Option(in.readLine()).getOrElse("") finally in.close()
        (path, header)
      }
      .toDF("_provenance", "header")
      .withColumn("format_ok", col("header") === lit(expected))
  }

  /**
   * P5-style routing on the verdict: returns (validRows, invalidRows) —
   * rows of files failing ANY check are withheld whole (the reference
   * stops the entire file, not the offending row).
   */
  def route(df: DataFrame, verdicts: DataFrame): (DataFrame, DataFrame) = {
    val v = verdicts.select(col("_provenance"), col("valid"))
    val tagged = df.join(v, Seq("_provenance"), "left")
    (tagged.filter(coalesce(col("valid"), lit(false))).drop("valid"),
      tagged.filter(!coalesce(col("valid"), lit(false))).drop("valid"))
  }
}
