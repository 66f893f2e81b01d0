package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Pure Column => Column scalar library, re-expressing the reference's string /
 * date / conditional helpers (SURVEY.md §2.7, F1-F14) as codegen-friendly
 * built-in compositions. Citations are file:line into /root/reference.
 */
object GraftFunctions {

  // ---------------------------------------------------------------- F1
  /**
   * Name normalization chain ("kill/destroy/smash/annihilate",
   * scripts/Roster_scripts/quality_filters.R:4-14): strip non-alphanumerics
   * (keeping spaces), trim, drop a trailing single-letter initial, remove all
   * spaces, uppercase. Trim MUST precede initial-stripping (SURVEY §7.4#3).
   */
  def annihilate(c: Column): Column =
    upper(
      regexp_replace(
        regexp_replace(
          trim(regexp_replace(c, "[^A-Za-z0-9 ]", "")),
          " [A-Za-z]$", ""),
        " ", ""))

  // ---------------------------------------------------------------- F2
  /** Unite name columns skipping nulls (docs/notebooks/fuzzy.Rmd:237-244). */
  def uniteName(first: Column, last: Column): Column = concat_ws("_", first, last)

  // ---------------------------------------------------------------- F3
  /** Date-shape detectors (scripts/Roster_scripts/quality_filters.R:23-24). */
  def looksIsoDate(c: Column): Column = c.rlike("^\\d{4}-\\d{1,2}-\\d{1,2}$")
  def looksUsDate(c: Column): Column = c.rlike("^\\d{1,2}/\\d{1,2}/\\d{4}$")
  def looksExcelSerial(c: Column): Column = c.rlike("^\\d{4,5}$")

  // ---------------------------------------------------------------- F4
  /**
   * Excel serial date: days since 1899-12-30
   * (scripts/Roster_scripts/quality_filters.R:26-27).
   */
  def excelDate(c: Column): Column =
    date_add(to_date(lit("1899-12-30")), c.cast("int"))

  // ---------------------------------------------------------------- F5
  /**
   * Multi-format date parse with Excel-serial branch first, then mdy, then ymd
   * (docs/notebooks/template_submitters.Rmd:621-627,
   * scripts/Auto_seq/read_all_data.Rmd:240-249). ANSI-safe via try_to_date.
   */
  def parseAnyDate(c: Column): Column =
    when(looksExcelSerial(c), excelDate(c))
      .otherwise(coalesce(
        try_to_date(c, "M/d/yyyy"),
        try_to_date(c, "yyyy-M-d"),
        try_to_date(c)))

  /** Canonical output format MM/dd/yyyy (template_submitters.Rmd:775). */
  def usFormat(d: Column): Column = date_format(d, "MM/dd/yyyy")

  // ---------------------------------------------------------------- F6
  /** |a-b| <= tol days (quality_filters.R:103-118, fuzzy.Rmd:845-859). */
  def withinDays(a: Column, b: Column, tol: Int): Column =
    abs(datediff(a, b)) <= tol

  // ---------------------------------------------------------------- F7
  /** Strip the GISAID hCoV-19/ prefix (template_submitters.Rmd:629-652). */
  def stripGisaidPrefix(c: Column): Column =
    regexp_replace(c, "^hCoV-19/", "")

  // ---------------------------------------------------------------- F12
  /** Templated lineage note; run date injected for determinism
    * (template_submitters.Rmd:777-786, SURVEY §7.4#5). */
  def lineageNote(lineage: Column, runDate: Column): Column =
    concat(lit("Lineage identified as "), lineage, lit(" on "),
      date_format(runDate, "M/d/yyyy"),
      lit(". Lineage assignments may change over time."))

  // ---------------------------------------------------------------- F13
  /** Blank-string → null normalization (docs/notebooks/elr.Rmd:523-524). */
  def blankAsNull(c: Column): Column = nullif(trim(c), lit(""))

  // -------------------------------------------------- numeric helpers
  /**
   * Exact money sum: sum in decimal (order-independent, no FP drift), emit
   * double. Keeps Spark and any external oracle bit-identical.
   */
  def exactSum(c: Column): Column =
    sum(c.cast(DecimalType(18, 2))).cast("double")

  /** Exact mean built from exact sum / count. Divides by count(c) —
    * null-skipping, matching SQL AVG — not count(*). */
  def exactAvg(c: Column): Column =
    (sum(c.cast(DecimalType(18, 2))).cast("double") / count(c))

  /** Row-wise horizontal sum of flag columns, nulls as 0 (A6,
    * quality_filters.R:188-192). */
  def rowSum(cols: Seq[Column]): Column =
    cols.map(c => coalesce(c.cast("int"), lit(0))).reduce(_ + _)
}
