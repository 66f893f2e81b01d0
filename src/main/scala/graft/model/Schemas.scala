package graft.model

import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * Fixed target schemas of the reference's data model (SURVEY §1.2-§1.3).
 * Ingestion is deliberately all-string (the reference reads every CSV/XLSX
 * with `col_types = cols(.default = "c")`, docs/notebooks/
 * template_submitters.Rmd:236-238) to defeat type-inference drift; typing
 * happens in an explicit normalize stage.
 */
object Schemas {

  /** The 12-column template submission, order-significant
    * (docs/notebooks/template_submitters.Rmd:337-350, docs/index.qmd:306-321). */
  val templateColumns: Seq[String] = Seq(
    "LAB_ACCESSION_ID", "GISAID_ID", "SPECIMEN_COLLECTION_DATE",
    "SUBMITTING_LAB", "SEQUENCE_REASON", "SEQUENCE_STATUS", "PANGO_LINEAGE",
    "FIRST_NAME", "LAST_NAME", "MIDDLE_NAME", "DOB", "ALTERNATIVE_ID")

  val templateSchema: StructType =
    StructType(templateColumns.map(StructField(_, StringType, nullable = true)))

  /** The 17-column WDRS roster; column ORDER is load-bearing — the sink
    * uploads by position (docs/notebooks/ROSTER_COMPILE.Rmd:180-225,
    * "DO NOT CHANGE THESE!", ncol==17 gate at :385-390). */
  val rosterColumns: Seq[String] = Seq(
    "CASE_ID", "SEQUENCE_SGTF", "SEQUENCE_SPECIMEN", "SEQUENCE_DATE",
    "SEQUENCE_REASON", "SEQUENCE_LAB", "SEQUENCE_STATUS", "SEQUENCE_REPOSITORY",
    "SEQUENCE_ACCESSION", "SEQUENCE_EPI_ISL", "SEQUENCE_VARIANT_OPEN_TEXT",
    "SEQUENCE_CLINICAL_ACCESSION", "SEQUENCE_SPECIMEN_COLLECTION_DATE",
    "SEQUENCE_ROSTER_PREPARE_DATE", "SEQUENCE_NOTES", "SEQUENCE_REVIEWED",
    "Case.Note")

  /** Roster columns as Column refs — `Case.Note` needs backtick quoting or
    * the dot parses as struct access. */
  def rosterCols: Seq[org.apache.spark.sql.Column] =
    rosterColumns.map(c => org.apache.spark.sql.functions.col(s"`$c`"))

  /** WDRS ENTIRE snapshot projection used by the match step
    * (docs/notebooks/template_submitters.Rmd:145-151). */
  val entireColumns: Seq[String] = Seq(
    "CASE_ID", "FILLER__ORDER__NUM", "SPECIMEN__COLLECTION__DTTM",
    "PATIENT__FIRSTNAME", "PATIENT__LASTNAME", "PATIENT__DATE__OF__BIRTH")

  /** NA tokens treated as null on ingest
    * (docs/notebooks/ROSTER_COMPILE.Rmd:144-166). */
  val naTokens: Seq[String] = Seq("", "NA", "N/A", "None", "NONE")

  /** Controlled vocabularies (scripts/Roster_scripts/write_lab_variables.R). */
  val sequenceStatuses: Seq[String] =
    Seq("COMPLETE", "PENDING", "NOT DONE", "LOW QUALITY", "HIGH CT", "FAILED")
  val sequenceReasons: Seq[String] =
    Seq("SENTINEL SURVEILLANCE", "SUSPECTED REINFECTION",
      "SUSPECTED VACCINE BREAKTHROUGH", "OUTBREAK", "OTHER", "PT", "S-DROPOUT",
      "TRAVEL ASSOCIATED", "CLINICAL")
}
