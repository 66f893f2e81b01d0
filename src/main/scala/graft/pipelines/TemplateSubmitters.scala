package graft.pipelines

import graft.functions.GraftFunctions._
import graft.model.Schemas
import graft.operators.Routing
import graft.qa.QaRules
import graft.qa.QaRules.Rule
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The reference's flagship run, end-to-end (SURVEY §3.1, docs/notebooks/
 * template_submitters.Rmd): normalize all-string template submissions,
 * left-join WDRS ENTIRE on accession (J1) with J2 dedup, QA-flag (Q1),
 * route every row to exactly one disposition (P5), and build the
 * 17-column positional roster.
 *
 * `runDate` is injected (SURVEY §7.4#5 — the reference bakes today() into
 * note text and keep_na stamps; a parameter keeps runs reproducible).
 *
 * Scale shape: ENTIRE is the fact side; submissions are the small side of
 * the J1 join in the reference (files/week), but at 100 TB both sides may
 * be large — the join is a plain equi-join on accession, so Catalyst
 * picks broadcast vs sort-merge by stats/AQE. No driver-side collections.
 */
object TemplateSubmitters {

  /** Step 5 — normalize: typed dates from the 3 wire formats + per-row
    * GISAID_ID cleanup (template_submitters.Rmd:619-652). */
  def normalize(submissions: DataFrame): DataFrame =
    submissions
      .withColumn("collection_date", parseAnyDate(col("SPECIMEN_COLLECTION_DATE")))
      .withColumn("dob", parseAnyDate(col("DOB")))
      .withColumn("gisaid_id", stripGisaidPrefix(blankAsNull(col("GISAID_ID"))))
      .withColumn("accession", blankAsNull(col("LAB_ACCESSION_ID")))

  /** Step 6 — match (J1): left join on accession, na_matches="never"
    * (=== is already null-false), then J2 dedup of 1-to-many CASE_ID fans:
    * deterministic keep-first by CASE_ID (template_submitters.Rmd:659-670,
    * SURVEY §7.4#2). */
  def matchToEntire(normalized: DataFrame, entire: DataFrame): DataFrame = {
    val ent = entire.select(
      col("CASE_ID"), col("FILLER__ORDER__NUM"),
      col("SPECIMEN__COLLECTION__DTTM").as("wdrs_collection"))
    val joined = normalized.join(ent,
      normalized("accession") === ent("FILLER__ORDER__NUM"), "left")
    val w = Window
      .partitionBy(col("accession"), col("_provenance"), col("_row_id"))
      .orderBy(col("CASE_ID").asc_nulls_last)
    joined
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "FILLER__ORDER__NUM")
  }

  /** Step 9 — Q1 battery in batch mode (quality_filters.R:55-202). */
  def qaRules(): Seq[Rule] = Seq(
    Rule("QA_CASE_ID", QaRules.required(col("CASE_ID").cast("string"))),
    Rule("QA_SEQ_STAT",
      QaRules.notInVocab(upper(col("SEQUENCE_STATUS")), Schemas.sequenceStatuses)),
    Rule("QA_SEQ_REASON",
      QaRules.notInVocab(upper(col("SEQUENCE_REASON")), Schemas.sequenceReasons)),
    Rule("QA_SCA_INT_DUPE",
      col("accession").isNotNull && QaRules.dupWithinBatch(col("accession"))),
    Rule("QA_COLLECT_DATE",
      QaRules.outsideDateWindow(
        col("collection_date"), col("wdrs_collection").cast("date"), 14)))

  /** Steps 7-9 — disposition (P5, template_submitters.Rmd:687-704,836-917):
    * matched & clean → roster; unmatched with demographics → fuzzy;
    * unmatched without → keep_na; matched but QA-flagged → for_review. */
  def disposition(): Seq[(String, Column)] = Seq(
    "fuzzy" -> (col("CASE_ID").isNull &&
      col("FIRST_NAME").isNotNull && col("LAST_NAME").isNotNull &&
      col("dob").isNotNull),
    "keep_na" -> col("CASE_ID").isNull,
    "for_review" -> (col("qa_sum") > 0),
    "roster" -> lit(true))

  /** Step 7 — the 17-column positional roster build
    * (template_submitters.Rmd:794-810, ROSTER_COMPILE.Rmd:183-201). */
  def toRoster(df: DataFrame, runDate: Column): DataFrame =
    df.select(
      col("CASE_ID").cast("string").as("CASE_ID"),
      lit(null).cast("string").as("SEQUENCE_SGTF"),
      lit("YES").as("SEQUENCE_SPECIMEN"),
      lit(null).cast("string").as("SEQUENCE_DATE"),
      initcap(lower(col("SEQUENCE_REASON"))).as("SEQUENCE_REASON"),
      col("SUBMITTING_LAB").as("SEQUENCE_LAB"),
      upper(col("SEQUENCE_STATUS")).as("SEQUENCE_STATUS"),
      when(upper(col("SEQUENCE_STATUS")) === "COMPLETE", lit("GISAID"))
        .otherwise(lit(null).cast("string")).as("SEQUENCE_REPOSITORY"),
      col("gisaid_id").as("SEQUENCE_ACCESSION"),
      lit(null).cast("string").as("SEQUENCE_EPI_ISL"),
      when(upper(col("SEQUENCE_STATUS")) === "COMPLETE", col("PANGO_LINEAGE"))
        .otherwise(lit(null).cast("string")).as("SEQUENCE_VARIANT_OPEN_TEXT"),
      col("accession").as("SEQUENCE_CLINICAL_ACCESSION"),
      usFormat(col("collection_date")).as("SEQUENCE_SPECIMEN_COLLECTION_DATE"),
      usFormat(runDate).as("SEQUENCE_ROSTER_PREPARE_DATE"),
      when(upper(col("SEQUENCE_STATUS")) === "COMPLETE" && col("PANGO_LINEAGE").isNotNull,
        lineageNote(col("PANGO_LINEAGE"), runDate))
        .otherwise(lit(null).cast("string")).as("SEQUENCE_NOTES"),
      lit(null).cast("string").as("SEQUENCE_REVIEWED"),
      lit("External data question package updated by COVID19 Sequencing Roster.")
        .as("Case.Note"))

  /**
   * The whole happy path in one pass: returns the routed frame (every
   * input row, one `disposition` each) — callers then project the roster
   * subset with [[toRoster]] and write each disposition to its sink.
   * `_row_id` keeps the J2 dedup deterministic per input row.
   */
  def run(submissions: DataFrame, entire: DataFrame): DataFrame = {
    val withId = submissions.withColumn("_row_id",
      row_number().over(Window.partitionBy(col("_provenance"))
        .orderBy(col("LAB_ACCESSION_ID"), col("GISAID_ID"))))
    val matched = matchToEntire(normalize(withId), entire)
    val flagged = QaRules.applyBattery(matched, qaRules(), "qa_sum")
    Routing.route(flagged, disposition(), "roster")
  }
}
