package graft.pipelines

import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The keep_na SECOND pass (SURVEY Q7 refresh arm,
 * scripts/Keep_na/KEEP_NA_ROSTER_SECOND_IN_PROGRESS.Rmd:360-560): the
 * running file of records that could not be matched at intake is
 * periodically re-joined against fresh WDRS / GISAID / CDC snapshots —
 * matched records graduate to the roster, the rest stay pending.
 *
 * Join shapes: keep_na is the small side (thousands of stuck records);
 * WDRS/GISAID/CDC are reference-data-scale, so every refresh join keys
 * the pending batch against them and Spark broadcasts the batch — the
 * snapshots are scanned once, never shuffled.
 */
object KeepNaRefresh {

  /**
   * Record normalization before matching (Rmd:375-404): CDC-lab blank
   * reason → SENTINEL SURVEILLANCE, lab canonicalization by detection,
   * multi-format collection-date parse (mdy / ymd / Excel serial), and
   * the GISAID_ID join key (USA… names carry the hCoV-19/ prefix).
   */
  def normalize(keepNa: DataFrame, cdcLabs: Seq[String]): DataFrame =
    keepNa
      .withColumn("SEQUENCE_REASON",
        when(col("SEQUENCE_REASON").isNull &&
          col("SEQUENCE_LAB").isin(cdcLabs: _*), lit("SENTINEL SURVEILLANCE"))
          .otherwise(upper(col("SEQUENCE_REASON"))))
      .withColumn("SEQUENCE_LAB",
        when(upper(col("SEQUENCE_LAB")).contains("AEGIS"), "Aegis")
          .when(upper(col("SEQUENCE_LAB")).contains("OREGON"), "OHSU")
          .when(upper(col("SEQUENCE_LAB")).contains("SCAN/BEDFORD"), "NW Genomics")
          .otherwise(col("SEQUENCE_LAB")))
      .withColumn("SEQUENCE_SPECIMEN_COLLECTION_DATE",
        usFormat(parseAnyDate(col("SEQUENCE_SPECIMEN_COLLECTION_DATE"))))
      .withColumn("GISAID_ID",
        when(upper(col("SEQUENCE_ACCESSION")).startsWith("USA"),
          concat(lit("hCoV-19/"), col("SEQUENCE_ACCESSION")))
          .otherwise(col("SEQUENCE_ACCESSION")))

  /**
   * CASE_ID refresh (Rmd:425-447): join on SEQUENCE_CLINICAL_ACCESSION
   * (null keys never match — Spark equi-join semantics ARE
   * na_matches="never"), and adopt the WDRS case id only when the record
   * has none, a match exists, and the collection dates agree within 14
   * days. `dateOk` null-safe: an uncomputable distance blocks adoption.
   */
  def refreshCaseId(keepNa: DataFrame, wdrsEnt: DataFrame): DataFrame = {
    // WDRS-entire is specimen-level and can carry one clinical accession
    // on several rows (different specimens / case ids); joining it raw
    // would fan a single stuck record into several output rows that
    // graduate independently. One deterministic row per accession:
    // earliest collection date, then min case id.
    val wRank = Window.partitionBy(col("SEQUENCE_CLINICAL_ACCESSION"))
      .orderBy(col("COLLECTION_DATE_WDRS").asc_nulls_last, col("CASE_ID_SCA"))
    val w = wdrsEnt.select(
      col("SEQUENCE_CLINICAL_ACCESSION"),
      col("CASE_ID").as("CASE_ID_SCA"),
      col("COLLECTION_DATE").as("COLLECTION_DATE_WDRS"))
      .filter(col("SEQUENCE_CLINICAL_ACCESSION").isNotNull)
      .withColumn("__rn", row_number().over(wRank))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val dateOk = coalesce(
      withinDays(parseAnyDate(col("SEQUENCE_SPECIMEN_COLLECTION_DATE")),
        col("COLLECTION_DATE_WDRS"), 14), lit(false))
    keepNa
      .join(w, Seq("SEQUENCE_CLINICAL_ACCESSION"), "left")
      .withColumn("CASE_ID",
        when(col("CASE_ID").isNull && col("CASE_ID_SCA").isNotNull && dateOk,
          col("CASE_ID_SCA")).otherwise(col("CASE_ID")))
      .drop("CASE_ID_SCA", "COLLECTION_DATE_WDRS")
  }

  /**
   * Lineage / status / date refresh from the repository snapshots
   * (Rmd:453-545): lineage precedence is CDC-PANGO for CDC labs, GISAID
   * Lineage for the rest, each falling back to the other, "None" treated
   * as absent; the winner must be in the controlled lineage vocabulary.
   * A found lineage upgrades a null SEQUENCE_STATUS to COMPLETE; a null
   * collection date fills from the matching snapshot with the same
   * lab-directed precedence.
   */
  def refreshLineage(df: DataFrame, gisaidMeta: DataFrame,
      cdcCumulative: DataFrame, lineages: DataFrame,
      cdcLabs: Seq[String]): DataFrame = {
    val g = gisaidMeta.select(
      col("virus_name").as("__g_vn"), col("lineage").as("__g_lineage"),
      col("collection_date").as("COLLECTION_DATE_GISAID"))
    val c = cdcCumulative.select(
      col("gisaid_name").as("__c_vn"), col("pango_lineage").as("__c_lineage"),
      col("collection_date").as("COLLECTION_DATE_CDC"))
    val isCdcLab = col("SEQUENCE_LAB").isin(cdcLabs: _*)
    val cdcLin = when(col("__c_lineage") =!= "None", col("__c_lineage"))
    val gLin = when(col("__g_lineage") =!= "None", col("__g_lineage"))
    val chosen = when(isCdcLab, coalesce(cdcLin, gLin))
      .otherwise(coalesce(gLin, cdcLin))
    val lin = broadcast(lineages.select(col("lineage").as("__valid_lin")))
    df
      .join(g, col("GISAID_ID") === col("__g_vn"), "left")
      .join(c, col("GISAID_ID") === col("__c_vn"), "left")
      .withColumn("__chosen", chosen)
      // vocabulary gate (F10 shape): invalid lineage -> null, not a guess
      .join(lin, col("__chosen") === col("__valid_lin"), "left")
      // DELIBERATE overwrite, not a coalesce: the reference's case_when
      // ends `TRUE ~ NA_character_` (Rmd:487-503) — the repositories are
      // authoritative for lineage ("should be populated using the variant
      // in the GISAID or CDC files OVER what is already in" the column),
      // so a record with no fresh repo match loses its stale value.
      // Asymmetric with status/date on purpose: those two only fill gaps.
      .withColumn("SEQUENCE_VARIANT_OPEN_TEXT", col("__valid_lin"))
      .withColumn("SEQUENCE_STATUS",
        when(col("SEQUENCE_STATUS").isNull &&
          col("SEQUENCE_VARIANT_OPEN_TEXT").isNotNull, lit("COMPLETE"))
          .otherwise(col("SEQUENCE_STATUS")))
      .withColumn("SEQUENCE_SPECIMEN_COLLECTION_DATE",
        coalesce(col("SEQUENCE_SPECIMEN_COLLECTION_DATE"),
          when(isCdcLab, usFormat(parseAnyDate(col("COLLECTION_DATE_CDC"))))
            .otherwise(usFormat(parseAnyDate(col("COLLECTION_DATE_GISAID")))),
          usFormat(parseAnyDate(col("COLLECTION_DATE_CDC"))),
          usFormat(parseAnyDate(col("COLLECTION_DATE_GISAID")))))
      .drop("__g_vn", "__g_lineage", "__c_vn", "__c_lineage",
        "__chosen", "__valid_lin")
  }

  /** Graduation split (Rmd overall flow): matched records roster out,
    * the rest stay in the keep_na file for the next refresh. */
  def split(df: DataFrame): (DataFrame, DataFrame) =
    (df.filter(col("CASE_ID").isNotNull),
      df.filter(col("CASE_ID").isNull))

  /**
   * Expiry NOTES annotation (Rmd:699-765): records aging out of the
   * 60-day window are archived WITH the reasons they could not roster —
   * `condition_1..3` united " / "-separated, na.rm:
   *
   *  - condition_1: SEQUENCE_CLINICAL_ACCESSION missing, or absent from
   *    EITHER of WDRS-entire's two accession columns → "SCA missing" /
   *    "SCA not in WDRS";
   *  - condition_2: SEQUENCE_ACCESSION missing → "SA missing"; else the
   *    hCoV-19/-prefixed name is checked against GISAID virus names for
   *    non-CDC labs ("SA not in GISAID") and against the CDC cumulative
   *    GISAID names for CDC labs ("SA not in CDC cumulative");
   *  - condition_3: CASE_ID missing → "CASE_ID missing".
   *
   * Scale shape: the expired set is small (thousands of stuck records);
   * each membership is a left join against the snapshot's DISTINCT key
   * projection, so the reference-scale snapshots are scanned once for a
   * one-column distinct and the small side broadcasts. Works on batch
   * frames and as per-micro-batch stream-static joins (stateless, so
   * append-mode legal) — [[graft.streaming.Streams.keepNaExpiryNotes]]
   * is the streaming wrapper.
   */
  def annotateExpiry(expired: DataFrame, wdrsEnt: DataFrame,
      gisaidMeta: DataFrame, cdcCumulative: DataFrame,
      cdcLabs: Seq[String]): DataFrame = {
    def keys(df: DataFrame, c: String, as: String): DataFrame =
      df.select(col(c).as(as)).filter(col(as).isNotNull).distinct()
    val wSca = keys(wdrsEnt, "SEQUENCE_CLINICAL_ACCESSION", "__w_sca")
    val wSpec = keys(wdrsEnt, "SPECIMEN__ID__ACCESSION__NUM__MANUAL", "__w_spec")
    val gName = keys(gisaidMeta, "virus_name", "__g_vn")
    val cName = keys(cdcCumulative, "gisaid_name", "__c_vn")
    val hcov = concat(lit("hCoV-19/"), col("SEQUENCE_ACCESSION"))
    // R's `NA %in% cdc_labs` is FALSE, so a NULL lab takes the non-CDC
    // arm; Spark's isin on null is NULL and would skip BOTH when-arms,
    // silently dropping condition_2 — coalesce to false to match R.
    val isCdc = coalesce(col("SEQUENCE_LAB").isin(cdcLabs: _*), lit(false))
    expired
      .join(wSca, col("SEQUENCE_CLINICAL_ACCESSION") === col("__w_sca"), "left")
      .join(wSpec, col("SEQUENCE_CLINICAL_ACCESSION") === col("__w_spec"), "left")
      .join(gName, hcov === col("__g_vn"), "left")
      .join(cName, hcov === col("__c_vn"), "left")
      .withColumn("__c1",
        when(col("SEQUENCE_CLINICAL_ACCESSION").isNull, "SCA missing")
          // reference: !(SCA %in% wdrs$SCA) | !(SCA %in% wdrs$SPECIMEN...)
          // — present in BOTH columns clears the note
          .when(col("__w_sca").isNull || col("__w_spec").isNull,
            "SCA not in WDRS"))
      .withColumn("__c2",
        when(col("SEQUENCE_ACCESSION").isNull, "SA missing")
          .when(!isCdc && col("__g_vn").isNull, "SA not in GISAID")
          .when(isCdc && col("__c_vn").isNull, "SA not in CDC cumulative"))
      .withColumn("__c3", when(col("CASE_ID").isNull, "CASE_ID missing"))
      // unite(..., sep=" / ", na.rm=TRUE): concat_ws skips nulls
      .withColumn("NOTES",
        concat_ws(" / ", col("__c1"), col("__c2"), col("__c3")))
      .drop("__w_sca", "__w_spec", "__g_vn", "__c_vn",
        "__c1", "__c2", "__c3")
  }
}
