package graft.pipelines

import graft.functions.GraftFunctions._
import graft.model.Schemas
import graft.operators.Joins
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * SGTF / S-dropout pipeline compositions (SURVEY §3,
 * scripts/Roster_scripts/S_Dropout_Records.Rmd and
 * scripts/Roster_scripts/SGTF_template_matching.Rmd): mark WDRS cases
 * whose specimens showed S-gene target failure, from three evidence
 * sources — a REDCap project (demographic match), sentinel surveillance
 * (accession match), and submitter templates (fuzzy-name second pass).
 *
 * Matching runs source→WDRS, never the reverse, so every join keys on
 * the (small) incoming batch against the (large) WDRS snapshot — at
 * scale the batch side broadcasts and the snapshot is never shuffled.
 */
object Sgtf {

  /**
   * Wide Target/Ct slot pairs -> named gene Ct columns
   * (S_Dropout_Records.Rmd:254-264): instruments report up to `slots`
   * (target-name, Ct-value) column pairs in arbitrary slot order; each
   * gene's Ct is taken from the FIRST slot whose annihilated target name
   * matches that gene — including a matching slot whose Ct is null (R's
   * case_when stops at the first true arm), which is why this is a
   * when-chain and not a coalesce. The reference's SGENE arm tests
   * `Target1` in slots 2-4 (a copy-paste slip, S_Dropout_Records.Rmd:
   * 263-265); this port tests each slot's own target, documented here
   * rather than transliterated.
   */
  def geneCtColumns(df: DataFrame, slots: Int = 4): DataFrame = {
    def pick(pred: Column => Column): Column =
      (1 to slots).foldRight(lit(null).cast("double")) { (i, els) =>
        when(pred(annihilate(col(s"Target$i"))), col(s"Ct$i")).otherwise(els)
      }
    df.withColumn("NGENE", pick(t => t.contains("NGENE") || t === "N"))
      .withColumn("ORF1ab", pick(t => t.contains("ORF")))
      .withColumn("SGENE", pick(t => t.contains("SGENE") || t === "S"))
  }

  /**
   * High-watermark recency gate (S_Dropout_Records.Rmd:296-297,373-375):
   * only records uploaded after the previous run participate; everything
   * older was handled by an earlier run. Partition-prunable when the
   * source is date-partitioned.
   */
  def recentOnly(df: DataFrame, uploadTs: Column, lastRun: Column): DataFrame =
    df.filter(uploadTs > lastRun)

  /** REDCap prep (S_Dropout_Records.Rmd:280-294): canonical match key
    * NAME = annihilate(first)_annihilate(last), DOB as date. */
  def prepRedcap(redcap: DataFrame): DataFrame =
    redcap
      .withColumn("NAME_REDCAP",
        uniteName(annihilate(col("FirstName")), annihilate(col("LastName"))))
      .withColumn("DOB_REDCAP", to_date(col("BirthDate")))

  /**
   * Deterministic twin of the reference's `!duplicated(df[, keys])`
   * (S_Dropout_Records.Rmd:309,388): keep one row per key group, chosen
   * by the tie-break order instead of input order (SURVEY §7.4#2 — R's
   * row-order dedup made reproducible).
   */
  private def dedupByKeys(df: DataFrame, keys: Seq[String],
      tieBreak: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(tieBreak: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Keep rows whose `accCol` value maps to exactly ONE WDRS record —
    * ambiguous accessions go to review, not the roster
    * (S_Dropout_Records.Rmd:325,402 duplicated|fromLast idiom). */
  private def uniqueByAccession(df: DataFrame, accCol: String): DataFrame = {
    val w = Window.partitionBy(col(accCol))
    df.withColumn("__n", count(lit(1)).over(w))
      .filter(col("__n") === 1)
      .drop("__n")
  }

  /**
   * REDCap→WDRS match (S_Dropout_Records.Rmd:303-325): exact join on
   * (name, DOB), dedup per (CASE_ID, AccessionNumber), collection dates
   * within 14 days, Ct thresholds NGENE < 30 and ORF1ab < 30, and the
   * accession must match exactly one WDRS record.
   */
  def redcapWdrsMatch(redcapRecent: DataFrame, wdrs: DataFrame): DataFrame = {
    val joined = redcapRecent.join(wdrs,
      col("NAME_REDCAP") === col("NAME_WDRS") &&
        col("DOB_REDCAP") === col("DOB_WDRS"))
    // SpecimenId breaks date ties — without it two WDRS rows sharing the
    // collection date would make the survivor run-dependent
    val deduped = dedupByKeys(joined, Seq("CASE_ID", "AccessionNumber"),
      Seq(col("COLLECTION_DATE_WDRS").asc_nulls_last, col("SpecimenId")))
    val gated = deduped
      .filter(withinDays(to_date(col("CollectionDate")),
        col("COLLECTION_DATE_WDRS"), 14))
      .filter(col("NGENE") < 30 && col("ORF1ab") < 30)
    uniqueByAccession(gated, "AccessionNumber")
  }

  /**
   * Sentinel-surveillance S-dropout filter (S_Dropout_Records.Rmd:
   * 362-365): reason says S-DROPOUT, no S-gene signal, confident N/ORF1ab
   * detection.
   */
  def surveillanceSDropouts(surveillance: DataFrame): DataFrame =
    surveillance.filter(
      upper(col("Reason")) === "S-DROPOUT" &&
        (col("SGene").isNull || col("SGene").isin("0", "", "-")) &&
        col("NGene") < 30 && col("ORF1ab") < 30)

  /**
   * Surveillance→WDRS match (S_Dropout_Records.Rmd:383-402): accession id
   * keys straight to the WDRS specimen id, then the same dedup / 14-day /
   * unique-accession gates as the REDCap arm (no Ct re-check — the
   * surveillance filter already applied it).
   */
  def surveillanceWdrsMatch(survRecent: DataFrame, wdrs: DataFrame): DataFrame = {
    val joined = survRecent.join(wdrs,
      col("AccessionId") === col("SpecimenId"))
    val deduped = dedupByKeys(joined, Seq("CASE_ID", "AccessionId"),
      Seq(col("COLLECTION_DATE_WDRS").asc_nulls_last, col("NAME_WDRS")))
    val gated = deduped.filter(
      withinDays(to_date(col("CollectionDate")), col("COLLECTION_DATE_WDRS"), 14))
    uniqueByAccession(gated, "AccessionId")
  }

  /** Rows of the incoming batch that did NOT perfectly match — routed to
    * the manual-review file (S_Dropout_Records.Rmd:328,405). */
  def unmatchedForReview(source: DataFrame, matches: DataFrame,
      accCol: String): DataFrame =
    source.join(matches.select(col(accCol)), Seq(accCol), "left_anti")

  /**
   * Roster assembly (S_Dropout_Records.Rmd:435-465): CASE_ID +
   * SEQUENCE_SGTF = "Yes"; every other contract column empty — the SGTF
   * roster only flips the flag, it never asserts sequencing facts.
   */
  def sgtfRoster(matched: DataFrame): DataFrame = {
    val flagged = matched.select(col("CASE_ID").cast("string").as("CASE_ID"))
      .withColumn("SEQUENCE_SGTF", lit("Yes"))
    val empties = Schemas.rosterColumns
      .filterNot(c => c == "CASE_ID" || c == "SEQUENCE_SGTF")
    empties.foldLeft(flagged)((d, c) =>
      d.withColumn(c, lit(null).cast("string")))
      .select(Schemas.rosterCols: _*)
  }

  // ------------------------------------------------ template second pass

  /**
   * Drop matches whose case already carries SGTF = Yes in the FLATTENED
   * snapshot (SGTF_template_matching.Rmd:439-443) — re-rostering a flag
   * that is already set would churn WDRS for nothing.
   */
  def withoutCurrentSgtf(dobMatch: DataFrame, flattened: DataFrame): DataFrame =
    dobMatch.join(
      flattened.filter(col("SEQUENCE_SGTF") === "Yes").select(col("CASE_ID")),
      Seq("CASE_ID"), "left_anti")

  /**
   * Closest-collection-date second pass + perfect-match split
   * (SGTF_template_matching.Rmd:448-483): per submitter row keep the
   * candidate(s) at minimum date distance (all-null groups survive), then
   * perfect = name distance <= 1 AND date distance <= 14 AND computable,
   * deduped per (LAB_ACCESSION_ID, CASE_ID); accessions matching several
   * cases go to review instead.
   *
   * @return (roster-ready matches, ambiguous matches for review)
   */
  def secondPass(dobMatch: DataFrame): (DataFrame, DataFrame) = {
    val withDist = dobMatch.withColumn("COLLECTION_DATE_DISTANCE",
      abs(datediff(to_date(col("SPECIMEN_COLLECTION_DATE")),
        col("COLLECTION_DATE_WDRS"))))
    val closest = Joins.closestDateMatchKeepNull(
      withDist, "rowid", "COLLECTION_DATE_DISTANCE")
    val perfect = closest.filter(
      col("distance") <= 1 &&
        col("COLLECTION_DATE_DISTANCE") <= 14 &&
        col("COLLECTION_DATE_DISTANCE").isNotNull)
    val deduped = dedupByKeys(perfect, Seq("LAB_ACCESSION_ID", "CASE_ID"),
      Seq(col("COLLECTION_DATE_DISTANCE"), col("distance"), col("rowid")))
    val w = Window.partitionBy(col("LAB_ACCESSION_ID"))
    val counted = deduped.withColumn("__n", count(lit(1)).over(w))
    (counted.filter(col("__n") === 1).drop("__n"),
      counted.filter(col("__n") > 1).drop("__n"))
  }
}
