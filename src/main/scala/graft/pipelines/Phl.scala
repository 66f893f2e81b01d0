package graft.pipelines

import graft.functions.GraftFunctions._
import graft.operators.Joins
import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/**
 * The PHL (internal-lab) run (SURVEY §3.2, docs/notebooks/phl.Rmd):
 * status normalization, PT-drop, already-in-WDRS removal, multi-source
 * enrichment joins with name/DOB coalesce (J3), fallback match on the
 * alternate accession (J4), reason translation from a mapping table (F11),
 * the None→Unassigned→LOW QUALITY cascade, and cumulative-feed dedup
 * against the processed-record list.
 *
 * All reference tables (reason map, processed list) ride as broadcast
 * joins; the match joins are plain equi-joins Catalyst sizes itself.
 */
object Phl {

  /** Status normalization + pre-filters (phl.Rmd:515-541): COMPLETED
    * variants → COMPLETE, drop proficiency-test rows, keep only
    * COMPLETE/FAILED. */
  def preFilter(dashboard: DataFrame): DataFrame =
    dashboard
      .withColumn("status",
        when(upper(col("status")).rlike("^COMPLETE"), "COMPLETE")
          .otherwise(upper(col("status"))))
      .filter(col("reason").isNull || col("reason") =!= "PT")
      .filter(col("status").isin("COMPLETE", "FAILED"))

  /** J3 enrichment: REDCap reason override, Surveillance/Epi name+DOB
    * coalesce (phl.Rmd:552-592). Join key: specimen_id. */
  def enrich(phl: DataFrame, redcap: DataFrame, epi: DataFrame): DataFrame = {
    val rc = redcap.select(col("specimen_id").as("__rc_sid"),
      col("project").as("__rc_project"))
    val ep = epi.select(col("specimen_id").as("__ep_sid"),
      col("first_name").as("__ep_first"), col("last_name").as("__ep_last"),
      col("dob").as("__ep_dob"))
    phl
      .join(broadcast(rc), col("specimen_id") === col("__rc_sid"), "left")
      .join(broadcast(ep), col("specimen_id") === col("__ep_sid"), "left")
      .withColumn("reason",
        when(col("__rc_project").isNotNull, "SENTINEL SURVEILLANCE")
          .otherwise(col("reason")))
      .withColumn("first_name", coalesce(col("first_name"), col("__ep_first")))
      .withColumn("last_name", coalesce(col("last_name"), col("__ep_last")))
      .withColumn("dob", coalesce(col("dob"), col("__ep_dob")))
      .drop("__rc_sid", "__rc_project", "__ep_sid", "__ep_first", "__ep_last", "__ep_dob")
  }

  /** J4: match on specimen_id, misses retried on accession_id
    * (phl.Rmd:599-646). `wdrs` must expose (case_id, wdrs_key). */
  def matchWithFallback(enriched: DataFrame, wdrs: DataFrame): DataFrame =
    Joins.fallbackJoin(enriched, wdrs,
      ("specimen_id", "wdrs_key"), ("accession_id", "wdrs_key"))

  /** F11 positional reason map (phl.Rmd:700-705) as a broadcast lookup. */
  def translateReason(df: DataFrame, mapping: DataFrame): DataFrame = {
    val m = mapping.select(col("input").as("__in"), col("output").as("__out"))
    df.join(broadcast(m), col("reason") === col("__in"), "left")
      .withColumn("reason", coalesce(col("__out"), col("reason")))
      .drop("__in", "__out")
  }

  /**
   * Lineage cascade (phl.Rmd:713-723): lineage "None" → Unassigned (a
   * NULL lineage stays NULL — R's `if_else(Lineage == "None", ...)`
   * passes NA through, so no LOW QUALITY cascade for missing lineage);
   * Unassigned → LOW QUALITY status; repository NULL only when FAILED,
   * else "GISAID" — including LOW QUALITY rows, exactly as
   * phl.Rmd:719-723's case_when does.
   */
  def lineageCascade(df: DataFrame): DataFrame =
    df
      .withColumn("lineage",
        when(col("lineage") === "None", "Unassigned").otherwise(col("lineage")))
      .withColumn("status",
        when(col("lineage") === "Unassigned" && col("status") === "COMPLETE",
          "LOW QUALITY").otherwise(col("status")))
      .withColumn("repository",
        when(col("status") === "FAILED", lit(null).cast("string"))
          .otherwise(lit("GISAID")))

  /** Incremental dedup vs the processed-record list (phl.Rmd:776-796):
    * the dashboard is CUMULATIVE — anti-join keeps only new specimens. */
  def dropProcessed(df: DataFrame, processed: DataFrame): DataFrame =
    df.join(processed.select(col("specimen_id")), Seq("specimen_id"), "left_anti")

  /** The composed run. */
  def run(dashboard: DataFrame, redcap: DataFrame, epi: DataFrame,
      wdrs: DataFrame, reasonMap: DataFrame, processed: DataFrame): DataFrame = {
    val staged = dropProcessed(preFilter(dashboard), processed)
    val matched = matchWithFallback(enrich(staged, redcap, epi), wdrs)
    lineageCascade(translateReason(matched, reasonMap))
  }
}
