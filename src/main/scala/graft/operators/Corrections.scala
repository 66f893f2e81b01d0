package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Data-driven ID corrections (SURVEY §7.4#6). The reference hardcodes
 * ~50 GISAID_ID fixes into a case_when over the cumulative feed
 * (scripts/Auto_seq/read_all_data.Rmd:266-321) — partial Helix ids
 * completed to their full GISAID form, Excel-mangled ids restored,
 * known-bad ids scrubbed to NA — followed by a removal-list filter.
 * Re-expressed as broadcast mapping TABLES: the fixes become data (a
 * 2-column corrections table, a 1-column removal list) instead of code,
 * so the next hand-curated fix ships as a fixture row, not a deploy.
 */
object Corrections {

  /**
   * Apply a correction mapping to `idCol`, then drop rows on the removal
   * list — the reference's order (correct first, filter the corrected
   * value).
   *
   * Semantics mirror the case_when exactly:
   *  - a row whose id matches a correction key takes the target value
   *    EVEN WHEN the target is null (the scrub arm `~ NA_character_`);
   *  - an unmatched row keeps its value (the `TRUE ~ GISAID_ID` arm);
   *  - null ids never match a correction or a removal (R's `%in%` keeps
   *    NA rows through the `!... %in%` filter).
   *
   * Conservation: the correction table is key-deduplicated before the
   * join (duplicate keys resolve to the minimum non-null target, else
   * null — deterministic), so the broadcast left join can never change
   * the row count; only the removal filter drops rows. Both lookup
   * tables are re-aliased in place: fresh attribute ids keep a fixture
   * that shares lineage with `df` from tripping self-join ambiguity.
   *
   * Scale shape: corrections are hand-curated (dozens of rows) — a
   * broadcast hash join against the feed, no shuffle of the corpus.
   */
  def applyIdCorrections(df: DataFrame, corrections: DataFrame, idCol: String,
      removals: Option[DataFrame] = None): DataFrame = {
    val Seq(fromCol, toCol) = corrections.columns.take(2).toSeq
    val corr = broadcast(
      corrections
        .select(col(fromCol).as("__from"), col(toCol).as("__to"))
        .filter(col("__from").isNotNull)
        .groupBy("__from")
        .agg(min(col("__to")).as("__to"))
        .withColumn("__hit", lit(true)))
    val corrected = df
      .join(corr, df(idCol) === col("__from"), "left")
      .withColumn(idCol, when(col("__hit"), col("__to")).otherwise(df(idCol)))
      .drop("__from", "__to", "__hit")
    removals match {
      case Some(rem) =>
        val r = broadcast(rem
          .select(col(rem.columns.head).as("__rm"))
          .filter(col("__rm").isNotNull)
          .distinct())
        corrected.join(r, corrected(idCol) === col("__rm"), "left_anti")
      case None => corrected
    }
  }
}
