package graft.pipelines

import graft.operators.Joins
import graft.sources.SnapshotStore
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * The daily snapshot-diff report job (SURVEY J7 as a composition;
 * reference scripts/QA/wdrs_daily_diffs.R:150-199): compare today's
 * published sequencing snapshot against the previous version, explain
 * expected churn with yesterday's compiled roster upload, and publish the
 * classified report — the reference's per-cause CSV attachments
 * (case_id_changes / compiled_roster / missing_new / seq_diff_all) and
 * its "no changes identified" arm, as one versioned table keyed by
 * `cause` + `diff_side`.
 *
 * All state flows through the [[SnapshotStore]]: the two snapshot
 * versions are the store's published version and its predecessor (the
 * reference's date-stamped R objects), the roster is the latest published
 * upload, and the report itself is published back so each day's emailed
 * artifact stays replayable. The classification itself is
 * [[Joins.snapshotDiffCauses]] — one snapshot-wide shuffle, churn-sized
 * everything after.
 */
object DailyDiffs {

  /** Per-(cause, side) counts — the reference's email-body summary. */
  def summarize(report: DataFrame): DataFrame =
    report.groupBy("cause", "diff_side").agg(count(lit(1)).as("n"))

  /**
   * Run the daily report from stored state and publish it.
   *
   * @param snapshotTable versioned snapshot table; needs >= 2 versions
   * @param rosterTable   yesterday's compiled-roster upload (optional —
   *                      absent table means no roster arm, like a day
   *                      with no roster run)
   * @return the published report, read back from its own version dir
   */
  def run(store: SnapshotStore, snapshotTable: String, idCol: String,
      lineageCols: Seq[String], rosterTable: String = "compiled_roster",
      reportTable: String = "daily_diffs_report"): DataFrame = {
    val cur = store.currentVersion(snapshotTable).getOrElse(
      throw new IllegalStateException(s"$snapshotTable has no published version"))
    val prevV = store.versions(snapshotTable).filter(_ < cur).lastOption.getOrElse(
      throw new IllegalStateException(
        s"$snapshotTable has a single version — nothing to diff against"))
    val current = store.read(snapshotTable)
    val prev = store.readVersion(snapshotTable, prevV)
    val roster = store.currentVersion(rosterTable).map(_ => store.read(rosterTable))
    val report = Joins.snapshotDiffCauses(current, prev, idCol, lineageCols, roster)
    store.publish(reportTable, report)
    // hand back the PUBLISHED artifact: downstream consumers re-read the
    // version dir instead of recomputing the classification plan
    store.read(reportTable)
  }
}
