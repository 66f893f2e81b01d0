package graft

import graft.pipelines.DailyDiffs
import graft.sources.SnapshotStore

/** End-to-end daily-diffs report from STORED state: two snapshot versions
  * + a roster upload in a SnapshotStore, one run() call, all six
  * (cause, side) arms in the published artifact. */
class DailyDiffsSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(): SnapshotStore = new SnapshotStore(spark,
    java.nio.file.Files.createTempDirectory("graft_dd").toString)

  test("run(): classifies all six arms end-to-end from stored state") {
    val store = newStore()
    // yesterday's snapshot (v0), today's (v1) — the same scenarios as the
    // operator-level spec, but flowing through versioned parquet state
    store.publish("seq_snapshot", Seq(
      ("C1", "A1", "B.1"),    // case-id merge: same attrs, new id C1N
      ("C2", "A2", "B.2"),    // lineage update: same row except lineage
      ("C3", "A3", "B.3"),    // unexpected: accession AND lineage changed
      ("C4", "A4", "B.4"),    // removed, no counterpart -> unexpected
      ("C6", "A6", "B.6"))    // unchanged
      .toDF("case_id", "acc", "lineage"))
    store.publish("seq_snapshot", Seq(
      ("C1N", "A1", "B.1"),
      ("C2", "A2", "B.2.1"),
      ("C3", "A3x", "B.3x"),
      ("C5", "A5", "B.5"),    // added by roster upload -> expected
      ("C6", "A6", "B.6"))
      .toDF("case_id", "acc", "lineage"))
    store.publish("compiled_roster",
      Seq(("C5", "A5"), ("C9", "A9")).toDF("case_id", "acc"))

    val report = DailyDiffs.run(store, "seq_snapshot", "case_id", Seq("lineage"))

    val out = report.select("case_id", "diff_side", "cause")
      .as[(String, String, String)].collect().toSet
    assert(out === Set(
      ("C5", "current", "roster_expected"),
      ("C9", "roster", "roster_missing"),
      ("C1N", "current", "case_id_merge"),
      ("C1", "prev", "case_id_merge"),
      ("C2", "current", "lineage_update"),
      ("C2", "prev", "lineage_update"),
      ("C3", "current", "unexpected"),
      ("C3", "prev", "unexpected"),
      ("C4", "prev", "unexpected")))
    // the report is itself published, versioned state
    assert(store.versions("daily_diffs_report") === Seq(0L))
    assert(store.read("daily_diffs_report").count() === 9)
    // email-body summary: every arm counted
    val sums = DailyDiffs.summarize(report)
      .as[(String, String, Long)].collect().toSet
    assert(sums === Set(
      ("roster_expected", "current", 1L), ("roster_missing", "roster", 1L),
      ("case_id_merge", "current", 1L), ("case_id_merge", "prev", 1L),
      ("lineage_update", "current", 1L), ("lineage_update", "prev", 1L),
      ("unexpected", "current", 1L), ("unexpected", "prev", 2L)))
  }

  test("run(): quiet day (identical snapshots, no roster) -> empty report") {
    val store = newStore()
    val snap = Seq(("C1", "A1")).toDF("case_id", "acc")
    store.publish("seq_snapshot", snap)
    store.publish("seq_snapshot", snap)
    val report = DailyDiffs.run(store, "seq_snapshot", "case_id", Seq.empty)
    assert(report.count() === 0)  // the "No WDRS changes identified" arm
    assert(store.versions("daily_diffs_report") === Seq(0L))
  }

  test("run(): refuses a single-version snapshot table") {
    val store = newStore()
    store.publish("seq_snapshot", Seq(("C1", "A1")).toDF("case_id", "acc"))
    intercept[IllegalStateException] {
      DailyDiffs.run(store, "seq_snapshot", "case_id", Seq.empty)
    }
  }
}
