package graft

import graft.qa.WeeklyChange
import graft.sources.SnapshotStore
import org.apache.spark.sql.functions._

/** The weekly-Change arms the registry oracle can't reach: the FIRST run
  * (no published summary — every Change equals this week's Total) and an
  * error type that disappeared (negative Change, zero-filled year cols). */
class WeeklyChangeSpec extends SparkSpec {
  import spark.implicits._

  private def newStore(): SnapshotStore = new SnapshotStore(spark,
    java.nio.file.Files.createTempDirectory("graft_wc").toString)

  test("first run: empty previous -> Change equals Total; summary published") {
    val store = newStore()
    val cur = Seq(("qa_a", 3L, 4L, 7L), ("qa_b", 1L, 0L, 1L))
      .toDF("error", "y1992", "y1993", "Total")
    val out = WeeklyChange.weeklyChange(store, "summary_table", cur)
      .select("error", "Total", "Change").as[(String, Long, Long)]
      .collect().toSet
    assert(out === Set(("qa_a", 7L, 7L), ("qa_b", 1L, 1L)))
    assert(store.versions("summary_table") === Seq(0L))
  }

  test("second run: vanished error survives with zero years and negative Change") {
    val store = newStore()
    val week1 = Seq(("qa_a", 5L, 5L), ("qa_gone", 2L, 2L))
      .toDF("error", "y1992", "Total")
    val week2 = Seq(("qa_a", 8L, 8L), ("qa_new", 1L, 1L))
      .toDF("error", "y1992", "Total")
    WeeklyChange.weeklyChange(store, "summary_table", week1)
    val out = WeeklyChange.weeklyChange(store, "summary_table", week2)
      .select("error", "y1992", "Total", "Change")
      .as[(String, Long, Long, Long)].collect().toSet
    assert(out === Set(
      ("qa_a", 8L, 8L, 3L),
      ("qa_new", 1L, 1L, 1L),
      ("qa_gone", 0L, 0L, -2L)))  // the reference's full_join + zero-fill arm
    assert(store.versions("summary_table") === Seq(0L, 1L))
    // next week's baseline is THIS week's summary, not the comparison
    assert(store.read("summary_table").columns.toSet ===
      Set("error", "y1992", "Total"))
  }
}
