package graft

import graft.operators.Joins
import graft.sources.SnapshotStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Versioned state store: publish/flip/read-back, crash isolation,
  * vacuum; plus the snapshot-diff operator over two published versions. */
class SnapshotStoreSpec extends SparkSpec {
  import spark.implicits._

  test("publish flips _CURRENT atomically; readers see whole versions") {
    val root = Files.createTempDirectory("graft_store").toString
    val store = new SnapshotStore(spark, root)
    assert(store.currentVersion("keep_na").isEmpty)

    val v0 = store.publish("keep_na", Seq(("k1", 1), ("k2", 2)).toDF("key", "v"))
    assert(v0 === 0L)
    assert(store.read("keep_na").count() === 2)

    val v1 = store.publish("keep_na",
      store.read("keep_na").unionByName(Seq(("k3", 3)).toDF("key", "v")))
    assert(v1 === 1L)
    assert(store.read("keep_na").count() === 3)
    assert(store.versions("keep_na") === Seq(0L, 1L))

    store.vacuum("keep_na", keep = 1)
    assert(store.versions("keep_na") === Seq(1L))
    assert(store.read("keep_na").count() === 3)
  }

  test("readOrEmpty yields typed empty frame before first publish") {
    val root = Files.createTempDirectory("graft_store2").toString
    val store = new SnapshotStore(spark, root)
    val schema = Seq(("x", 1)).toDF("key", "v").schema
    assert(store.readOrEmpty("nothing", schema).count() === 0)
    assert(store.readOrEmpty("nothing", schema).schema === schema)
  }

  test("snapshotDiff classifies added/removed/changed between versions") {
    val root = Files.createTempDirectory("graft_store3").toString
    val store = new SnapshotStore(spark, root)
    store.publish("wdrs", Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "v"))
    val yesterday = store.read("wdrs")
    store.publish("wdrs", Seq((1, "a"), (2, "B"), (4, "d")).toDF("id", "v"))
    val today = store.read("wdrs")

    val diff = Joins.snapshotDiff(today, yesterday, Seq("id"))
      .select("id", "diff_kind").as[(Int, String)].collect().toSet
    assert(diff === Set(
      (2, "added_changed"), (2, "removed_changed"),  // id 2 changed value
      (4, "added"), (3, "removed")))
  }

  test("snapshotDiffCauses: roster, merge, lineage, unexpected arms") {
    // columns: case id / accession (stable) / lineage (mutable) — one
    // scenario per cause, in the reference's precedence order
    val prev = Seq(
      ("C1", "A1", "B.1"),    // case-id merge: same attrs, new id C1N
      ("C2", "A2", "B.2"),    // lineage update: same row except lineage
      ("C3", "A3", "B.3"),    // unexpected: accession AND lineage changed
      ("C4", "A4", "B.4"),    // removed, no counterpart -> unexpected
      ("C6", "A6", "B.6"))    // unchanged (also in current)
      .toDF("case_id", "acc", "lineage")
    val current = Seq(
      ("C1N", "A1", "B.1"),
      ("C2", "A2", "B.2.1"),
      ("C3", "A3x", "B.3x"),
      ("C5", "A5", "B.5"),    // added by roster upload -> expected
      ("C6", "A6", "B.6"))
      .toDF("case_id", "acc", "lineage")
    // roster columns are a SUBSET of the snapshot columns (any_of, with
    // null-fill on the way back out): C5 uploaded fine; C9 never appeared
    // as a new diff -> upload problem
    val roster = Seq(("C5", "A5"), ("C9", "A9")).toDF("case_id", "acc")

    val out = Joins.snapshotDiffCauses(current, prev, "case_id",
        Seq("lineage"), Some(roster))
      .select("case_id", "diff_side", "cause")
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
  }

  test("snapshotDiffCauses without a roster still classifies merges") {
    val prev = Seq(("C1", "A1"), ("C2", "A2")).toDF("case_id", "acc")
    val current = Seq(("C1N", "A1"), ("C2", "A2")).toDF("case_id", "acc")
    val out = Joins.snapshotDiffCauses(current, prev, "case_id",
        Seq.empty, None)
      .select("case_id", "cause").as[(String, String)].collect().toSet
    assert(out === Set(
      ("C1N", "case_id_merge"), ("C1", "case_id_merge")))
  }
}
