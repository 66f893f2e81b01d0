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
}
