package graft

import graft.sources.FileCommit
import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** S12 file-move commit protocol: routing, dual-destination fan-out,
  * manifest gating, leftover sweep, pending discovery. */
class FileCommitSpec extends AnyFunSuite {

  private val routes = Seq(
    "Aegis" -> Seq("Aegis", "NW_Genomics"), // dual destination
    "UW_Virology" -> Seq("UW_Virology"),
    "Helix" -> Seq("Helix"))

  private def fixture() = {
    val root = Files.createTempDirectory("graft_commit")
    val sub = root.resolve("Submissions"); Files.createDirectories(sub)
    val mk = (n: String) => {
      val p = sub.resolve(n); Files.write(p, java.util.List.of("x")); p.toString
    }
    (root, sub, mk)
  }

  test("commit copies to routed folders (incl. fan-out), manifests, deletes") {
    val (root, sub, mk) = fixture()
    val files = Seq(mk("Aegis_2021.csv"), mk("UW_Virology_a.csv"), mk("Odd.csv"))
    val manifest = root.resolve("completed.txt").toString
    val res = FileCommit.commitProcessed(files,
      root.resolve("Completed").toString, routes, "Adhoc", manifest)
    // Aegis lands twice, UW once, unmatched in the default folder
    assert(res.copied.size === 4)
    assert(Files.exists(root.resolve("Completed/Aegis/Aegis_2021.csv")))
    assert(Files.exists(root.resolve("Completed/NW_Genomics/Aegis_2021.csv")))
    assert(Files.exists(root.resolve("Completed/UW_Virology/UW_Virology_a.csv")))
    assert(Files.exists(root.resolve("Completed/Adhoc/Odd.csv")))
    // originals gone, nothing deferred, manifest holds the batch
    assert(res.deferred.isEmpty)
    assert(Files.list(sub).count() === 0)
    assert(FileCommit.readManifest(manifest) === files.toSet)
  }

  test("pending discovery skips manifested files; sweep removes leftovers") {
    val (root, sub, mk) = fixture()
    val done = mk("Helix_done.csv")
    val fresh = mk("Helix_new.csv")
    val manifest = root.resolve("completed.txt").toString
    // simulate a crash AFTER manifest publish but BEFORE delete:
    // done is manifested yet still present in Submissions
    Files.write(Paths.get(manifest), java.util.List.of(done))
    assert(FileCommit.pendingFiles(Seq(sub.toString), manifest) === Seq(fresh))
    val swept = FileCommit.sweepLeftovers(manifest)
    assert(swept === Seq(done))
    assert(!Files.exists(Paths.get(done)))
    assert(Files.exists(Paths.get(fresh)))
  }

  test("routing matches the FILENAME only, not parent directories") {
    assert(FileCommit.destinationsFor(
      "/drops/Helix/odd_batch.csv", routes, "Adhoc") === Seq("Adhoc"))
    assert(FileCommit.destinationsFor(
      "/drops/other/Helix_batch.csv", routes, "Adhoc") === Seq("Helix"))
  }

  test("a still-deferred file stays in the manifest across later commits") {
    val (root, _, mk) = fixture()
    val manifest = root.resolve("completed.txt").toString
    val completedRoot = root.resolve("Completed").toString
    val stuck = mk("Helix_stuck.csv")
    // run 1 committed `stuck` but could not delete it: manifest holds it,
    // the file is still on disk (the tolerated crash/lock window)
    java.nio.file.Files.write(java.nio.file.Paths.get(manifest),
      java.util.List.of(stuck))
    // run 2 commits a new batch WITHOUT sweeping first; the gate must not
    // forget `stuck`, or run 3 would re-process an uploaded submission
    val fresh = mk("Helix_fresh.csv")
    FileCommit.commitProcessed(Seq(fresh), completedRoot, routes, "Adhoc", manifest)
    assert(FileCommit.readManifest(manifest) === Set(stuck, fresh))
    assert(FileCommit.pendingFiles(
      Seq(root.resolve("Submissions").toString), manifest).isEmpty)
  }

  test("fully-deleted prior batches fall out of the manifest") {
    val (root, _, mk) = fixture()
    val manifest = root.resolve("completed.txt").toString
    val completedRoot = root.resolve("Completed").toString
    val f1 = mk("Helix_1.csv")
    FileCommit.commitProcessed(Seq(f1), completedRoot, routes, "Adhoc", manifest)
    val f2 = mk("Helix_2.csv")
    FileCommit.commitProcessed(Seq(f2), completedRoot, routes, "Adhoc", manifest)
    assert(FileCommit.readManifest(manifest) === Set(f2))
  }
}
