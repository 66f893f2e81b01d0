package graft.sources

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._
import scala.util.Try

/**
 * S12 file-move commit protocol (SURVEY §2.1,
 * docs/notebooks/template_submitters.Rmd:1040-1140): after a batch
 * processes, every consumed submission file is copied into its
 * submitter's Completed_Submissions folder, the run's manifest is
 * published, and the originals are deleted. The reference tolerates
 * delete failures ("files the environment still holds open") by sweeping
 * them on the NEXT run from the manifest — so the commit order here is
 * copy → manifest (atomic rename) → delete, which makes the protocol
 * resumable: a crash between steps never loses a file (copy is
 * re-runnable) and never double-processes one (the manifest gates
 * pending discovery).
 *
 * Driver-side control plane by design — these are dozens of submission
 * files per run, not data-plane work; the data path stays in
 * [[StringCsv]] / [[Xlsx]].
 */
object FileCommit {

  /** copied = completed destinations written; deferred = originals whose
    * delete failed (swept by the next run). */
  final case class CommitResult(copied: Seq[String], deferred: Seq[String])

  /**
   * Submitter folder routing by FILENAME detection
   * (template_submitters.Rmd:1052-1105): first matching token wins; a
   * file may fan out to several folders (Aegis also lands in
   * NW_Genomics). Unmatched files go to `default`. Only the final path
   * segment is matched — a route token appearing in a parent directory
   * (Submissions/Helix/batch.csv) must not capture every file under it.
   */
  def destinationsFor(file: String, routes: Seq[(String, Seq[String])],
      default: String): Seq[String] = {
    val name = Paths.get(file).getFileName.toString
    routes.collectFirst {
      case (token, folders) if name.contains(token) => folders
    }.getOrElse(Seq(default))
  }

  /**
   * Commit a processed batch: copy each file to its completed folder(s),
   * publish the manifest (temp file + atomic rename — the same flip
   * [[SnapshotStore]] uses), then delete originals, deferring failures.
   */
  def commitProcessed(files: Seq[String], completedRoot: String,
      routes: Seq[(String, Seq[String])], default: String,
      manifestPath: String): CommitResult = {
    val copied = files.flatMap { f =>
      val src = Paths.get(f)
      destinationsFor(f, routes, default).map { folder =>
        val destDir = Paths.get(completedRoot, folder)
        Files.createDirectories(destDir)
        val dest = destDir.resolve(src.getFileName)
        Files.copy(src, dest, StandardCopyOption.REPLACE_EXISTING)
        dest.toString
      }
    }
    // carry forward prior manifest entries whose original file still
    // exists (a delete deferred TWICE would otherwise fall out of the
    // manifest and be re-processed by run N+2 — the exact double-upload
    // the gate exists to prevent)
    val stillDeferred = readManifest(manifestPath)
      .filter(f => Files.exists(Paths.get(f))) -- files
    writeManifest(files ++ stillDeferred.toSeq.sorted, manifestPath)
    val deferred = files.filterNot(f =>
      Try(Files.deleteIfExists(Paths.get(f))).getOrElse(false))
    CommitResult(copied, deferred)
  }

  /** Publish the completed-file list (one path per line): this run's
    * batch plus any prior entries still awaiting deletion. (The
    * reference overwrites with only the last batch,
    * template_submitters.Rmd:1139 — which silently drops a
    * twice-deferred file from the gate; keeping live deferred entries
    * closes that hole without unbounded growth, since swept or deleted
    * entries fall out on the next commit.) */
  private def writeManifest(files: Seq[String], manifestPath: String): Unit = {
    val target = Paths.get(manifestPath)
    Option(target.getParent).foreach(Files.createDirectories(_))
    val tmp = target.resolveSibling(target.getFileName.toString + ".tmp")
    Files.write(tmp, files.asJava)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** The manifest's recorded set; empty before the first commit. */
  def readManifest(manifestPath: String): Set[String] = {
    val p = Paths.get(manifestPath)
    if (Files.exists(p)) Files.readAllLines(p).asScala.toSet else Set.empty
  }

  /**
   * The next run's opening sweep (template_submitters.Rmd "Chunk 10"):
   * delete any submission file the previous manifest committed but could
   * not remove. Returns the swept paths.
   */
  def sweepLeftovers(manifestPath: String): Seq[String] =
    readManifest(manifestPath).toSeq.sorted.filter { f =>
      Try(Files.deleteIfExists(Paths.get(f))).getOrElse(false)
    }

  /** Submission files not yet committed: the directory listing minus the
    * manifest (run [[sweepLeftovers]] first). */
  def pendingFiles(submissionDirs: Seq[String],
      manifestPath: String): Seq[String] = {
    val done = readManifest(manifestPath)
    submissionDirs.flatMap { d =>
      val dir = Paths.get(d)
      if (!Files.isDirectory(dir)) Seq.empty[String]
      else {
        // Files.list holds an open DirectoryStream — close it or leak an
        // fd per poll in a long-lived driver
        val s = Files.list(dir)
        try s.iterator().asScala
          .filter(Files.isRegularFile(_))
          .map(_.toString).toSeq
        finally s.close()
      }
    }.filterNot(done).sorted
  }
}
