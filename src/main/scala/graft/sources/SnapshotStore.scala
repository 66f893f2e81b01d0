package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/**
 * Versioned parquet state tables with atomic swap (SURVEY §7.4#4): the
 * reference's read-modify-write running files (keep_na.csv, processed
 * lists, saved_rows, pins) ported as immutable versioned snapshots —
 * each write lands a NEW version directory, then a pointer file flips to
 * it. Readers always see a complete version; a crashed writer leaves no
 * torn state (the reference's conservation checks + holding-folder
 * diversions become a version that simply never gets published).
 *
 * Layout: <root>/<table>/v=<n>/part-*.parquet + <root>/<table>/_CURRENT
 * (text file holding the published version number).
 */
class SnapshotStore(spark: SparkSession, root: String) {

  private def tableDir(name: String): Path = Paths.get(root, name)
  private def currentFile(name: String): Path = tableDir(name).resolve("_CURRENT")

  /** Published version of a table, if any. */
  def currentVersion(name: String): Option[Long] = {
    val f = currentFile(name)
    if (Files.exists(f)) Some(Files.readString(f).trim.toLong) else None
  }

  /** Read the published snapshot. */
  def read(name: String): DataFrame = {
    val v = currentVersion(name).getOrElse(
      throw new IllegalStateException(s"state table $name has no published version"))
    spark.read.parquet(tableDir(name).resolve(s"v=$v").toString)
  }

  /** Read the published snapshot or an empty frame with the given schema. */
  def readOrEmpty(name: String, schema: org.apache.spark.sql.types.StructType): DataFrame =
    currentVersion(name) match {
      case Some(v) => spark.read.parquet(tableDir(name).resolve(s"v=$v").toString)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  /**
   * Publish a new version: write parquet to v=<n+1>, verify the re-read
   * row count (the reference's conservation check, S8), then flip
   * _CURRENT. Returns the published version.
   */
  def publish(name: String, df: DataFrame): Long = {
    val next = currentVersion(name).getOrElse(-1L) + 1
    val dir = tableDir(name).resolve(s"v=$next")
    val expected = df.count()
    df.write.mode("overwrite").parquet(dir.toString)
    val actual = spark.read.parquet(dir.toString).count()
    if (actual != expected)
      throw new IllegalStateException(
        s"conservation check failed publishing $name v$next: wrote $expected, read $actual")
    Files.createDirectories(tableDir(name))
    // atomic flip: write sidecar then move over _CURRENT
    val tmp = tableDir(name).resolve(s"_CURRENT.tmp$next")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, currentFile(name),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    next
  }

  /** Read a specific on-disk version (day-over-day comparisons read the
    * published version AND its predecessor). */
  def readVersion(name: String, v: Long): DataFrame = {
    val dir = tableDir(name).resolve(s"v=$v")
    if (!Files.exists(dir))
      throw new IllegalArgumentException(s"state table $name has no version $v")
    spark.read.parquet(dir.toString)
  }

  /** All versions on disk (for retention/audit). */
  def versions(name: String): Seq[Long] = {
    val d = tableDir(name)
    if (!Files.exists(d)) Seq.empty
    else scala.util.Using.resource(Files.list(d)) { stream =>
      stream.iterator().asScala
        .map(_.getFileName.toString)
        .collect { case s if s.startsWith("v=") => s.drop(2).toLong }
        .toSeq.sorted
    }
  }

  /** Drop all but the newest `keep` versions (never the published one). */
  def vacuum(name: String, keep: Int = 2): Unit = {
    val cur = currentVersion(name)
    versions(name).dropRight(keep).filterNot(cur.contains)
      .foreach(v => dropVersion(name, v))
  }

  /** Delete one on-disk version. Refuses the published version — that
    * would leave `_CURRENT` dangling for every reader. */
  def dropVersion(name: String, v: Long): Unit = {
    require(!currentVersion(name).contains(v),
      s"dropVersion: v$v is the published version of $name")
    val dir = tableDir(name).resolve(s"v=$v")
    if (Files.exists(dir)) {
      scala.util.Using.resource(Files.walk(dir)) { stream =>
        stream.iterator().asScala.toSeq.reverse.foreach(Files.delete)
      }
    }
  }
}
