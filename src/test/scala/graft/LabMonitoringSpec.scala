package graft

import graft.qa.LabMonitoring
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Path}
import java.nio.file.attribute.FileTime

/** Landing-zone freshness monitor end-to-end: real temp dirs with set
  * mtimes -> scan -> latest-per-folder -> per-lab summary -> workbook. */
class LabMonitoringSpec extends SparkSpec {
  import spark.implicits._

  private def touch(dir: Path, name: String, daysAgo: Long): Unit = {
    val f = dir.resolve(name)
    Files.createDirectories(dir)
    Files.writeString(f, "x")
    Files.setLastModifiedTime(f,
      FileTime.fromMillis(System.currentTimeMillis() - daysAgo * 86400000L))
  }

  test("scan + freshness report: newest file per folder, min lag per lab") {
    val root = Files.createTempDirectory("graft_lz")
    val sub = root.resolve("Submissions"); val comp = root.resolve("Completed")
    touch(sub.resolve("Aegis"), "a_old.csv", 30)
    touch(sub.resolve("Aegis"), "a_new.xlsx", 3)
    touch(sub.resolve("Aegis"), "a_RUNNING.xlsx", 0)      // excluded
    touch(sub.resolve("Altius"), "b.csv", 12)
    touch(comp.resolve("Aegis"), "a_done.csv", 5)
    touch(comp.resolve("Quest"), "q.csv", 2)               // excluded lab
    touch(sub.resolve("Helix"), "readme.txt", 1)           // wrong extension

    val files = LabMonitoring.scanLandingZone(spark,
      Seq("Submitted" -> sub.toString, "Completed" -> comp.toString))
    // _RUNNING and .txt excluded; 5 real files
    assert(files.count() === 5)

    val recent = LabMonitoring.latestPerFolder(files, current_date())
    // one row per (folder, type): Aegis-sub, Altius-sub, Aegis-comp, Quest-comp
    assert(recent.count() === 4)
    val aegisSub = recent.filter(col("type") === "Submitted" &&
      col("folder").contains("Aegis")).select("path", "datediff")
      .as[(String, Int)].head()
    assert(aegisSub._1.endsWith("a_new.xlsx") && aegisSub._2 === 3)

    val out = Files.createTempDirectory("graft_lzout").resolve("report.xlsx")
    val (detailed, summary) = LabMonitoring.run(spark,
      Seq("Submitted" -> sub.toString, "Completed" -> comp.toString),
      patterns = Seq("Aegis" -> "Aegis", "Altius" -> "Altius", "Quest" -> "Quest"),
      outPath = out.toString, asOf = current_date(),
      excludeLabs = Seq("Quest"))
    // summary: min lag per lab, most stale first
    assert(summary.as[(String, Int)].collect().toSeq ===
      Seq(("Altius", 12), ("Aegis", 3)))
    // detailed keeps both Aegis rows (Submitted lag 3, Completed lag 5)
    assert(detailed.filter(col("Lab") === "Aegis").count() === 2)
    assert(detailed.filter(col("Lab") === "Quest").count() === 0)
    assert(Files.size(out) > 0)
  }
}
