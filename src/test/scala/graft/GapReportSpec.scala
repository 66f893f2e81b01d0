package graft

import graft.pipelines.GapReport
import org.apache.spark.sql.functions._

/** Gap-report assembly: case-insensitive gap, UW alt-id second pass,
  * rle ID-part extraction, lab attribution, summary counts + formatting. */
class GapReportSpec extends SparkSpec {
  import spark.implicits._

  test("gapAgainstWdrs is case-insensitive; second pass removes alt-id hits") {
    val repo = Seq(
      ("USA/WA-UW-1234567/2021", "2021-03-05"),  // alt-id hit -> removed in pass 2
      ("USA/WA-PHL-99/2021", "2021-03-05"),      // true gap
      ("usa/wa-uw-0000001/2021", "2021-03-05"))  // case-insensitive WDRS hit
      .toDF("virus_name", "collection_date")
      .withColumn("collection_date", to_date(col("collection_date")))
    val wdrs = Seq(
      "USA/WA-UW-0000001/2021",          // matches row 3 modulo case
      "USA/WA-UW-21031234567/2021")      // the yyMM-injected alt form of row 1
      .toDF("acc")
    val gap = GapReport.gapAgainstWdrs(repo, "virus_name", wdrs, "acc")
    assert(gap.count() === 2) // rows 1 and 2 survive the direct pass
    val withAlt = gap.withColumn("altmatch",
      GapReport.uwAltId(col("virus_name"), col("collection_date")))
    val finalGap = GapReport.removeAltMatches(withAlt, "altmatch", wdrs, "acc")
    assert(finalGap.select("virus_name").as[String].collect().toSeq ===
      Seq("USA/WA-PHL-99/2021"))
  }

  test("uwAltId reconstructs all three UW formats, null otherwise") {
    val df = Seq(
      ("USA/WA-UW-1234567/2021", "2021-03-05"),
      ("USA/WA-CDC-UW12345/2021", "2021-03-05"),
      ("USA/WA-CDC-UW-12345/2021", "2021-03-05"),
      ("USA/WA-PHL-123/2021", "2021-03-05"))
      .toDF("name", "cd").withColumn("cd", to_date(col("cd")))
      .select(GapReport.uwAltId(col("name"), col("cd")).as("alt"))
    assert(df.as[Option[String]].collect().toSeq === Seq(
      Some("USA/WA-UW-21031234567/2021"),
      Some("USA/WA-CDC-UW21030512345/2021"),
      Some("USA/WA-CDC-UW21030512345/2021"),
      None))
  }

  test("withVirusIdParts: rle collapse, letter stripping, short names") {
    val df = Seq(
      "USA/WA-CDC-STM-123/2023",     // p1=CDC p2=STM
      "USA/WA-PHL-PHL-123/2023",     // consecutive dup PHL collapses (rle)
      "USA/WA-CDC-2-123/2023",       // literal '2' survives in part 2
      "USA/WA-MG_LHLV_O-1/2023",     // underscore retained ([^A-z] quirk)
      "USA/WA-UW-123/2023",          // p2 strips to ''
      "NOHYPHENS")                   // too short -> both parts ''
      .toDF("virus_name")
    val parts = GapReport.withVirusIdParts(df, "virus_name")
      .select("virus_name", "VIRUS_ID_PART1", "VIRUS_ID_PART2")
      .as[(String, String, String)].collect().toMap2
    assert(parts("USA/WA-CDC-STM-123/2023") === (("CDC", "STM")))
    assert(parts("USA/WA-PHL-PHL-123/2023") === (("PHL", ""))) // dup gone -> part2 is the id tail
    assert(parts("USA/WA-CDC-2-123/2023") === (("CDC", "2")))
    assert(parts("USA/WA-MG_LHLV_O-1/2023") === (("MG_LHLV_O", "")))
    assert(parts("USA/WA-UW-123/2023") === (("UW", "")))
    assert(parts("NOHYPHENS") === (("", "")))
  }

  test("gapLab attribution: token table, CDC fallback, default fallback") {
    val rows = Seq(
      ("ASC", "", "og", "sub", "Aegis"),
      ("CDC", "STM", "og", "sub", "Helix"),
      ("CDC", "QDX", "og", "sub", "Quest"),
      ("MG_LHLV_O", "", "og", "sub", "UW Virology"),
      ("CDC", "2", "og", "sub", "PHL/CDC"),
      ("CDC", "", "og", "sub", "og"),      // bare CDC -> originating lab
      ("WHOKNOWS", "", "og", "sub", "sub")) // unknown -> submitting lab
      .toDF("p1", "p2", "og", "sub", "expected")
      .withColumn("lab", GapReport.gapLab(
        col("p1"), col("p2"), col("og"), col("sub")))
    assert(rows.filter(col("lab") =!= col("expected")).count() === 0)
  }

  test("gapCounts + formattedReport: shares, totals, sub-basis-point format") {
    val gap = Seq(
      ("LabA", 2023), ("LabA", 2023), ("LabA", 2024), ("LabB", 2023))
      .toDF("gap_lab", "yr")
    // population: 2023 has 8 submissions, 2024 has 10001 (forces <0.01%)
    val population = (Seq.fill(8)(2023) ++ Seq.fill(10001)(2024)).toDF("pyr")
    val counts = GapReport.gapCounts(gap, "gap_lab", "yr", population, "pyr")
    val m = counts.as[(String, Int, Long, Long)].collect()
      .map { case (lab, yr, n, bp) => (lab, yr) -> ((n, bp)) }.toMap
    assert(m(("LabA", 2023)) === ((2L, 2500L)))  // 2/8 = 25.00% = 2500bp
    assert(m(("LabB", 2023)) === ((1L, 1250L)))
    assert(m(("LabA", 2024)) === ((1L, 0L)))     // 1/10001 -> floor 0 bp
    val wide = GapReport.formattedReport(counts).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getString(2))).toMap
    assert(wide("LabA") === (("2 (25.00%)", "1 (<0.01%)")))
    assert(wide("LabB") === (("1 (12.50%)", "0")))
    assert(wide("Total")._1 === "3 (37.50%)")
  }

  test("formatted report lands in a styled workbook (S10 wiring)") {
    val counts = Seq(("LabA", 2023, 2L, 2500L), ("LabB", 2023, 1L, 1250L))
      .toDF("gap_lab", "yr", "n", "pct_bp")
    val wide = GapReport.formattedReport(counts)
    val out = java.nio.file.Files
      .createTempDirectory("graft_gap").resolve("gap_report.xlsx").toFile
    graft.sinks.XlsxSink.write(out.getPath, Seq("Gap by Lab" -> wide))
    val rows = graft.sources.Xlsx.parseSheet(new java.io.FileInputStream(out))
    assert(rows.head.flatten === Seq("gap_lab", "2023"))
    assert(rows.tail.map(_.map(_.orNull)).toSet ===
      Set(Seq("LabA", "2 (25.00%)"), Seq("LabB", "1 (12.50%)"),
        Seq("Total", "3 (37.50%)")))
  }

  test("summaryStyleMatrix: the escalation ladder fires the HIGHEST " +
      "cleared threshold; count thresholds rescale to the gap total; " +
      "Grand_Total label greys") {
    // pct_bp values straddle every boundary: 250bp green (<=3%), 301bp
    // yellow, 750bp orange, 1200bp red; counts total N=40 so the count
    // ladder cuts at 1.2 / 2 / 4
    val counts = Seq(
      ("LabA", 2023, 1L, 250L),   // prop green; 1*100=100 <= 3*40 -> green
      ("LabB", 2023, 2L, 301L),   // prop yellow; 200 > 120, <= 200 -> yellow
      ("LabC", 2023, 3L, 750L),   // prop orange; 300 > 200, <= 400 -> orange
      ("LabD", 2023, 34L, 1200L)) // prop red; 3400 > 400 -> red
      .toDF("gap_lab", "yr", "n", "pct_bp")
    val m = GapReport.summaryStyleMatrix(counts)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        ((r.getLong(3), r.getString(4), r.getString(5)))).toMap
    assert(m(("Summary Proportion", "LabA")) === ((250L, "green", "none")))
    assert(m(("Summary Proportion", "LabB")) === ((301L, "yellow", "none")))
    assert(m(("Summary Proportion", "LabC")) === ((750L, "orange", "none")))
    assert(m(("Summary Proportion", "LabD")) === ((1200L, "red", "none")))
    assert(m(("Summary Count", "LabA")) === ((1L, "green", "none")))
    assert(m(("Summary Count", "LabB")) === ((2L, "yellow", "none")))
    assert(m(("Summary Count", "LabC")) === ((3L, "orange", "none")))
    assert(m(("Summary Count", "LabD")) === ((34L, "red", "none")))
    // Grand_Total row: value cells sit inside the rules' range (they get
    // ladder colors) and the label cell greys
    assert(m(("Summary Proportion", "Grand_Total")) ===
      ((250L + 301L + 750L + 1200L, "red", "grey")))
    assert(m(("Summary Count", "Grand_Total")) === ((40L, "red", "grey")))
  }

  implicit private class Collectable(rows: Array[(String, String, String)]) {
    def toMap2: Map[String, (String, String)] =
      rows.map { case (k, a, b) => k -> ((a, b)) }.toMap
  }
}
