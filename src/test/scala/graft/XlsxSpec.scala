package graft

import java.io.{File, FileInputStream, FileOutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}
import graft.pipelines.Phl
import graft.sinks.XlsxSink
import graft.sources.{StringCsv, Xlsx}
import org.apache.spark.sql.functions._

/**
 * S2 XLSX ingest + S10 workbook sink (SURVEY §2.1): a handwritten OOXML
 * fixture (shared strings, inline strings, raw numbers, sparse cells,
 * per-file column-order variance) read through the distributed path, the
 * sink/reader round-trip, and the PHL dashboard e2e from a real .xlsx —
 * the reference's entry shape (docs/notebooks/phl.Rmd:113-236).
 */
class XlsxSpec extends SparkSpec {
  import spark.implicits._

  private val dir = java.nio.file.Files.createTempDirectory("xlsx_spec").toFile

  /** Handwritten workbook: NOT produced by XlsxSink, so reader bugs can't
    * cancel writer bugs. Uses shared strings + numbers + a sparse row. */
  private def writeFixture(f: File, header: Seq[String], rows: Seq[Seq[Any]]): Unit = {
    val strings = scala.collection.mutable.LinkedHashMap[String, Int]()
    def sIdx(s: String): Int = strings.getOrElseUpdate(s, strings.size)
    def cellXml(r: Int, c: Int, v: Any): String = {
      val ref = s"${('A' + c).toChar}$r"
      v match {
        case null => ""
        case n: Int => s"""<c r="$ref"><v>$n</v></c>"""
        case s: String => s"""<c r="$ref" t="s"><v>${sIdx(s)}</v></c>"""
      }
    }
    val bodyRows = (Seq(header) ++ rows.map(_.toSeq)).zipWithIndex.map {
      case (cells, i) =>
        s"""<row r="${i + 1}">""" + cells.zipWithIndex.map {
          case (v, c) => cellXml(i + 1, c, v)
        }.mkString + "</row>"
    }.mkString
    val z = new ZipOutputStream(new FileOutputStream(f))
    def put(name: String, content: String): Unit = {
      z.putNextEntry(new ZipEntry(name)); z.write(content.getBytes("UTF-8")); z.closeEntry()
    }
    put("xl/workbook.xml",
      """<workbook xmlns:r="http://x"><sheets><sheet name="Data" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    put("xl/_rels/workbook.xml.rels",
      """<Relationships><Relationship Id="rId1" Target="worksheets/sheet1.xml"/></Relationships>""")
    put("xl/worksheets/sheet1.xml",
      s"""<worksheet><sheetData>$bodyRows</sheetData></worksheet>""")
    put("xl/sharedStrings.xml",
      "<sst>" + strings.keys.map(s => s"<si><t>$s</t></si>").mkString + "</sst>")
    z.finish(); z.close()
  }

  test("colIndex decodes A, Z, AA, BC") {
    assert(Xlsx.colIndex("A1") === 0)
    assert(Xlsx.colIndex("Z9") === 25)
    assert(Xlsx.colIndex("AA12") === 26)
    assert(Xlsx.colIndex("BC3") === 54)
  }

  test("read: multi-file, per-file column order, shared strings, NA tokens, sparse cells") {
    val f1 = new File(dir, "a.xlsx")
    val f2 = new File(dir, "b.xlsx")
    writeFixture(f1, Seq("id", "name", "qty"), Seq(
      Seq(1, "alpha", 10),
      Seq(2, "NA", 20),          // NA token -> null
      Seq(3, null, 30)))         // sparse cell -> null
    // second file: DIFFERENT column order — matched by name
    writeFixture(f2, Seq("name", "id", "qty"), Seq(
      Seq("delta", 4, 40)))
    val schema = StringCsv.allStringSchema(Seq("id", "name", "qty"))
    val df = Xlsx.read(spark, schema, Seq(f1.getPath, f2.getPath))
    val rows = df.select("id", "name", "qty")
      .as[(String, Option[String], String)].collect().toSet
    assert(rows === Set(
      ("1", Some("alpha"), "10"),
      ("2", None, "20"),
      ("3", None, "30"),
      ("4", Some("delta"), "40")))
    assert(df.filter(col("_provenance").contains("b.xlsx")).count() === 1)
  }

  test("sink/reader round-trip keeps values, blanks nulls, styles the header") {
    val out = new File(dir, "styled.xlsx")
    val df = Seq(("r1", Some("x"), 1), ("r2", None, 2))
      .toDF("key", "opt", "n")
    XlsxSink.write(out.getPath, Seq("Report" -> df.orderBy("key")))
    val rows = Xlsx.parseSheet(new FileInputStream(out))
    assert(rows.head.flatten === Seq("key", "opt", "n"))
    assert(rows(1).map(_.orNull) === Seq("r1", "x", "1"))
    assert(rows(2).map(_.orNull) === Seq("r2", null, "2"))
    // header style marker present in the sheet XML
    val sheetXml = {
      val zin = new java.util.zip.ZipInputStream(new FileInputStream(out))
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .find(_.getName == "xl/worksheets/sheet1.xml")
        .map(_ => new String(zin.readAllBytes(), "UTF-8")).get
    }
    assert(sheetXml.contains("s=\"1\""))
  }

  test("conditional formatting: gap ladder emitted with escalating " +
      "priority, dxf fills, Grand_Total containsText; reader unaffected") {
    val out = new File(dir, "cond.xlsx")
    val df = Seq(("labA", "2", "12"), ("Grand_Total", "6", "15"))
      .toDF("gap_lab", "y2021", "y2022")
    val rules = XlsxSink.gapSummaryRules(
      nCols = 3, nRows = 2, yellow = 3, orange = 5, red = 10)
    XlsxSink.write(out.getPath, Seq("Summary Proportion" -> df), 100,
      Map("Summary Proportion" -> rules))
    def part(name: String): String = {
      val zin = new java.util.zip.ZipInputStream(new FileInputStream(out))
      Iterator.continually(zin.getNextEntry).takeWhile(_ != null)
        .find(_.getName == name)
        .map(_ => new String(zin.readAllBytes(), "UTF-8")).get
    }
    val styles = part("xl/styles.xml")
    // four ladder fills + grey, deduped across the two grey rules
    assert(styles.contains("""<dxfs count="5">"""), styles)
    Seq("FFC6EFCE", "FFFFFF00", "FFFFA500", "FFFF0000", "FFD3D3D3")
      .foreach(c => assert(styles.contains(c), s"missing dxf fill $c"))
    val sheet = part("xl/worksheets/sheet1.xml")
    // value-cell ladder over B2:C3, in order, priorities DESCENDING so
    // the red rule (added later) beats green on a conflict
    val prios = """priority="(\d+)"""".r
      .findAllMatchIn(sheet).map(_.group(1).toInt).toSeq
    assert(prios === Seq(6, 5, 4, 3, 2, 1), sheet.take(2000))
    assert(sheet.contains("""sqref="B2:C3""""))
    assert(sheet.contains("""operator="greaterThanOrEqual"><formula>0</formula>"""))
    assert(sheet.contains("""operator="greaterThan"><formula>10</formula>"""))
    // header grey + Grand_Total label grey (containsText anchored at A2)
    assert(sheet.contains("""sqref="A1:C1""""))
    assert(sheet.contains(
      """text="Grand_Total"><formula>NOT(ISERROR(SEARCH("Grand_Total",A2)))</formula>"""))
    // the reader still parses values (conditionalFormatting is ignored)
    val rows = Xlsx.parseSheet(new FileInputStream(out))
    assert(rows.head.flatten === Seq("gap_lab", "y2021", "y2022"))
    assert(rows(2).map(_.orNull) === Seq("Grand_Total", "6", "15"))
  }

  test("PHL pipeline ingests its dashboard from xlsx end-to-end") {
    val f = new File(dir, "dashboard.xlsx")
    writeFixture(f,
      Seq("specimen_id", "accession_id", "status", "reason", "lineage",
        "first_name", "last_name", "dob"),
      Seq(
        Seq("s1", "a1", "COMPLETED {1822}", "SENTINEL", "B.1.1.7", "Ann", "Ash", "1980-01-01"),
        Seq("s3", "a3", "COMPLETE", "PT", "B.1", "Cal", "Cox", "1982-02-02"),
        Seq("s7", "a7", "COMPLETE", "OTHER", "None", "Gus", "Gum", "1986-06-06")))
    val schema = StringCsv.allStringSchema(Seq(
      "specimen_id", "accession_id", "status", "reason", "lineage",
      "first_name", "last_name", "dob"))
    // readxl's default NA set is just "" (phl.Rmd:113-236) — the lineage
    // value "None" is REAL data for the cascade, not an NA token
    val dashboard = Xlsx.read(spark, schema, Seq(f.getPath), naTokens = Seq(""))
    val redcap = Seq(("s1", "p")).toDF("specimen_id", "project")
    val epi = Seq.empty[(String, String, String, String)]
      .toDF("specimen_id", "first_name", "last_name", "dob")
    val wdrs = Seq((201L, "s1"), (207L, "s7")).toDF("case_id", "wdrs_key")
    val reasonMap = Seq(("OTHER", "OTHER")).toDF("input", "output")
    val processed = Seq.empty[String].toDF("specimen_id")
    val out = Phl.run(dashboard, redcap, epi, wdrs, reasonMap, processed)
    val m = out.select("specimen_id", "status", "case_id")
      .as[(String, String, Long)].collect().map(r => r._1 -> r).toMap
    assert(m.keySet === Set("s1", "s7"))            // PT row dropped
    assert(m("s1") === (("s1", "COMPLETE", 201L)))  // normalized + matched
    assert(m("s7") === (("s7", "LOW QUALITY", 207L))) // None-lineage cascade
  }
}
