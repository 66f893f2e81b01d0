package graft.sinks

import java.io.{BufferedOutputStream, FileOutputStream, OutputStream}
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.DataFrame

/**
 * S10 sink (SURVEY §2.1): styled XLSX workbook writer — the reference
 * emits review workbooks via openxlsx with a bold, filled header row and
 * NA written as blank (scripts/QA/gap_data.Rmd:393-428 writes the weekly
 * gap workbook; template_submitters writes review workbooks the same
 * way). Minimal OOXML over the JDK zip — no dependencies; the sibling
 * [[graft.sources.Xlsx]] reader parses its output (round-trip tested).
 *
 * Driver-side by design: review workbooks are human-consumed documents
 * (hundreds to thousands of rows). `maxRows` guards against wiring a
 * 100 TB frame into a spreadsheet — that's a parquet/CSV sink's job; rows
 * stream via toLocalIterator so the driver never holds a full partition
 * set.
 */
object XlsxSink {

  /**
   * One conditional-formatting rule (the openxlsx conditionalFormatting
   * shape the reference layers over the gap workbook's summary sheets,
   * gap_data.Rmd:694-851). Rules are emitted in the ORDER GIVEN with the
   * last rule taking the highest priority (lowest priority number) — the
   * stacking under which `>= 0` green, `> 3` yellow, `> 5` orange,
   * `> 10` red escalates instead of green shadowing the ladder.
   *
   * @param sqref    cell range, e.g. "B2:E10"
   * @param operator "greaterThan" | "greaterThanOrEqual" | "notEqual" —
   *                 or "containsText" (then `formula` is the TEXT to
   *                 search, e.g. the Grand_Total label rule)
   * @param formula  threshold literal or search text
   * @param rgb      fill color as AARRGGBB, e.g. "FFFFFF00"
   */
  final case class CondRule(sqref: String, operator: String,
      formula: String, rgb: String)

  /** The reference gap workbook's rule ladder for one summary sheet
    * (gap_data.Rmd:694-851): green >= lo on every value cell, then
    * yellow/orange/red above the three thresholds, grey on the header
    * row and on label cells containing Grand_Total. Thresholds are
    * doubles so the count sheet's 3/5/10%-of-total cutoffs (fractional
    * counts, the Rmd's `(3/100)*total_count_x`) pass through exactly. */
  def gapSummaryRules(nCols: Int, nRows: Int,
      yellow: Double, orange: Double, red: Double): Seq[CondRule] = {
    def num(d: Double): String =
      if (d == math.rint(d)) d.toLong.toString else d.toString
    val values = s"B2:${colRef(nCols - 1)}${nRows + 1}"
    Seq(
      CondRule(values, "greaterThanOrEqual", "0", "FFC6EFCE"),
      CondRule(values, "greaterThan", num(yellow), "FFFFFF00"),
      CondRule(values, "greaterThan", num(orange), "FFFFA500"),
      CondRule(values, "greaterThan", num(red), "FFFF0000"),
      CondRule(s"A1:${colRef(nCols - 1)}1", "notEqual", "0", "FFD3D3D3"),
      CondRule(s"A2:A${nRows + 1}", "containsText", "Grand_Total", "FFD3D3D3"))
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")

  private def colRef(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  private def entry(z: ZipOutputStream, name: String, content: String): Unit = {
    z.putNextEntry(new ZipEntry(name))
    z.write(content.getBytes("UTF-8"))
    z.closeEntry()
  }

  /** Write `sheets` (name -> DataFrame) as one styled workbook. Every cell
    * is written as its string form; null -> blank cell (NA-as-empty, S7
    * semantics). Header row uses style 1 (bold on gray fill).
    * `condFormats` (sheet name -> rules) layers [[CondRule]] conditional
    * formatting over a sheet — the openxlsx pattern of the reference's
    * gap workbook. */
  def write(path: String, sheets: Seq[(String, DataFrame)],
      maxRows: Int = 100000,
      condFormats: Map[String, Seq[CondRule]] = Map.empty): Unit = {
    val out = new BufferedOutputStream(new FileOutputStream(path))
    try writeTo(out, sheets, maxRows, condFormats) finally out.close()
  }

  def writeTo(out: OutputStream, sheets: Seq[(String, DataFrame)],
      maxRows: Int,
      condFormats: Map[String, Seq[CondRule]] = Map.empty): Unit = {
    val z = new ZipOutputStream(out)
    val n = sheets.size
    // one dxf (differential format) per distinct rule fill, in first-use
    // order; rules reference them by index
    val dxfColors = sheets.flatMap { case (name, _) =>
      condFormats.getOrElse(name, Seq.empty).map(_.rgb) }.distinct
    val dxfId = dxfColors.zipWithIndex.toMap
    entry(z, "[Content_Types].xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
      """<Default Extension="xml" ContentType="application/xml"/>""" +
      """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
      """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
      """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
      (1 to n).map(i =>
        s"""<Override PartName="/xl/worksheets/sheet$i.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
        .mkString + "</Types>")
    entry(z, "_rels/.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
      "</Relationships>")
    entry(z, "xl/workbook.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
      sheets.zipWithIndex.map { case ((name, _), i) =>
        s"""<sheet name="${esc(name)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>"""
      }.mkString + "</sheets></workbook>")
    entry(z, "xl/_rels/workbook.xml.rels",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
      sheets.indices.map(i =>
        s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""")
        .mkString +
      s"""<Relationship Id="rId${n + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
      "</Relationships>")
    // two cell formats: 0 = default, 1 = header (bold on a gray fill) —
    // the openxlsx createStyle(textDecoration="bold", fgFill=...) shape
    entry(z, "xl/styles.xml",
      """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
      """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
      """<fonts count="2"><font><sz val="11"/><name val="Calibri"/></font>""" +
      """<font><b/><sz val="11"/><name val="Calibri"/></font></fonts>""" +
      """<fills count="3"><fill><patternFill patternType="none"/></fill>""" +
      """<fill><patternFill patternType="gray125"/></fill>""" +
      """<fill><patternFill patternType="solid"><fgColor rgb="FFD9D9D9"/></patternFill></fill></fills>""" +
      """<borders count="1"><border/></borders>""" +
      """<cellStyleXfs count="1"><xf/></cellStyleXfs>""" +
      """<cellXfs count="2"><xf xfId="0"/>""" +
      """<xf xfId="0" fontId="1" fillId="2" applyFont="1" applyFill="1"/></cellXfs>""" +
      (if (dxfColors.isEmpty) ""
       else s"""<dxfs count="${dxfColors.size}">""" +
         dxfColors.map(c =>
           s"""<dxf><fill><patternFill><bgColor rgb="$c"/></patternFill></fill></dxf>""")
           .mkString + "</dxfs>") +
      "</styleSheet>")
    sheets.zipWithIndex.foreach { case ((sheetName, df), si) =>
      z.putNextEntry(new ZipEntry(s"xl/worksheets/sheet${si + 1}.xml"))
      val w = new java.io.OutputStreamWriter(z, "UTF-8")
      w.write("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
      w.write("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
      val cols = df.columns
      def cell(r: Int, c: Int, v: String, style: Int): String =
        if (v == null) "" // NA-as-empty: blank cell
        else s"""<c r="${colRef(c)}$r" t="inlineStr"${if (style > 0) s""" s="$style"""" else ""}><is><t>${esc(v)}</t></is></c>"""
      w.write("<row r=\"1\">" +
        cols.zipWithIndex.map { case (h, c) => cell(1, c, h, 1) }.mkString + "</row>")
      val it = df.toLocalIterator()
      var r = 2
      while (it.hasNext) {
        if (r - 2 >= maxRows) throw new IllegalStateException(
          s"XlsxSink: more than $maxRows rows — use a parquet/CSV sink for data-scale output")
        val row = it.next()
        w.write(s"""<row r="$r">""" +
          cols.indices.map { c =>
            val v = row.get(c)
            cell(r, c, if (v == null) null else v.toString, 0)
          }.mkString + "</row>")
        r += 1
      }
      w.write("</sheetData>")
      // conditional formats: one <conditionalFormatting> per rule, in
      // given order; priority DESCENDS so the LAST rule holds priority 1
      // (Excel: lowest number wins a conflicting bgFill) — openxlsx's
      // effective escalation stacking (see CondRule)
      val rules = condFormats.getOrElse(sheetName, Seq.empty)
      val k = rules.size
      rules.zipWithIndex.foreach { case (rule, i) =>
        val prio = k - i
        val d = dxfId(rule.rgb)
        val body =
          if (rule.operator == "containsText") {
            val anchor = rule.sqref.split(":")(0)
            s"""<cfRule type="containsText" dxfId="$d" priority="$prio" operator="containsText" text="${esc(rule.formula)}"><formula>NOT(ISERROR(SEARCH("${esc(rule.formula)}",$anchor)))</formula></cfRule>"""
          } else
            s"""<cfRule type="cellIs" dxfId="$d" priority="$prio" operator="${rule.operator}"><formula>${esc(rule.formula)}</formula></cfRule>"""
        w.write(s"""<conditionalFormatting sqref="${rule.sqref}">$body</conditionalFormatting>""")
      }
      w.write("</worksheet>")
      w.flush()
      z.closeEntry()
    }
    z.finish()
  }
}
