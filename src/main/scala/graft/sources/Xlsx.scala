package graft.sources

import java.io.{ByteArrayInputStream, InputStream}
import java.util.zip.ZipInputStream
import javax.xml.parsers.DocumentBuilderFactory
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.w3c.dom.Element
import scala.collection.mutable

/**
 * S2 ingest (SURVEY §2.1): XLSX dashboard extracts read as all-string
 * tables with provenance — the reference ingests 4 XLSX dashboard files
 * per PHL run (docs/notebooks/phl.Rmd:113-236) and accepts xlsx template
 * submissions (docs/notebooks/template_submitters.Rmd:236-242), reading
 * every column as text.
 *
 * The parser is a minimal OOXML reader over the JDK only (java.util.zip +
 * DOM): workbook.xml + rels resolve the sheet, sharedStrings.xml resolves
 * t="s" cells, inline strings and raw numeric text pass through. No
 * styles/date coercion — all-string semantics, like the CSV path.
 *
 * Scale shape: files are distributed via `binaryFiles` and parsed ON THE
 * EXECUTORS (one workbook per task — dashboards are MB-scale documents,
 * bounded by design), then land in the same all-string + `_provenance`
 * frame as [[StringCsv.read]], so every downstream operator is shared.
 */
object Xlsx {

  // ------------------------------------------------------------ XML utils

  private def parseXml(bytes: Array[Byte]): Element = {
    val f = DocumentBuilderFactory.newInstance()
    f.setNamespaceAware(false)
    // hardening: no DTDs / external entities in workbook parts
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.newDocumentBuilder().parse(new ByteArrayInputStream(bytes)).getDocumentElement
  }

  private def children(e: Element, local: String): Seq[Element] = {
    val nl = e.getElementsByTagName("*")
    (0 until nl.getLength).map(nl.item(_).asInstanceOf[Element])
      .filter(el => localName(el) == local)
  }

  private def localName(e: Element): String = {
    val n = e.getTagName
    val i = n.indexOf(':')
    if (i >= 0) n.substring(i + 1) else n
  }

  /** Concatenated text of every <t> descendant (rich-text runs). */
  private def siText(e: Element): String =
    children(e, "t").map(_.getTextContent).mkString

  /** "BC" in "BC12" -> 0-based column index 54. */
  private[graft] def colIndex(cellRef: String): Int = {
    var i = 0
    var acc = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      acc = acc * 26 + (cellRef.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    acc - 1
  }

  // ------------------------------------------------------------ zip walk

  /** Read all zip entries into memory (workbooks are MB-scale parts). */
  private def zipEntries(in: InputStream): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(in)
    val out = mutable.Map[String, Array[Byte]]()
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out(e.getName) = zin.readAllBytes()
      zin.closeEntry()
      e = zin.getNextEntry
    }
    out.toMap
  }

  // ------------------------------------------------------------ sheet read

  /**
   * Parse one sheet of a workbook into dense string rows (None cells =
   * absent/empty). `sheet` = None -> first sheet in workbook order.
   */
  def parseSheet(in: InputStream, sheet: Option[String] = None): Seq[Seq[Option[String]]] = {
    val parts = zipEntries(in)
    def part(name: String): Option[Element] = parts.get(name).map(parseXml)

    val shared: IndexedSeq[String] = part("xl/sharedStrings.xml")
      .map(root => children(root, "si").map(siText).toIndexedSeq)
      .getOrElse(IndexedSeq.empty)

    val wb = part("xl/workbook.xml").getOrElse(
      throw new IllegalArgumentException("not an xlsx: missing xl/workbook.xml"))
    val sheets = children(wb, "sheet")
    val chosen = sheet match {
      case Some(name) => sheets.find(_.getAttribute("name") == name).getOrElse(
        throw new IllegalArgumentException(s"sheet '$name' not found"))
      case None => sheets.headOption.getOrElse(
        throw new IllegalArgumentException("workbook has no sheets"))
    }
    val rid = chosen.getAttribute("r:id")
    val target = part("xl/_rels/workbook.xml.rels")
      .flatMap(root => children(root, "Relationship")
        .find(_.getAttribute("Id") == rid)
        .map(_.getAttribute("Target")))
      .getOrElse(s"worksheets/sheet1.xml")
    val sheetPath = if (target.startsWith("/")) target.drop(1) else s"xl/$target"
    val ws = part(sheetPath).getOrElse(
      throw new IllegalArgumentException(s"missing sheet part $sheetPath"))

    children(ws, "row").map { row =>
      val cells = children(row, "c").flatMap { c =>
        val idx = colIndex(c.getAttribute("r"))
        val t = c.getAttribute("t")
        val v: Option[String] = t match {
          case "s" => children(c, "v").headOption
            .map(v => shared(v.getTextContent.trim.toInt))
          case "inlineStr" => children(c, "is").headOption.map(siText)
          case _ => children(c, "v").headOption.map(_.getTextContent)
        }
        v.filter(_.nonEmpty).map(idx -> _)
      }
      if (cells.isEmpty) Seq.empty
      else {
        val width = cells.map(_._1).max + 1
        val arr = Array.fill[Option[String]](width)(None)
        cells.foreach { case (i, v) => arr(i) = Some(v) }
        arr.toSeq
      }
    }
  }

  // ------------------------------------------------------------ Spark read

  /**
   * Read XLSX files into one all-string DataFrame with `_provenance`,
   * first sheet row = header, columns matched to the declared schema BY
   * NAME (per-file column order may differ; missing columns read null —
   * the Q3 validation battery flags them). Same NA-token normalization as
   * the CSV path.
   */
  def read(spark: SparkSession, schema: StructType, paths: Seq[String],
      sheet: Option[String] = None,
      naTokens: Seq[String] = graft.model.Schemas.naTokens): DataFrame = {
    val fields = schema.fieldNames.toSeq
    val rows = spark.sparkContext
      .binaryFiles(paths.mkString(","))
      .flatMap { case (path, pds) =>
        val all = parseSheet(pds.open(), sheet)
        all.headOption.toSeq.flatMap { header =>
          val pos: Map[String, Int] = header.zipWithIndex
            .collect { case (Some(h), i) => h -> i }.toMap
          val idx = fields.map(pos.get)
          all.drop(1).filter(_.nonEmpty).map { r =>
            Row.fromSeq(idx.map(_.flatMap(i =>
              if (i < r.length) r(i) else None).orNull) :+ path)
          }
        }
      }
    val full = StructType(
      schema.fields :+ StructField("_provenance", StringType, nullable = false))
    val df = spark.createDataFrame(rows, full)
    val naSet = naTokens.filter(_.nonEmpty)
    fields.foldLeft(df)((d, c) =>
      d.withColumn(c, when(col(c).isin(naSet: _*), lit(null)).otherwise(col(c))))
  }
}
