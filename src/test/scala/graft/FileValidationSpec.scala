package graft

import java.io.File
import java.nio.file.Files
import graft.qa.FileValidation
import graft.sources.StringCsv
import org.apache.spark.sql.functions._

/** Q3 file-level validation battery (template_submitters.Rmd:394-538):
  * header set+order check over raw files, per-submitter GISAID x status
  * consistency, vocab/date checks, and whole-file routing. */
class FileValidationSpec extends SparkSpec {
  import spark.implicits._

  private val cols = Seq("GISAID_ID", "SEQUENCE_STATUS", "SUBMITTING_LAB",
    "SEQUENCE_REASON", "SPECIMEN_COLLECTION_DATE", "PANGO_LINEAGE")
  private val dir = Files.createTempDirectory("q3_spec").toFile

  private def writeCsv(name: String, header: Seq[String], rows: Seq[Seq[String]]): File = {
    val f = new File(dir, name)
    f.getParentFile.mkdirs()
    val text = (header +: rows).map(_.mkString(",")).mkString("\n")
    Files.write(f.toPath, text.getBytes("UTF-8"))
    f
  }

  // Aegis file: fully valid (id matches ^ASC\d*-B.* when COMPLETE, absent
  // when FAILED)
  private val good = writeCsv("Submissions/Aegis/good.csv", cols, Seq(
    Seq("ASC123-B.1", "COMPLETE", "Aegis", "SENTINEL SURVEILLANCE", "01-15-2021", "B.1.1.7"),
    Seq("", "FAILED", "Aegis", "OUTBREAK", "2021-01-16", "B.1.1.7")))
  // Aegis file: GISAID present on a FAILED row -> gisaid_ok false; plus a
  // bad date shape
  private val bad = writeCsv("Submissions/Aegis/bad.csv", cols, Seq(
    Seq("ASC9-B.1", "FAILED", "Aegis", "OUTBREAK", "Jan 15, 2021", "B.1.1.7")))
  // wrong header ORDER (same set) -> format check fails
  private val shuffled = writeCsv("Submissions/Aegis/shuffled.csv",
    cols.reverse, Seq(
      Seq("B.1.1.7", "01-15-2021", "OUTBREAK", "Aegis", "COMPLETE", "ASC1-B.1")))

  private val labs = Seq("Aegis", "Helix")
  private val reasons = Seq("SENTINEL SURVEILLANCE", "OUTBREAK")
  private val statuses = Seq("COMPLETE", "LOW QUALITY", "FAILED")
  private val lineages = Seq("B.1.1.7")

  test("headerCheck: exact set AND order of the template header") {
    val hc = FileValidation.headerCheck(spark,
      Seq(good.getPath, bad.getPath, shuffled.getPath), cols)
    val m = hc.select("_provenance", "format_ok").as[(String, Boolean)]
      .collect().map { case (p, ok) => new File(p).getName -> ok }.toMap
    assert(m("good.csv"))
    assert(m("bad.csv"))
    assert(!m("shuffled.csv"))
  }

  test("validate: per-file verdicts fold row violations; Aegis regex enforced") {
    val df = StringCsv.read(spark, StringCsv.allStringSchema(cols),
      Seq(good.getPath, bad.getPath))
    val v = FileValidation.validate(df,
      labValues = labs, reasonValues = reasons,
      statusValues = statuses, lineageValues = lineages)
    val m = v.collect().map(r =>
      new File(r.getAs[String]("_provenance")).getName -> r).toMap
    val g = m("good.csv")
    assert(g.getAs[Boolean]("valid"))
    val b = m("bad.csv")
    assert(!b.getAs[Boolean]("gisaid_ok"))     // id on a FAILED row
    assert(!b.getAs[Boolean]("coll_date_ok"))  // 'Jan 15, 2021'
    assert(b.getAs[Boolean]("lab_ok") && b.getAs[Boolean]("status_ok"))
    assert(!b.getAs[Boolean]("valid"))
  }

  test("route: whole files withheld on any failed check") {
    val df = StringCsv.read(spark, StringCsv.allStringSchema(cols),
      Seq(good.getPath, bad.getPath))
    val v = FileValidation.validate(df,
      labValues = labs, reasonValues = reasons,
      statusValues = statuses, lineageValues = lineages)
    val (ok, stopped) = FileValidation.route(df, v)
    assert(ok.count() === 2 && stopped.count() === 1)
    assert(stopped.select("_provenance").as[String].head().contains("bad"))
  }

  test("excel-serial and ISO dates pass the shape check") {
    val df = Seq(
      ("f1", "44000"), ("f1", "2021-01-15"), ("f1", "1/5/2021"))
      .toDF("_provenance", "SPECIMEN_COLLECTION_DATE")
      .withColumn("GISAID_ID", lit(null).cast("string"))
      .withColumn("SEQUENCE_STATUS", lit("FAILED"))
      .withColumn("SUBMITTING_LAB", lit("Aegis"))
      .withColumn("SEQUENCE_REASON", lit("OUTBREAK"))
      .withColumn("PANGO_LINEAGE", lit("B.1.1.7"))
    val v = FileValidation.validate(df,
      labValues = labs, reasonValues = reasons,
      statusValues = statuses, lineageValues = lineages)
    assert(v.select("coll_date_ok").as[Boolean].head())
  }
}
