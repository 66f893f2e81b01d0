package graft

import graft.functions.GraftFunctions._
import org.apache.spark.sql.functions._

/** F1–F14 scalar library (SURVEY §2.7) unit coverage, incl. the
  * annihilate order-sensitivity edge cases (SURVEY §7.4#3). */
class GraftFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def oneString(c: org.apache.spark.sql.Column, input: String): String =
    Seq(input).toDF("x").select(c.as("y")).as[String].head()

  test("annihilate: strip specials, trim, drop trailing initial, no spaces, upper") {
    assert(oneString(annihilate(col("x")), "O'Brien-Smith jr") === "OBRIENSMITHJR")
    // trailing single-letter initial dropped (after trim)
    assert(oneString(annihilate(col("x")), "John Q") === "JOHN")
    // trim BEFORE initial-strip: trailing spaces must not protect the initial
    assert(oneString(annihilate(col("x")), "John Q  ") === "JOHN")
    // inner single letters survive (only trailing is dropped)
    assert(oneString(annihilate(col("x")), "A B C") === "AB")
    assert(oneString(annihilate(col("x")), "mary-jane  watson") === "MARYJANEWATSON")
    assert(oneString(annihilate(col("x")), "") === "")
  }

  test("excelDate: serial days since 1899-12-30") {
    val d = Seq("45000").toDF("x").select(excelDate(col("x")).cast("string").as("y"))
      .as[String].head()
    assert(d === "2023-03-15")
    // the classic check: serial 1 = 1899-12-31
    val d1 = Seq("1").toDF("x").select(excelDate(col("x")).cast("string").as("y"))
      .as[String].head()
    assert(d1 === "1899-12-31")
  }

  test("parseAnyDate: US, ISO, Excel serial, and garbage") {
    val rows = Seq("3/15/2023", "2023-03-15", "45000", "03/05/2023", "garbage")
      .toDF("x").select(parseAnyDate(col("x")).cast("string").as("y"))
      .as[String].collect().toSeq
    assert(rows(0) === "2023-03-15")
    assert(rows(1) === "2023-03-15")
    assert(rows(2) === "2023-03-15")
    assert(rows(3) === "2023-03-05")
    assert(rows(4) === null)
  }

  test("usFormat canonical MM/dd/yyyy") {
    val s = Seq("2023-03-05").toDF("x")
      .select(usFormat(col("x").cast("date")).as("y")).as[String].head()
    assert(s === "03/05/2023")
  }

  test("withinDays inclusive tolerance") {
    val df = Seq(("2023-01-01", "2023-01-15"), ("2023-01-01", "2023-01-16"))
      .toDF("a", "b")
      .select(withinDays(col("a").cast("date"), col("b").cast("date"), 14).as("ok"))
    assert(df.as[Boolean].collect().toSeq === Seq(true, false))
  }

  test("blankAsNull") {
    val rows = Seq("  ", "", "x ").toDF("x")
      .select(blankAsNull(col("x")).as("y")).collect()
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0) && rows(2).getString(0) === "x")
  }

  test("stripGisaidPrefix") {
    assert(oneString(stripGisaidPrefix(col("x")), "hCoV-19/USA/WA-X/2021") === "USA/WA-X/2021")
    assert(oneString(stripGisaidPrefix(col("x")), "USA/WA-X/2021") === "USA/WA-X/2021")
  }

  test("lineageNote templated text with injected run date") {
    val s = Seq("BA.5").toDF("x")
      .select(lineageNote(col("x"), to_date(lit("2023-03-05"))).as("y")).as[String].head()
    assert(s === "Lineage identified as BA.5 on 3/5/2023. Lineage assignments may change over time.")
  }

  test("rowSum null-safe horizontal sum") {
    val df = Seq((Some(1), Some(0), None: Option[Int]), (None, None, None))
      .toDF("a", "b", "c")
      .select(rowSum(Seq(col("a"), col("b"), col("c"))).as("s"))
    assert(df.as[Int].collect().toSeq === Seq(1, 0))
  }

  test("date shape detectors") {
    assert(Seq("2023-1-5").toDF("x").select(looksIsoDate(col("x"))).as[Boolean].head())
    assert(Seq("1/5/2023").toDF("x").select(looksUsDate(col("x"))).as[Boolean].head())
    assert(Seq("45000").toDF("x").select(looksExcelSerial(col("x"))).as[Boolean].head())
    assert(!Seq("123").toDF("x").select(looksExcelSerial(col("x"))).as[Boolean].head())
  }
}
