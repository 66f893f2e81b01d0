package graft

import graft.pipelines.{Elr, Lineages}
import org.apache.spark.sql.functions._

/** Lineage-notes transform: parse defects, shape gate, status dedup with
  * Withdrawn priority, and withdrawn-alias resolution through the F9
  * validation path. */
class LineagesSpec extends SparkSpec {
  import spark.implicits._

  // the pango lineage_notes shape, including its known defects: header
  // row, '*' withdrawn markers, a space where the tab belongs, duplicate
  // rows, and one lineage carrying both statuses
  private val rawLines = Seq(
    "Lineage\tDescription",
    "A\tRoot lineage",
    "B.1\tA common lineage",
    "B.1\tA common lineage",                            // exact dup
    "*B.1.1.523\tWithdrawn: Reassigned to B.1.1.529",   // alias -> active
    "B.1.1.529\tOmicron",
    "*B.9\tWithdrawn: no successor named",
    "B.2 stray space not tab",                          // space defect
    "C.1\tActive description",
    "*C.1\tWithdrawn: problematic",                     // both statuses
    "",                                                 // empty row
    "XE\tRecombinant lineage").toDF("line")

  private def parsed = Lineages.parseNotes(rawLines, "line")

  test("parseNotes: header/empty dropped, * stripped, space defect trimmed") {
    val rows = parsed
      .select("lineage_extracted", "status")
      .as[(String, String)].collect().toSet
    assert(rows.contains(("B.1.1.523", "Withdrawn")))
    assert(rows.contains(("B.2", "Active")))  // first token of the defect line
    assert(rows.contains(("XE", "Active")))
    assert(!rows.exists(_._1 == "Lineage"))   // header gone
    assert(!rows.exists(_._1.contains("*")))  // markers stripped
    assert(Lineages.violations(parsed).count() === 0)
  }

  test("violations flags lineage-shape failures (the abort gate)") {
    val bad = Seq("b.1\tlowercase", "B..2\tdouble dot").toDF("line")
    val v = Lineages.violations(Lineages.parseNotes(bad, "line"))
      .select("lineage_extracted").as[String].collect().toSet
    assert(v === Set("b.1", "B..2"))
  }

  test("dedupe: one row per (lineage,status); Withdrawn wins a status tie") {
    val d = Lineages.dedupe(parsed)
    assert(d.filter(col("lineage_extracted") === "B.1").count() === 1)
    val c1 = d.filter(col("lineage_extracted") === "C.1")
      .select("status").as[String].collect().toSeq
    assert(c1 === Seq("Withdrawn")) // the duplicated Active row is gone
  }

  test("withdrawnAliases: named successors only") {
    // B.9 ("no successor named") and C.1 ("problematic") carry no
    // lineage-shaped token in their descriptions -> no alias rows
    val a = Lineages.withdrawnAliases(Lineages.dedupe(parsed))
      .as[(String, String)].collect().toMap
    assert(a === Map("B.1.1.523" -> "B.1.1.529"))
  }

  test("vocabulary: active self-maps, withdrawn alias maps to its target") {
    val v = Lineages.vocabulary(Lineages.dedupe(parsed))
      .as[(String, String)].collect().toMap
    assert(v("B.1") === "B.1")
    assert(v("B.1.1.523") === "B.1.1.529")  // alias expanded
    assert(!v.contains("B.9"))               // withdrawn, no successor
    assert(!v.contains("C.1"))               // withdrawn, target inactive
  }

  test("F9 resolves a withdrawn alias to its replacement") {
    val records = Seq(
      (1, "SARS-CoV-2 B.1.1.523 lineage detected"),  // withdrawn alias
      (2, "SARS-CoV-2 B.1.1.529 lineage detected"),  // active direct
      (3, "SARS-CoV-2 B.9 lineage detected"))        // withdrawn, dead end
      .toDF("id", "test_result")
    val out = Elr.extractLineageResolved(records,
        Lineages.vocabulary(Lineages.dedupe(parsed)))
      .select("id", "lineage").as[(Int, Option[String])].collect().toMap
    assert(out(1) === Some("B.1.1.529"))  // resolved through the alias
    assert(out(2) === Some("B.1.1.529"))
    assert(out(3) === None)
  }
}
