package graft

import graft.model.Schemas
import graft.pipelines.RosterCompile
import graft.qa.DupResolution
import org.apache.spark.sql.functions._

/** Q6 decision tree + RosterCompile downstream stage. */
class DupResolutionSpec extends SparkSpec {
  import spark.implicits._

  test("grade: unique / same_case / cross_case") {
    val df = Seq(
      ("sa1", 1L), ("sa2", 2L), ("sa2", 2L), ("sa3", 3L), ("sa3", 4L))
      .toDF("sa", "case_id")
    val graded = DupResolution.grade(df, col("sa"), col("case_id"))
      .select("sa", "case_id", "dup_grade").as[(String, Long, String)]
      .collect().toSet
    assert(graded === Set(
      ("sa1", 1L, "unique"),
      ("sa2", 2L, "same_case"), ("sa2", 2L, "same_case"),
      ("sa3", 3L, "cross_case"), ("sa3", 4L, "cross_case")))
  }

  test("resolve: survivor kept, same-case dup removed, cross-case to review") {
    val df = Seq(
      ("sa1", 1L, "r1"), ("sa2", 2L, "r2"), ("sa2", 2L, "r3"),
      ("sa3", 3L, "r4"), ("sa3", 4L, "r5"))
      .toDF("sa", "case_id", "rid")
    val out = DupResolution.resolve(df, col("sa"), col("case_id"),
        order = Seq(col("rid")))
      .select("rid", "resolution").as[(String, String)].collect().toMap
    assert(out === Map(
      "r1" -> "roster", "r2" -> "roster", "r3" -> "remove",
      "r4" -> "manual_review", "r5" -> "manual_review"))
  }

  test("RosterCompile: union, EPI_ISL enrich, reason fill, contract, chunks") {
    def mkRoster(caseId: String, acc: String, lab: String,
        reason: Option[String]): org.apache.spark.sql.DataFrame = {
      val base = Seq((caseId, acc, lab, reason.orNull))
        .toDF("CASE_ID", "SEQUENCE_ACCESSION", "SEQUENCE_LAB", "SEQUENCE_REASON")
      Schemas.rosterColumns.foldLeft(base)((d, c) =>
        if (d.columns.contains(c)) d
        else d.withColumn(c, lit(null).cast("string")))
        .select(Schemas.rosterCols: _*)
    }
    val r1 = mkRoster("1", "USA/WA-1/2021", "LabA", None)
    val r2 = mkRoster("2", "USA/WA-2/2021", "LabB", Some("OUTBREAK"))
    val gisaid = Seq(("USA/WA-1/2021", "EPI_ISL_111")).toDF("virus_name", "epi_isl")
    val labDefaults = Seq(("LabA", "SENTINEL SURVEILLANCE")).toDF("lab", "default_reason")

    val out = RosterCompile.run(Seq(r1, r2), gisaid, labDefaults, maxRows = 500)
    assert(out.columns.take(17).toSeq === Schemas.rosterColumns)
    val m = out.select("CASE_ID", "SEQUENCE_EPI_ISL", "SEQUENCE_REASON", "_chunk")
      .as[(String, Option[String], String, Int)].collect().map(r => r._1 -> r).toMap
    assert(m("1") === (("1", Some("EPI_ISL_111"), "SENTINEL SURVEILLANCE", 1)))
    assert(m("2") === (("2", None, "OUTBREAK", 1)))
  }

  test("contract gate throws on wrong column order") {
    val bad = Seq(("1", "x")).toDF("SEQUENCE_SGTF", "CASE_ID")
    intercept[IllegalArgumentException] {
      RosterCompile.enforceContract(bad)
    }
  }
}
