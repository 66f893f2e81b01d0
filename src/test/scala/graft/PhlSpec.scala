package graft

import graft.pipelines.Phl
import org.apache.spark.sql.functions._

/** PHL pipeline e2e (SURVEY §3.2): normalization, enrichment coalesce,
  * fallback match, reason map, lineage cascade, processed-list dedup. */
class PhlSpec extends SparkSpec {
  import spark.implicits._

  private val dashboard = Seq(
    // s1: plain complete, matches wdrs on specimen_id
    ("s1", "a1", "COMPLETED {1822}", "SENTINEL", "B.1.1.7", "Ann", "Ash", "1980-01-01"),
    // s2: needs epi names, matches only via accession fallback
    ("s2", "a2", "COMPLETE", "OTHER", null, null, null, null),
    // s3: PT row -> dropped
    ("s3", "a3", "COMPLETE", "PT", "B.1", "Cal", "Cox", "1982-02-02"),
    // s4: pending -> dropped by status filter
    ("s4", "a4", "PENDING", "OTHER", "B.1", "Dee", "Dow", "1983-03-03"),
    // s5: already processed -> dropped
    ("s5", "a5", "COMPLETE", "OTHER", "B.1", "Eve", "Elm", "1984-04-04"),
    // s6: FAILED with None lineage -> Unassigned, repository null
    ("s6", "a6", "FAILED", "OTHER", "None", "Fay", "Fir", "1985-05-05"),
    // s7: COMPLETE with None lineage -> LOW QUALITY cascade
    ("s7", "a7", "COMPLETE", "OTHER", "None", "Gus", "Gum", "1986-06-06"))
    .toDF("specimen_id", "accession_id", "status", "reason", "lineage",
      "first_name", "last_name", "dob")

  private val redcap = Seq(("s1", "sentinel_project")).toDF("specimen_id", "project")
  private val epi = Seq(("s2", "Bob", "Bee", "1981-01-01"))
    .toDF("specimen_id", "first_name", "last_name", "dob")
  private val wdrs = Seq((201L, "s1"), (202L, "a2"), (205L, "s5"), (206L, "s6"), (207L, "s7"))
    .toDF("case_id", "wdrs_key")
  private val reasonMap = Seq(("SENTINEL", "SENTINEL SURVEILLANCE"), ("OTHER", "OTHER"))
    .toDF("input", "output")
  private val processed = Seq("s5").toDF("specimen_id")

  private lazy val out = Phl.run(dashboard, redcap, epi, wdrs, reasonMap, processed)

  test("filters: PT, non-COMPLETE/FAILED, and processed specimens dropped") {
    val ids = out.select("specimen_id").as[String].collect().toSet
    assert(ids === Set("s1", "s2", "s6", "s7"))
  }

  test("status normalization and redcap reason override") {
    val s1 = out.filter(col("specimen_id") === "s1")
      .select("status", "reason", "case_id").as[(String, String, Long)].head()
    assert(s1 === (("COMPLETE", "SENTINEL SURVEILLANCE", 201L)))
  }

  test("epi coalesce fills names; fallback join matches on accession") {
    val s2 = out.filter(col("specimen_id") === "s2")
      .select("first_name", "last_name", "case_id").as[(String, String, Long)].head()
    assert(s2 === (("Bob", "Bee", 202L)))
  }

  test("lineage cascade: None->Unassigned, COMPLETE->LOW QUALITY, FAILED repo null") {
    val m = out.select("specimen_id", "lineage", "status", "repository")
      .as[(String, String, String, Option[String])].collect()
      .map(r => r._1 -> r).toMap
    assert(m("s6") === (("s6", "Unassigned", "FAILED", None)))
    assert(m("s7") === (("s7", "Unassigned", "LOW QUALITY", Some("GISAID"))))
    // NULL lineage is NOT "None": stays null, no LOW QUALITY cascade
    // (phl.Rmd:713-718 — R's if_else passes NA through)
    val s2 = out.filter(col("specimen_id") === "s2")
      .select("lineage", "status", "repository")
      .as[(Option[String], String, Option[String])].head()
    assert(s2 === ((None, "COMPLETE", Some("GISAID"))))
  }
}
