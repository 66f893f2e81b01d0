package graft

import graft.model.Schemas
import graft.pipelines.Sgtf
import org.apache.spark.sql.functions._

/** SGTF / S-dropout pipeline: REDCap demographic arm, surveillance
  * accession arm, review routing, roster contract, and the template
  * second pass (closest-date + perfect-match split). */
class SgtfSpec extends SparkSpec {
  import spark.implicits._

  private def wdrs = Seq(
    // CASE_ID, NAME_WDRS, DOB_WDRS, COLLECTION_DATE_WDRS, SpecimenId
    ("C1", "JOHN_SMITH", "1980-01-01", "2021-03-10", "ACC-1"),
    ("C2", "JANE_DOE", "1990-05-05", "2021-03-01", "ACC-2"),
    ("C3", "JANE_DOE", "1990-05-05", "2021-03-02", "ACC-3"), // same person, 2nd case
    ("C4", "AL_WU", "1975-07-07", "2021-03-15", "ACC-4"))
    .toDF("CASE_ID", "NAME_WDRS", "DOB_WDRS", "COLLECTION_DATE_WDRS", "SpecimenId")
    .withColumn("DOB_WDRS", to_date(col("DOB_WDRS")))
    .withColumn("COLLECTION_DATE_WDRS", to_date(col("COLLECTION_DATE_WDRS")))

  test("REDCap arm: exact demo match, 14-day + Ct gates, ambiguity to review") {
    val redcap = Seq(
      // perfect match -> C1
      ("John", "Smith!", "1980-01-01", "2021-03-12", "R1", 20.0, 21.0),
      // matches TWO WDRS records (C2+C3 share name+dob, both in window) -> review
      ("Jane", "Doe", "1990-05-05", "2021-03-01", "R2", 18.0, 19.0),
      // date too far (>14d from C4's 2021-03-15) -> review
      ("Al", "Wu", "1975-07-07", "2021-06-01", "R3", 20.0, 20.0),
      // Ct too high -> review
      ("John", "Smith", "1980-01-01", "2021-03-11", "R4", 35.0, 20.0),
      // no demographic match at all -> review
      ("No", "Body", "2000-02-02", "2021-03-12", "R5", 20.0, 20.0))
      .toDF("FirstName", "LastName", "BirthDate", "CollectionDate",
        "AccessionNumber", "NGENE", "ORF1ab")
    val prepped = Sgtf.prepRedcap(redcap)
    val matched = Sgtf.redcapWdrsMatch(prepped, wdrs)
    assert(matched.select("AccessionNumber").as[String].collect().toSet === Set("R1"))
    assert(matched.select("CASE_ID").as[String].head() === "C1")
    val review = Sgtf.unmatchedForReview(prepped, matched, "AccessionNumber")
    assert(review.select("AccessionNumber").as[String].collect().toSet ===
      Set("R2", "R3", "R4", "R5"))
  }

  test("surveillance arm: S-dropout filter + accession match") {
    val surveillance = Seq(
      ("ACC-1", "2021-03-11", "S-Dropout", "0", 20.0, 21.0),  // match -> C1
      ("ACC-4", "2021-03-15", "S-DROPOUT", "-", 35.0, 20.0),  // NGene too high
      ("ACC-2", "2021-03-01", "OTHER", "", 20.0, 20.0),       // wrong reason
      ("ACC-9", "2021-03-01", "S-DROPOUT", "", 20.0, 20.0))   // no WDRS accession
      .toDF("AccessionId", "CollectionDate", "Reason", "SGene", "NGene", "ORF1ab")
    val dropouts = Sgtf.surveillanceSDropouts(surveillance)
    assert(dropouts.select("AccessionId").as[String].collect().toSet ===
      Set("ACC-1", "ACC-9"))
    val matched = Sgtf.surveillanceWdrsMatch(dropouts, wdrs)
    assert(matched.select("CASE_ID").as[String].collect().toSet === Set("C1"))
    val review = Sgtf.unmatchedForReview(dropouts, matched, "AccessionId")
    assert(review.select("AccessionId").as[String].collect().toSet === Set("ACC-9"))
  }

  test("recentOnly keeps post-watermark uploads only") {
    val df = Seq(("a", "2021-03-01 10:00:00"), ("b", "2021-03-05 10:00:00"))
      .toDF("id", "UploadedDate")
    val recent = Sgtf.recentOnly(df, to_timestamp(col("UploadedDate")),
      to_timestamp(lit("2021-03-03 00:00:00")))
    assert(recent.select("id").as[String].collect().toSeq === Seq("b"))
  }

  test("sgtfRoster emits the 17-column contract with only the flag set") {
    val roster = Sgtf.sgtfRoster(Seq("C1", "C2").toDF("CASE_ID"))
    assert(roster.columns.toSeq === Schemas.rosterColumns)
    assert(roster.select("SEQUENCE_SGTF").as[String].collect().toSet === Set("Yes"))
    assert(roster.select("SEQUENCE_ACCESSION").filter(col("SEQUENCE_ACCESSION").isNotNull).count() === 0)
  }

  test("second pass: closest date per row (null-group kept), perfect split, dup accession to review") {
    // rowid 10: two candidates, distances 2 and 9 -> keep distance 2 only
    // rowid 20: all-null distances -> both kept by closest-date, then
    //           dropped by the perfect filter (distance unknown)
    // rowid 30/31: same LAB_ACCESSION_ID maps to two cases -> review
    val dobMatch = Seq(
      (10L, "L1", "C1", "2021-03-10", "2021-03-12", 0),
      (10L, "L1", "C2", "2021-03-10", "2021-03-19", 0),
      (20L, "L2", "C3", null, "2021-03-12", 1),
      (20L, "L2", "C4", null, "2021-03-13", 1),
      (30L, "L3", "C1", "2021-04-01", "2021-04-02", 0),
      (31L, "L3", "C2", "2021-04-01", "2021-04-02", 0))
      .toDF("rowid", "LAB_ACCESSION_ID", "CASE_ID",
        "SPECIMEN_COLLECTION_DATE", "COLLECTION_DATE_WDRS", "distance")
      .withColumn("COLLECTION_DATE_WDRS", to_date(col("COLLECTION_DATE_WDRS")))
    val (matched, review) = Sgtf.secondPass(dobMatch)
    assert(matched.select("CASE_ID").as[String].collect().toSet === Set("C1"))
    assert(matched.filter(col("rowid") === 10L)
      .select("COLLECTION_DATE_DISTANCE").as[Int].head() === 2)
    assert(review.select("CASE_ID").as[String].collect().toSet === Set("C1", "C2"))
    assert(review.select("LAB_ACCESSION_ID").as[String].collect().toSet === Set("L3"))
  }

  test("capstone: both arms -> union -> roster -> chunked CSV") {
    val redcap = Sgtf.prepRedcap(Seq(
      ("John", "Smith", "1980-01-01", "2021-03-12", "R1", 20.0, 21.0))
      .toDF("FirstName", "LastName", "BirthDate", "CollectionDate",
        "AccessionNumber", "NGENE", "ORF1ab"))
    val surveillance = Sgtf.surveillanceSDropouts(Seq(
      ("ACC-4", "2021-03-16", "S-DROPOUT", "0", 20.0, 20.0))
      .toDF("AccessionId", "CollectionDate", "Reason", "SGene", "NGene", "ORF1ab"))
    val matched = Sgtf.redcapWdrsMatch(redcap, wdrs).select("CASE_ID")
      .unionByName(Sgtf.surveillanceWdrsMatch(surveillance, wdrs).select("CASE_ID"))
      .distinct()
    val roster = Sgtf.sgtfRoster(matched)
    val dir = java.nio.file.Files.createTempDirectory("graft_sgtf_e2e").toString
    graft.sinks.RosterSink.writeChunked(roster, dir, Seq("CASE_ID"), maxRows = 500)
    val back = spark.read.option("header", "true").csv(dir)
    assert(back.count() === 2) // C1 (redcap) + C4 (surveillance)
    assert(back.select("SEQUENCE_SGTF").as[String].collect().toSet === Set("Yes"))
    assert(back.columns.length === graft.model.Schemas.rosterColumns.length + 1) // + _chunk
  }

  test("withoutCurrentSgtf drops cases already flagged in FLATTENED") {
    val dobMatch = Seq(("C1", "L1"), ("C2", "L2")).toDF("CASE_ID", "LAB_ACCESSION_ID")
    val flattened = Seq(("C1", "Yes"), ("C2", "No"))
      .toDF("CASE_ID", "SEQUENCE_SGTF")
    val kept = Sgtf.withoutCurrentSgtf(dobMatch, flattened)
    assert(kept.select("CASE_ID").as[String].collect().toSeq === Seq("C2"))
  }
}
