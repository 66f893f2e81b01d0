package graft

import graft.pipelines.KeepNaRefresh
import org.apache.spark.sql.functions._

/** keep_na second pass: normalization, CASE_ID refresh with the 14-day
  * gate, lineage/status/date refresh precedence, graduation split. */
class KeepNaRefreshSpec extends SparkSpec {
  import spark.implicits._

  private val cdcLabs = Seq("Helix", "Labcorp")

  test("normalize: reason fill, lab canon, date parse, GISAID_ID prefix") {
    val kn = Seq(
      ("AEGIS SCIENCES", null, "2021-3-5", "USA/WA-X/2021"),
      ("Helix", null, "3/5/2021", "hCoV-19/USA/WA-Y/2021"),
      ("PHL", "outbreak", "44261", "EPI_X"))
      .toDF("SEQUENCE_LAB", "SEQUENCE_REASON",
        "SEQUENCE_SPECIMEN_COLLECTION_DATE", "SEQUENCE_ACCESSION")
    val out = KeepNaRefresh.normalize(kn, cdcLabs)
      .select("SEQUENCE_LAB", "SEQUENCE_REASON",
        "SEQUENCE_SPECIMEN_COLLECTION_DATE", "GISAID_ID")
      .as[(String, Option[String], String, String)].collect().toSet
    assert(out === Set(
      ("Aegis", None, "03/05/2021", "hCoV-19/USA/WA-X/2021"),
      ("Helix", Some("SENTINEL SURVEILLANCE"), "03/05/2021", "hCoV-19/USA/WA-Y/2021"),
      ("PHL", Some("OUTBREAK"), "03/06/2021", "EPI_X")))
  }

  test("refreshCaseId: fills only null CASE_ID within the 14-day window; null SCA never matches") {
    val kn = Seq(
      (null, "SCA1", "03/05/2021"),   // match, in window -> adopt C9
      (null, "SCA2", "03/05/2021"),   // match, out of window -> stay null
      ("C1", "SCA1", "03/05/2021"),   // already has an id -> keep C1
      (null, null, "03/05/2021"))     // null key never matches
      .toDF("CASE_ID", "SEQUENCE_CLINICAL_ACCESSION",
        "SEQUENCE_SPECIMEN_COLLECTION_DATE")
    val wdrs = Seq(
      ("SCA1", "C9", "2021-03-10"), ("SCA2", "C8", "2021-06-01"))
      .toDF("SEQUENCE_CLINICAL_ACCESSION", "CASE_ID", "COLLECTION_DATE")
      .withColumn("COLLECTION_DATE", to_date(col("COLLECTION_DATE")))
    val out = KeepNaRefresh.refreshCaseId(kn, wdrs)
      .select("SEQUENCE_CLINICAL_ACCESSION", "CASE_ID")
      .as[(Option[String], Option[String])].collect().toSet
    assert(out === Set(
      (Some("SCA1"), Some("C9")), (Some("SCA2"), None),
      (Some("SCA1"), Some("C1")), (None, None)))
  }

  test("refreshCaseId: duplicate WDRS rows per accession do not fan out the record") {
    val kn = Seq((null.asInstanceOf[String], "SCA3", "03/05/2021"))
      .toDF("CASE_ID", "SEQUENCE_CLINICAL_ACCESSION",
        "SEQUENCE_SPECIMEN_COLLECTION_DATE")
    // two specimen rows for the same clinical accession — earliest
    // collection date (then min case id) wins deterministically
    val wdrs = Seq(
      ("SCA3", "C7", "2021-03-08"), ("SCA3", "C5", "2021-03-06"))
      .toDF("SEQUENCE_CLINICAL_ACCESSION", "CASE_ID", "COLLECTION_DATE")
      .withColumn("COLLECTION_DATE", to_date(col("COLLECTION_DATE")))
    val out = KeepNaRefresh.refreshCaseId(kn, wdrs)
      .select("CASE_ID").as[String].collect().toSeq
    assert(out === Seq("C5")) // exactly ONE row, the 03-06 specimen's case
  }

  test("refreshLineage: lab-directed precedence, vocab gate, status upgrade, date fill") {
    val df = Seq(
      // CDC lab: CDC lineage wins over GISAID's
      ("Helix", "ID1", null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[String]),
      // non-CDC lab: GISAID wins; status present stays
      ("PHL", "ID2", null.asInstanceOf[String], "LOW QUALITY", null.asInstanceOf[String]),
      // CDC says "None" -> fall back to GISAID; invalid vocab -> null
      ("Helix", "ID3", null.asInstanceOf[String], null.asInstanceOf[String], null.asInstanceOf[String]))
      .toDF("SEQUENCE_LAB", "GISAID_ID", "SEQUENCE_VARIANT_OPEN_TEXT",
        "SEQUENCE_STATUS", "SEQUENCE_SPECIMEN_COLLECTION_DATE")
    val gisaid = Seq(
      ("ID1", "B.1.1.7", "2021-03-02"), ("ID2", "B.1.617.2", "2021-03-03"),
      ("ID3", "NOT_A_LINEAGE", "2021-03-04"))
      .toDF("virus_name", "lineage", "collection_date")
    val cdc = Seq(("ID1", "XBB.1.5", "2021-03-01"), ("ID3", "None", "2021-03-09"))
      .toDF("gisaid_name", "pango_lineage", "collection_date")
    val lineages = Seq("B.1.1.7", "B.1.617.2", "XBB.1.5").toDF("lineage")
    val out = KeepNaRefresh.refreshLineage(df, gisaid, cdc, lineages, cdcLabs)
      .select("GISAID_ID", "SEQUENCE_VARIANT_OPEN_TEXT", "SEQUENCE_STATUS",
        "SEQUENCE_SPECIMEN_COLLECTION_DATE")
      .as[(String, Option[String], Option[String], Option[String])]
      .collect().toSet
    assert(out === Set(
      ("ID1", Some("XBB.1.5"), Some("COMPLETE"), Some("03/01/2021")),
      ("ID2", Some("B.1.617.2"), Some("LOW QUALITY"), Some("03/03/2021")),
      ("ID3", None, None, Some("03/09/2021"))))
  }

  test("annotateExpiry: NULL lab takes the non-CDC arm (R's NA %in% is FALSE)") {
    // A record with a null SEQUENCE_LAB and an accession absent from
    // GISAID must still note "SA not in GISAID": R evaluates
    // `NA %in% cdc_labs` to FALSE, so the non-CDC branch applies. A raw
    // Spark isin would yield NULL and skip both arms, silently dropping
    // condition_2.
    val expired = Seq(
      ("SCA1", "ACC-MISSING", null.asInstanceOf[String], "C1"),
      // null lab + accession PRESENT in GISAID -> no condition_2 note
      ("SCA1", "ACC-KNOWN", null.asInstanceOf[String], "C1"))
      .toDF("SEQUENCE_CLINICAL_ACCESSION", "SEQUENCE_ACCESSION",
        "SEQUENCE_LAB", "CASE_ID")
    val wdrs = Seq(("SCA1", "SCA1"))
      .toDF("SEQUENCE_CLINICAL_ACCESSION", "SPECIMEN__ID__ACCESSION__NUM__MANUAL")
    val gisaid = Seq("hCoV-19/ACC-KNOWN").toDF("virus_name")
    val cdc = Seq("hCoV-19/NOPE").toDF("gisaid_name")
    val out = KeepNaRefresh.annotateExpiry(expired, wdrs, gisaid, cdc, cdcLabs)
      .select("SEQUENCE_ACCESSION", "NOTES").as[(String, String)].collect().toMap
    assert(out("ACC-MISSING") === "SA not in GISAID")
    assert(out("ACC-KNOWN") === "")
  }

  test("split graduates matched records, keeps the rest pending") {
    val df = Seq((Some("C1"), "a"), (None, "b")).toDF("CASE_ID", "v")
    val (roster, pending) = KeepNaRefresh.split(df)
    assert(roster.select("v").as[String].collect().toSeq === Seq("a"))
    assert(pending.select("v").as[String].collect().toSeq === Seq("b"))
  }
}
