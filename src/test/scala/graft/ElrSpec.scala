package graft

import graft.pipelines.Elr
import org.apache.spark.sql.functions._

/** ELR pipeline pieces: new-record anti-joins, accession synthesis,
  * validated lineage extraction, preferred-row dedup, sentinel split. */
class ElrSpec extends SparkSpec {
  import spark.implicits._

  test("newRecords: rostered and processed rows removed") {
    val elr = Seq(("a1", "2021-01-01", "x"), ("a2", "2021-01-02", "y"),
      ("a3", "2021-01-03", "z")).toDF("accession", "collection_date", "v")
    val rostered = Seq(("a1", "2021-01-01")).toDF("accession", "collection_date")
    val processed = Seq("a2").toDF("accession")
    val out = Elr.newRecords(elr, rostered, processed)
      .select("accession").as[String].collect().toSeq
    assert(out === Seq("a3"))
  }

  test("synthesizeAccession per submitter, Aegis prefix switches at 2022-05-01") {
    val df = Seq(
      ("aegis", "ASC123-B", "2021-05-01", "pre"),   // before the switch
      ("aegis", "ASC456-C", "2022-04-30", "edge_pre"),
      ("aegis", "ASC456-C", "2022-05-01", "edge_post"), // first day of new form
      ("aegis", "ASC789-D", "2023-01-02", "post"),
      ("aegis", null, "2021-06-01", "no_id"),        // no id -> no accession
      ("helix", "XYZ9", "2022-01-15", "hx"),
      ("other", "hCoV-19/USA/WA-PLAIN/2021", "2021-03-01", "ot"))
      .toDF("submitter", "raw_id", "collection_date", "tag")
      .withColumn("collection_date", col("collection_date").cast("date"))
    val out = Elr.synthesizeAccession(df)
      .select("tag", "gisaid_id").as[(String, Option[String])].collect().toMap
    assert(out("pre") === Some("USA/WA-CDC-ASC123/2021"))
    assert(out("edge_pre") === Some("USA/WA-CDC-ASC456/2022"))
    assert(out("edge_post") === Some("USA/WA-ASC-456/2022"))
    assert(out("post") === Some("USA/WA-ASC-789/2023"))
    assert(out("no_id") === None)
    assert(out("hx") === Some("USA/WA-CDC-STM-XYZ9/2022"))
    assert(out("ot") === Some("USA/WA-PLAIN/2021"))
  }

  test("synthesizeAccession: Aegis with a null collection date yields null") {
    val df = Seq(("aegis", "ASC1-A")).toDF("submitter", "raw_id")
      .withColumn("collection_date", lit(null).cast("date"))
    val out = Elr.synthesizeAccession(df)
      .select("gisaid_id").as[Option[String]].collect()
    assert(out === Seq(None))
  }

  test("extractLineage: lookaround extraction validated against vocab") {
    val df = Seq(
      (1, "SARS-CoV-2 B.1.1.7 lineage detected"),
      (2, "Other; BA.5"),
      (3, "SARS-CoV-2 NOT-A-LINEAGE lineage detected"),
      (4, "result Unassigned"),
      (5, "negative")).toDF("id", "test_result")
    val lineages = Seq("B.1.1.7", "BA.5").toDF("lineage")
    val out = Elr.extractLineage(df, lineages)
      .select("id", "lineage").as[(Int, Option[String])].collect().toMap
    assert(out(1) === Some("B.1.1.7"))
    assert(out(2) === Some("BA.5"))
    assert(out(3) === None)   // extracted but not in vocab
    assert(out(4) === Some("Unassigned"))
    assert(out(5) === None)
  }

  test("preferredRowDedup keeps study-identifier row over nulls over rest") {
    val df = Seq(
      ("k1", "other obs", "r1"),
      ("k1", "Sequencing study identifier", "r2"),
      ("k1", null, "r3"),
      ("k2", null, "r4")).toDF("key", "obs", "rid")
    val out = Elr.preferredRowDedup(df, Seq("key"), col("obs"), col("rid"))
      .select("key", "rid").as[(String, String)].collect().toMap
    assert(out === Map("k1" -> "r2", "k2" -> "r4"))
  }

  test("sentinelSplit diverts sentinel rows") {
    val df = Seq(("ok", "fine"), ("QA CHECK FAIL: bad date", "fine"))
      .toDF("a", "b")
    val (clean, diverted) = Elr.sentinelSplit(df, Seq(col("a"), col("b")))
    assert(clean.count() === 1 && diverted.count() === 1)
  }
}
