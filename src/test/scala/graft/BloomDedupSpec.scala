package graft

import graft.operators.BloomDedup
import graft.functions.TextFunctions.fingerprint
import org.apache.spark.sql.functions._

/** Bloom-accelerated incremental exact dedup: exact anti-join semantics,
  * no false negatives by construction. */
class BloomDedupSpec extends SparkSpec {
  import spark.implicits._

  test("planted duplicate is caught, fresh doc passes") {
    val corpus = Seq("known document text here", "another known one")
      .toDF("text").select(fingerprint($"text").as("fp")).distinct()
    val batch = Seq(
      (1L, "known document text here"),   // exact dup
      (2L, "Known  Document TEXT here!"), // canon-equal dup (case/spacing)
      (3L, "genuinely new content"))
      .toDF("doc_id", "text")
    val out = BloomDedup.newDocs(batch, corpus, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(3L))
  }

  test("duplicate batch ids: the fingerprint keying keeps the new row") {
    // Two batch rows share id=1; only one text is a known duplicate. An
    // id-keyed anti-join would drop both; fingerprint keying keeps the
    // genuinely-new row. Null text survives (null fp never matches).
    val corpus = Seq("known document text here")
      .toDF("text").select(fingerprint($"text").as("fp")).distinct()
    val batch = Seq(
      (1L, "known document text here"), // dup
      (1L, "new text, same id"),        // new — must survive
      (2L, null.asInstanceOf[String]))  // null text — must survive
      .toDF("doc_id", "text")
    val out = BloomDedup.newDocs(batch, corpus, "text")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
    assert(out === Set((1L, Some("new text, same id")), (2L, None)))
  }

  test("bloom path result equals the plain anti-join on real data") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val corpus = docs.filter($"doc_id" % 3 =!= 0)
    val batch = docs.filter($"doc_id" % 3 === 0)
      .select($"doc_id", $"text")
      .unionByName(corpus.limit(20)
        .select(($"doc_id" + 500000L).as("doc_id"), $"text"))
    val fps = corpus.select(fingerprint($"text").as("fp")).distinct()
    val viaBloom = BloomDedup.newDocs(batch, fps, "text")
      .select("doc_id").as[Long].collect().toSet
    val plain = batch.withColumn("__fp", fingerprint($"text"))
      .join(fps.select($"fp".as("__fp")), Seq("__fp"), "left_anti")
      .select("doc_id").as[Long].collect().toSet
    assert(viaBloom === plain)
    // the planted copies were all caught
    assert(!viaBloom.exists(_ >= 500000L))
  }

  test("empty corpus: every batch doc is new") {
    val corpus = spark.emptyDataset[String].toDF("text")
      .select(fingerprint($"text").as("fp")).filter(lit(false))
    val batch = Seq((1L, "anything")).toDF("doc_id", "text")
    val out = BloomDedup.newDocs(batch, corpus, "text")
      .select("doc_id").as[Long].collect().toSet
    assert(out === Set(1L))
  }
}
