package graft

import graft.pipelines.Curation
import org.apache.spark.sql.functions._

/** Composed curation chain: each stage drops exactly the doc planted for
  * it, and the attrition report records the progression. */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  // 10-token shared boilerplate chunk (stripped from C and D):
  private val boiler = "the cat sat on the mat and it was fine"
  // E and F: every 10-token chunk is canon-IDENTICAL but string-distinct
  // (trailing period on F's chunk-final tokens), so line dedup keeps both
  // (distinct chunk strings) while minhash sees identical shingle sets —
  // a GUARANTEED near-dup pair, no LSH luck involved.
  private val eText = "crew sailed north beyond the old country coast again today " +
    "it was a calm and quiet morning for all hands"
  private val fText = "crew sailed north beyond the old country coast again today. " +
    "it was a calm and quiet morning for all hands."
  // G shares its first five tokens with the eval doc -> decontaminated.
  private val gText = "secret benchmark answer string five more words beyond the " +
    "leak plus some extra filler tokens here now also done"

  private def trainDocs = Seq(
    (1L, "s", "tiny doc"),                                        // too_short
    (2L, "s", "the the the the the the the the the the the the"), // repetitive
    (3L, "s", s"$boiler company news report for the circus and its members today"),
    (4L, "s", s"$boiler another story about the weather in the city was nice"),
    (5L, "s", eText),
    (6L, "s", fText),
    (7L, "s", gText))
    .toDF("doc_id", "source", "text")

  private def evalDocs = Seq((100L, "secret benchmark answer string five"))
    .toDF("doc_id", "text")

  test("attrition report: each stage drops its planted doc") {
    val weights = Seq(("s", 1.0)).toDF("source", "weight")
    val report = Curation.attritionReport(trainDocs, evalDocs, weights,
        "text", "doc_id", "source",
        Curation.CurationConfig(budgetTokens = 100000L))
      .orderBy("stage_order")
      .as[(String, Int, Long, Long)].collect()
    assert(report.map(r => (r._1, r._3)).toSeq === Seq(
      ("ingest", 7L),         // all docs
      ("quality_gate", 5L),   // drops 1 (too_short) and 2 (repetitive)
      ("line_dedup", 5L),     // boilerplate stripped, no doc emptied
      ("near_dup", 4L),       // drops 6 (guaranteed pair with 5, min-id keeps 5)
      ("decontaminate", 3L),  // drops 7 (shares a 5-gram with the eval doc)
      ("mixture", 3L)))       // budget >> tokens: keep fraction capped at 1
    // tokens monotonically non-increasing, and line dedup removed exactly
    // the two 10-token boilerplate copies
    val toks = report.map(_._4).toSeq
    assert(toks.zip(toks.tail).forall { case (a, b) => b <= a })
    assert(toks(1) - toks(2) === 20L)
  }

  test("run returns the cleaned curated corpus, not just the report") {
    val weights = Seq(("s", 1.0)).toDF("source", "weight")
    val res = Curation.run(trainDocs, evalDocs, weights,
      "text", "doc_id", "source",
      Curation.CurationConfig(budgetTokens = 100000L))
    val corpus = res.corpus.select("doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(corpus.keySet === Set(3L, 4L, 5L))
    // doc 3 carries the POST-cleaning text: boilerplate chunk stripped
    assert(corpus(3L) ===
      "company news report for the circus and its members today")
    // doc 5 was untouched by cleaning (its chunks are unique strings)
    assert(corpus(5L) === eText)
  }

  test("publishRun + reportDrift: run-over-run attrition deltas from stored state") {
    val weights = Seq(("s", 1.0)).toDF("source", "weight")
    val store = new graft.sources.SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_cur_store").toString)
    val cfg = Curation.CurationConfig(budgetTokens = 100000L)
    // run 1 over a subset (no doc 7 -> decontaminate drops nothing)
    val r1 = Curation.run(trainDocs.filter($"doc_id" =!= 7L), evalDocs,
      weights, "text", "doc_id", "source", cfg)
    Curation.publishRun(store, r1)
    // run 2 over the full corpus; drift vs the published run-1 report
    val r2 = Curation.run(trainDocs, evalDocs, weights,
      "text", "doc_id", "source", cfg)
    val drift = Curation.reportDrift(store, r2.report)
      .as[(String, Int, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._3, r._4, r._5))).toMap
    // ingest gained doc 7; the final mixture stage did not (7 is
    // decontaminated away), so its docs_change is zero
    assert(drift("ingest") === ((7L, 6L, 1L)))
    assert(drift("mixture") === ((3L, 3L, 0L)))
    // the published report is the commit record: it carries the corpus
    // version it describes, and that version is readable
    val cv = store.read("curation_report")
      .select("corpus_version").distinct().as[Long].head()
    assert(store.readVersion("curation_corpus", cv).count() ===
      r1.corpus.count())
    // publishing run 2 advances the version; a later drift sees run 2
    Curation.publishRun(store, r2)
    val drift2 = Curation.reportDrift(store, r2.report)
      .as[(String, Int, Long, Long, Long, Long)].collect()
    assert(drift2.forall(r => r._5 === 0L && r._6 === 0L))
    // first-run edge: an empty store zero-fills instead of failing
    val freshStore = new graft.sources.SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_cur_store2").toString)
    val cold = Curation.reportDrift(freshStore, r2.report)
      .as[(String, Int, Long, Long, Long, Long)].collect()
    assert(cold.length === 6 && cold.forall(r => r._4 === 0L))
  }

  test("vacuumRuns: crash-orphan corpus versions are collected, live runs survive") {
    val weights = Seq(("s", 1.0)).toDF("source", "weight")
    val store = new graft.sources.SnapshotStore(spark,
      java.nio.file.Files.createTempDirectory("graft_cur_vac").toString)
    val cfg = Curation.CurationConfig(budgetTokens = 100000L)
    val r = Curation.run(trainDocs, evalDocs, weights,
      "text", "doc_id", "source", cfg)
    Curation.publishRun(store, r)               // corpus v0, report v0
    Curation.publishRun(store, r)               // corpus v1, report v1
    // crash between publishes: corpus v2 lands, no report references it
    store.publish("curation_corpus", r.corpus)
    Curation.publishRun(store, r)               // corpus v3, report v2 (heals)
    Curation.publishRun(store, r)               // corpus v4, report v3
    assert(store.versions("curation_corpus") === Seq(0L, 1L, 2L, 3L, 4L))
    Curation.vacuumRuns(store, keepReports = 2)
    // kept: reports v2/v3 -> live corpora v3/v4; v0/v1/orphan-v2 gone
    assert(store.versions("curation_report") === Seq(2L, 3L))
    assert(store.versions("curation_corpus") === Seq(3L, 4L))
    // the published pair still reads; drift off the kept reports works
    assert(store.read("curation_corpus").count() === r.corpus.count())
    assert(Curation.reportDrift(store, r.report).count() === 6L)
    // a vacuum can never drop the corpus _CURRENT, even unreferenced:
    // simulate a fresh crash-orphan (becomes _CURRENT) and vacuum again
    store.publish("curation_corpus", r.corpus)  // orphan v5, now current
    Curation.vacuumRuns(store, keepReports = 2)
    assert(store.versions("curation_corpus").contains(5L))
    assert(store.read("curation_corpus").count() === r.corpus.count())
    // crashed REPORT publishes: v-dirs land but _CURRENT stays behind.
    // The published report (v3 -> corpus v4) falls outside keepReports=1's
    // newest-dirs window, yet its corpus must stay live — store.vacuum
    // keeps the published report, so dropping its corpus would dangle it.
    val storeRoot = store.read("curation_report").inputFiles.head
      .replaceAll("/curation_report/.*", "")
      .replaceAll("^file:", "")
    (4L to 5L).foreach { v =>
      r.report.withColumn("corpus_version", lit(5L))
        .write.parquet(s"$storeRoot/curation_report/v=$v")
    }
    assert(store.currentVersion("curation_report") === Some(3L))
    Curation.vacuumRuns(store, keepReports = 1)
    // corpus v4 (referenced by the still-published report v3) survives
    assert(store.versions("curation_corpus").contains(4L))
    val cv2 = store.read("curation_report")
      .select("corpus_version").distinct().as[Long].head()
    assert(store.readVersion("curation_corpus", cv2).count() === r.corpus.count())
  }

  test("withDisposition precedence: first failing arm wins") {
    val out = Curation.withDisposition(
      Seq((1L, "tiny doc 123-45-6789")).toDF("doc_id", "text"), "text")
      .select("disposition").as[String].head()
    assert(out === "too_short") // not "pii", though the SSN is there
  }

  test("withDisposition: NULL text is an empty doc -> too_short") {
    // Defined explicitly so the Spark gate and the DuckDB oracle agree
    // before null docs ever appear in a fixture (the oracle's CASE would
    // otherwise fall through its null arms to 'low_alpha').
    val out = Curation.withDisposition(
      Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text"), "text")
      .select("disposition").as[String].head()
    assert(out === "too_short")
  }

  test("withDisposition keeps a clean English doc") {
    val out = Curation.withDisposition(
      Seq((1L, "the report for the board was finished and it was good today"))
        .toDF("doc_id", "text"), "text")
      .select("disposition").as[String].head()
    assert(out === "keep")
  }

  test("scopedCheckpoint: release frees ONLY its own RDD, never a foreign persist") {
    val sc = spark.sparkContext
    // a foreign cached frame registered before/independently of the scope
    val foreign = Seq((1L, "other")).toDF("id", "v").persist()
    foreign.count()
    val foreignIds = sc.getPersistentRDDs.keySet
    val (cp, release) = Curation.scopedCheckpoint(
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val cpIds = sc.getPersistentRDDs.keySet -- foreignIds
    assert(cpIds.size === 1, "checkpoint registered exactly one RDD")
    assert(cp.count() === 2L)
    release()
    val after = sc.getPersistentRDDs.keySet
    assert(cpIds.forall(!after(_)), "the checkpoint RDD was released")
    assert(foreignIds.subsetOf(after), "the foreign persist survived release")
    foreign.unpersist()
  }

  test("scopedCheckpoint: concurrent scopes release independently (no cross-attribution)") {
    // The old getPersistentRDDs-diff implementation could attribute a
    // concurrently-registered RDD to the wrong scope and unpersist
    // another stage's checkpoint (unrecoverable: truncated lineage).
    // Direct RDD capture makes interleaving safe: N concurrent scopes,
    // each readable before ITS release, all gone after.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val runs = (1 to 4).map { i =>
      Future {
        val (cp, release) = Curation.scopedCheckpoint(
          spark.range(i * 100L).toDF("id"))
        val n = cp.count()
        (i, n, release)
      }
    }
    val done = runs.map(Await.result(_, Duration(2, "min")))
    // every scope sees its OWN data (nothing was released out from under it)
    done.foreach { case (i, n, _) => assert(n === i * 100L) }
    done.foreach { case (_, _, release) => release() }
    assert((sc.getPersistentRDDs.keySet -- before).isEmpty,
      "all four scopes released their own RDDs")
  }

  test("awaitStage: a wedged stats future fails with the stage name, not a hang") {
    import scala.concurrent.Promise
    val never = Promise[Long]().future
    val e = intercept[IllegalStateException] {
      Curation.awaitStage("near_dup", never,
        scala.concurrent.duration.Duration(200, "ms"))
    }
    assert(e.getMessage.contains("near_dup"))
    assert(e.getCause.isInstanceOf[java.util.concurrent.TimeoutException])
  }
}
