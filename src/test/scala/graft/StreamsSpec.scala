package graft

import graft.streaming.{PendingRecord, Streams}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** Structured Streaming semantics: watermarked window agg and the keep_na
  * 60-day retry/expiry state machine, driven through MemoryStream. */
class StreamsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("windowedCounts over a bounded stream emits per-day totals") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long, String, Timestamp, Double)]
    val events = mem.toDF()
      .toDF("event_id", "user_id", "event_type", "ts", "value")
    val q = Streams.windowedCounts(events, "1 day", "2 days")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("append").start()
    mem.addData(
      (1L, 1L, "click", ts("2024-01-01 10:00:00"), 1.0),
      (2L, 1L, "click", ts("2024-01-01 11:00:00"), 2.0),
      (3L, 2L, "view", ts("2024-01-02 09:00:00"), 5.0))
    q.processAllAvailable()
    // far-future event advances the watermark; closed windows emit in the
    // following batch
    mem.addData((4L, 3L, "click", ts("2024-01-10 09:00:00"), 1.0))
    q.processAllAvailable()
    mem.addData((5L, 3L, "click", ts("2024-01-10 10:00:00"), 1.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("win_counts")
      .select(col("window_start").cast("string"), col("event_type"), col("n"))
      .as[(String, String, Long)].collect().toSet
    // windows closed by the 01-10 watermark advance: 01-01 and 01-02
    assert(rows.contains(("2024-01-01 00:00:00", "click", 2L)))
    assert(rows.contains(("2024-01-02 00:00:00", "view", 1L)))
  }

  test("keepNaRefreshStream: stream-static join adopts case ids within the window") {
    implicit val sqlCtx = spark.sqlContext
    // SCA1 appears on THREE specimen rows (the WDRS-entire fan-out shape):
    // the snapshot must reduce to one deterministic row per accession —
    // earliest collection date, then min case id — so the stuck record is
    // emitted exactly once, never once per specimen
    val wdrs = Seq(
      ("SCA1", "C9", "2021-03-10"),
      ("SCA1", "C7", "2021-03-20"),
      ("SCA1", "C5", null),
      ("SCA2", "C8", "2021-06-01"))
      .toDF("SEQUENCE_CLINICAL_ACCESSION", "CASE_ID", "COLLECTION_DATE")
      .withColumn("COLLECTION_DATE", to_date(col("COLLECTION_DATE")))
    val mem = MemoryStream[(String, String)]
    val pending = mem.toDF()
      .toDF("SEQUENCE_CLINICAL_ACCESSION", "coll_date_raw")
      .withColumn("coll_date", to_date(col("coll_date_raw")))
    val q = Streams.keepNaRefreshStream(pending, wdrs,
      "SEQUENCE_CLINICAL_ACCESSION", "coll_date")
      .writeStream.format("memory").queryName("kn_refresh")
      .outputMode("append").start()
    mem.addData(
      ("SCA1", "2021-03-05"),  // in window -> adopts C9
      ("SCA2", "2021-03-05"),  // out of window -> pending
      ("SCA9", "2021-03-05"))  // no snapshot row -> pending
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("kn_refresh")
      .select(col("SEQUENCE_CLINICAL_ACCESSION"), col("adopted_case_id"), col("outcome"))
      .as[(String, Option[String], String)].collect().toSet
    assert(rows === Set(
      ("SCA1", Some("C9"), "matched"),
      ("SCA2", None, "pending"),
      ("SCA9", None, "pending")))
  }

  test("rosterSink: micro-batches land as chunked CSV under batch-id dirs") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_sink")
    val mem = MemoryStream[(String, String)]
    val roster = mem.toDF().toDF("CASE_ID", "SEQUENCE_NOTES")
    val q = Streams.rosterSink(roster, s"$dir/out", s"$dir/ckpt", Seq("CASE_ID"),
      maxRows = 2)
    mem.addData(("C1", "a"), ("C2", "b"), ("C3", "c"))
    q.processAllAvailable()
    mem.addData(("C4", "d"))
    q.processAllAvailable()
    q.stop()
    val back = spark.read.option("header", "true")
      .option("basePath", s"$dir/out").csv(s"$dir/out/batch=*")
    assert(back.count() === 4)
    // chunk cap respected inside each batch directory
    val perChunk = back.groupBy("batch", "_chunk").count()
      .agg(max(col("count"))).head().getLong(0)
    assert(perChunk <= 2)
  }

  test("keepNaRetry: match resolves pending; expiry after 60 days of event time") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PendingRecord]
    val q = Streams.keepNaRetry(mem.toDS(), retentionDays = 60)
      .writeStream.format("memory").queryName("keepna")
      .outputMode("append").start()

    // batch 1: two pending records
    mem.addData(
      PendingRecord("k1", "rec-one", ts("2024-01-01 00:00:00")),
      PendingRecord("k2", "rec-two", ts("2024-01-01 00:00:00")))
    q.processAllAvailable()
    // batch 2: k1 gets matched on day 10; watermark advances
    mem.addData(PendingRecord("k1", "MATCH:wdrs", ts("2024-01-10 00:00:00")))
    q.processAllAvailable()
    // batch 3: far-future event pushes event time past k2's 60-day timeout
    mem.addData(PendingRecord("k9", "MATCH:noise", ts("2024-06-01 00:00:00")))
    q.processAllAvailable()
    // batch 4: the timeout fires on the batch after the watermark advance
    mem.addData(PendingRecord("k9", "MATCH:noise2", ts("2024-06-02 00:00:00")))
    q.processAllAvailable()
    q.stop()

    val out = spark.table("keepna")
      .select("key", "payload", "outcome").as[(String, String, String)]
      .collect().toSet
    assert(out.contains(("k1", "rec-one", "matched")))
    assert(out.contains(("k2", "rec-two", "expired")))
  }

  test("keepNaRetry resolves ALL pending copies arriving across batches") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PendingRecord]
    val q = Streams.keepNaRetry(mem.toDS(), retentionDays = 60)
      .writeStream.format("memory").queryName("keepna_multi")
      .outputMode("append").start()
    // two pendings for k1 in SEPARATE batches (single-record state would
    // silently drop the second)
    mem.addData(PendingRecord("k1", "copy-one", ts("2024-01-01 00:00:00")))
    q.processAllAvailable()
    mem.addData(PendingRecord("k1", "copy-two", ts("2024-01-02 00:00:00")))
    q.processAllAvailable()
    mem.addData(PendingRecord("k1", "MATCH:wdrs", ts("2024-01-10 00:00:00")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("keepna_multi")
      .select("payload", "outcome").as[(String, String)].collect().toSet
    assert(out === Set(("copy-one", "matched"), ("copy-two", "matched")))
  }

  test("keepNaRetry: match arriving BEFORE its pending record still resolves") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PendingRecord]
    val q = Streams.keepNaRetry(mem.toDS(), retentionDays = 60)
      .writeStream.format("memory").queryName("keepna_ooo")
      .outputMode("append").start()
    // out-of-order: the MATCH lands in an earlier batch than the pending
    // record it resolves (both within the watermark) — the match is held
    // in state rather than discarded
    // watermark delay is 1 day, so after the match the watermark sits at
    // 2024-01-09; the pending must be >= that to be admitted at all
    mem.addData(PendingRecord("k1", "MATCH:wdrs", ts("2024-01-10 00:00:00")))
    q.processAllAvailable()
    mem.addData(PendingRecord("k1", "late-pending", ts("2024-01-09 12:00:00")))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("keepna_ooo")
      .select("key", "payload", "outcome", "ageDays")
      .as[(String, String, String, Int)].collect().toSet
    assert(out === Set(("k1", "late-pending", "matched", 0)))
  }

  test("keepNaExpiryNotes: expired records carry the Rmd condition notes; " +
      "matched records never reach the archive") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[PendingRecord]
    // static state table: roster columns per key. k-exp1 misses WDRS (one
    // column only) + GISAID (non-CDC lab) + CASE_ID; k-exp2 is a CDC-lab
    // record missing its accession entirely; k-match resolves and must
    // not be archived at all.
    val records = Seq(
      ("k-exp1", "SCA1", "ACC1", "Lab-X", null.asInstanceOf[String]),
      ("k-exp2", "SCA2", null.asInstanceOf[String], "CDC-Lab", "77"),
      ("k-match", "SCA3", "ACC3", "Lab-X", null.asInstanceOf[String]))
      .toDF("key", "SEQUENCE_CLINICAL_ACCESSION", "SEQUENCE_ACCESSION",
        "SEQUENCE_LAB", "CASE_ID")
    // SCA1 present in the first WDRS column but NOT the specimen column
    // (the reference's OR: either absence notes "SCA not in WDRS");
    // SCA2 present in both.
    val wdrs = Seq(("SCA1", "other"), ("SCA2", "SCA2"))
      .toDF("SEQUENCE_CLINICAL_ACCESSION", "SPECIMEN__ID__ACCESSION__NUM__MANUAL")
    val gisaid = Seq("hCoV-19/OTHER").toDF("virus_name")
    val cdc = Seq("hCoV-19/NOPE").toDF("gisaid_name")

    val out = Streams.keepNaExpiryNotes(
      Streams.keepNaRetry(mem.toDS(), retentionDays = 60),
      records, "key", wdrs, gisaid, cdc, cdcLabs = Seq("CDC-Lab"))
      .select(col("key"), col("NOTES"))
    val q = out.writeStream.format("memory").queryName("keepna_notes")
      .outputMode("append").start()
    mem.addData(
      PendingRecord("k-exp1", "rec-1", ts("2024-01-01 00:00:00")),
      PendingRecord("k-exp2", "rec-2", ts("2024-01-01 00:00:00")),
      PendingRecord("k-match", "rec-3", ts("2024-01-01 00:00:00")))
    q.processAllAvailable()
    mem.addData(PendingRecord("k-match", "MATCH:wdrs", ts("2024-01-10 00:00:00")))
    q.processAllAvailable()
    // far-future noise advances the watermark past the 60-day timeout;
    // the timeout fires on the following batch
    mem.addData(PendingRecord("k9", "MATCH:noise", ts("2024-06-01 00:00:00")))
    q.processAllAvailable()
    mem.addData(PendingRecord("k9", "MATCH:noise2", ts("2024-06-02 00:00:00")))
    q.processAllAvailable()
    q.stop()
    val got = spark.table("keepna_notes")
      .as[(String, String)].collect().toMap
    assert(got("k-exp1") === "SCA not in WDRS / SA not in GISAID / CASE_ID missing")
    assert(got("k-exp2") === "SA missing")
    assert(!got.contains("k-match"))
  }

  test("streaming dedup within watermark drops replays, admits later keys") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val q = mem.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    mem.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:05:00")))
    q.processAllAvailable()
    // replay of 1 within the watermark window: dropped
    mem.addData((1L, ts("2024-01-01 10:30:00")), (3L, ts("2024-01-01 10:40:00")))
    q.processAllAvailable()
    q.stop()
    val ids = spark.table("dedup_stream").select("event_id").as[Long]
      .collect().toSeq.sorted
    assert(ids === Seq(1L, 2L, 3L))
  }

  test("keepNaBatch mirrors the state machine on state tables") {
    val pending = Seq(
      ("k1", "2024-01-01"), ("k2", "2023-10-01"), ("k3", "2024-02-01"))
      .toDF("key", "first_seen")
      .withColumn("first_seen", col("first_seen").cast("date"))
    val matches = Seq("k1").toDF("key")
    val out = Streams.keepNaBatch(pending, matches, "key",
        to_date(lit("2024-02-15")), 60)
      .select("key", "outcome").as[(String, String)].collect().toMap
    assert(out === Map("k1" -> "matched", "k2" -> "expired", "k3" -> "pending"))
  }
}
