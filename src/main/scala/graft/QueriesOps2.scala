package graft

import graft.streaming.Streams
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Second operator sweep (SURVEY §2): composite-key exact join (J13),
 * keep_na 60-day expiry (Q7), case-insensitive gap anti-join (Q8),
 * chunked-sink assignment (S9), latest-snapshot pick (O3), percent-of-total
 * (A5), vocab-validated extraction (F9).
 */
object QueriesOps2 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- J13
    QueryDef("j13_composite_key_join", Some("""
      SELECT c.c_custkey, s.s_suppkey
      FROM customer c JOIN supplier s
        ON c.c_nationkey = s.s_nationkey AND c.c_custkey % 100 = s.s_suppkey % 100"""),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val sup = t(s, dir, "supplier")
        c.join(sup, c("c_nationkey") === sup("s_nationkey") &&
            c("c_custkey") % 100 === sup("s_suppkey") % 100)
          .select(c("c_custkey"), sup("s_suppkey"))
      }),

    // ---------------------------------------------------------------- Q7
    // keep_na lifecycle on state tables: orders pending since o_orderdate,
    // "matched" when any returned lineitem exists, expired past 60 days.
    QueryDef("q7_keepna_expiry", Some("""
      WITH matches AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
      SELECT o.o_orderkey,
             CASE WHEN m.l_orderkey IS NOT NULL THEN 'matched'
                  WHEN datediff('day', CAST(o.o_orderdate AS DATE), DATE '1998-06-01') > 60 THEN 'expired'
                  ELSE 'pending' END AS outcome
      FROM orders o LEFT JOIN matches m ON o.o_orderkey = m.l_orderkey"""),
      (s, dir) => {
        val pending = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderdate").cast("date").as("first_seen"))
        val matches = t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("o_orderkey"))
        Streams.keepNaBatch(pending, matches, "o_orderkey",
            to_date(lit("1998-06-01")), 60)
          .select(col("o_orderkey"), col("outcome"))
      }),

    // ------------------------------------------------------- Q7 (archive)
    // The expiry ARCHIVE arm (KEEP_NA_ROSTER_SECOND_IN_PROGRESS
    // .Rmd:699-765): records aging out of the 60-day window carry the
    // reasons they could not roster — condition_1..3 united " / " into
    // NOTES. Synthetic roster columns + reference sets derived from
    // orders (both engines replay the same modular rules): SCA/SA/CASE_ID
    // go missing on %11/%13/%7; WDRS holds %3=0 in one accession column
    // and %3 IN (0,1) in the other (membership must clear BOTH); GISAID
    // covers %5<>1, CDC cumulative %5<>2, lab routing by %2.
    QueryDef("q7_keepna_notes", Some("""
      WITH matches AS (SELECT DISTINCT l_orderkey FROM lineitem WHERE l_returnflag = 'R'),
      pend AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 11 = 0 THEN NULL ELSE 'SCA' || CAST(o_orderkey AS VARCHAR) END AS sca,
               CASE WHEN o_orderkey % 13 = 0 THEN NULL ELSE 'USA/WA-' || CAST(o_orderkey AS VARCHAR) END AS sa,
               CASE WHEN o_orderkey % 2 = 0 THEN 'CDC-Lab' ELSE 'Other-Lab' END AS lab,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE CAST(o_orderkey AS VARCHAR) END AS case_id
        FROM orders o
        WHERE datediff('day', CAST(o.o_orderdate AS DATE), DATE '1998-06-01') > 60
          AND NOT EXISTS (SELECT 1 FROM matches m WHERE m.l_orderkey = o.o_orderkey)),
      w1 AS (SELECT DISTINCT 'SCA' || CAST(o_orderkey AS VARCHAR) AS k FROM orders WHERE o_orderkey % 3 = 0),
      w2 AS (SELECT DISTINCT 'SCA' || CAST(o_orderkey AS VARCHAR) AS k FROM orders WHERE o_orderkey % 3 IN (0, 1)),
      g AS (SELECT DISTINCT 'hCoV-19/USA/WA-' || CAST(o_orderkey AS VARCHAR) AS k FROM orders WHERE o_orderkey % 5 <> 1),
      c AS (SELECT DISTINCT 'hCoV-19/USA/WA-' || CAST(o_orderkey AS VARCHAR) AS k FROM orders WHERE o_orderkey % 5 <> 2)
      SELECT o_orderkey,
             concat_ws(' / ',
               CASE WHEN sca IS NULL THEN 'SCA missing'
                    WHEN sca NOT IN (SELECT k FROM w1)
                      OR sca NOT IN (SELECT k FROM w2) THEN 'SCA not in WDRS' END,
               CASE WHEN sa IS NULL THEN 'SA missing'
                    WHEN lab <> 'CDC-Lab' AND ('hCoV-19/' || sa) NOT IN (SELECT k FROM g) THEN 'SA not in GISAID'
                    WHEN lab = 'CDC-Lab' AND ('hCoV-19/' || sa) NOT IN (SELECT k FROM c) THEN 'SA not in CDC cumulative' END,
               CASE WHEN case_id IS NULL THEN 'CASE_ID missing' END) AS notes
      FROM pend"""),
      (s, dir) => {
        val orders = t(s, dir, "orders")
        val k = col("o_orderkey")
        val pending = orders
          .select(k, col("o_orderdate").cast("date").as("first_seen"),
            when(k % 11 === 0, lit(null).cast("string"))
              .otherwise(concat(lit("SCA"), k.cast("string")))
              .as("SEQUENCE_CLINICAL_ACCESSION"),
            when(k % 13 === 0, lit(null).cast("string"))
              .otherwise(concat(lit("USA/WA-"), k.cast("string")))
              .as("SEQUENCE_ACCESSION"),
            when(k % 2 === 0, lit("CDC-Lab")).otherwise(lit("Other-Lab"))
              .as("SEQUENCE_LAB"),
            when(k % 7 === 0, lit(null).cast("string"))
              .otherwise(k.cast("string")).as("CASE_ID"))
        val matches = t(s, dir, "lineitem")
          .filter(col("l_returnflag") === "R")
          .select(col("l_orderkey").as("o_orderkey"))
        val expired = Streams.keepNaBatch(pending, matches, "o_orderkey",
            to_date(lit("1998-06-01")), 60)
          .filter(col("outcome") === "expired")
        // annotateExpiry reads the two accession columns as independent
        // distinct key sets, so one projection with per-column nulls
        // yields the same membership as materialized aligned rows would
        val wdrs = orders.select(
          when(k % 3 === 0, concat(lit("SCA"), k.cast("string")))
            .as("SEQUENCE_CLINICAL_ACCESSION"),
          when(k % 3 <= 1, concat(lit("SCA"), k.cast("string")))
            .as("SPECIMEN__ID__ACCESSION__NUM__MANUAL"))
        val gisaid = orders.filter(k % 5 =!= 1)
          .select(concat(lit("hCoV-19/USA/WA-"), k.cast("string")).as("virus_name"))
        val cdc = orders.filter(k % 5 =!= 2)
          .select(concat(lit("hCoV-19/USA/WA-"), k.cast("string")).as("gisaid_name"))
        graft.pipelines.KeepNaRefresh.annotateExpiry(
            expired, wdrs, gisaid, cdc, cdcLabs = Seq("CDC-Lab"))
          .select(col("o_orderkey"), col("NOTES").as("notes"))
      }),

    // ---------------------------------------------------------------- Q8
    // Gap analysis: case-insensitive anti-membership with a lag window
    // (gap_data.Rmd:180-257 — GISAID∖WDRS, 30-day allowance).
    QueryDef("q8_gap_antijoin", Some("""
      SELECT e.event_id FROM events e
      WHERE CAST(e.ts AS DATE) <= DATE '2024-01-20'
        AND NOT EXISTS (SELECT 1 FROM customer c
                        WHERE lower(c.c_name) = lower('Customer#' || lpad(CAST(e.user_id AS VARCHAR), 9, '0')))"""),
      (s, dir) => {
        val e = t(s, dir, "events")
          .filter(col("ts").cast("date") <= to_date(lit("2024-01-20")))
          .withColumn("__synth", lower(concat(lit("Customer#"),
            lpad(col("user_id").cast("string"), 9, "0"))))
        val c = t(s, dir, "customer").select(lower(col("c_name")).as("__cname"))
        e.join(c, e("__synth") === c("__cname"), "left_anti")
          .select("event_id")
      }),

    // ---------------------------------------------------------------- S8
    // Append-with-conservation END-TO-END (template_submitters.Rmd:961-985):
    // two appendWithCheck runs against one temp CSV state table — run 1
    // seeds the state, run 2 appends — and the row hashes the state table
    // AS RE-READ from disk, so the append, the NA-as-empty round trip
    // (%37 null names write as "" and read back null) and the
    // conservation count are all under the oracle. All-string columns:
    // the reference reads keep_na with col_types = cols(.default = "c").
    QueryDef("s8_append_conservation", Some("""
      WITH runs AS (
        SELECT CAST(c_custkey AS BIGINT) AS k FROM customer
        WHERE c_custkey % 3 IN (0, 1))
      SELECT CAST(k AS VARCHAR) AS rowid,
             CASE WHEN k % 37 = 0 THEN NULL ELSE 'K' || CAST(k AS VARCHAR) END AS name,
             strftime(DATE '2024-01-01' + CAST(k % 90 AS INTEGER), '%Y-%m-%d') AS first_seen
      FROM runs"""),
      (s, dir) => {
        val base = t(s, dir, "customer").select(col("c_custkey").cast("long").as("k"))
        def rows(f: org.apache.spark.sql.Column): DataFrame = base.filter(f)
          .select(
            col("k").cast("string").as("rowid"),
            when(col("k") % 37 === 0, lit(null).cast("string"))
              .otherwise(concat(lit("K"), col("k").cast("string"))).as("name"),
            date_format(
              date_add(to_date(lit("2024-01-01")), (col("k") % 90).cast("int")),
              "yyyy-MM-dd").as("first_seen"))
        val path = Tables.freshScratch("s8") + "/keep_na"
        graft.sinks.RosterSink.appendWithCheck(rows(col("k") % 3 === 0), path)
        graft.sinks.RosterSink.appendWithCheck(rows(col("k") % 3 === 1), path)
        s.read.option("header", "true").csv(path)
      }),

    // ---------------------------------------------------------------- S9
    QueryDef("s9_chunk_assign", Some("""
      SELECT o_orderkey,
             CAST(ceil(ROW_NUMBER() OVER (ORDER BY o_orderkey) / 500.0) AS INTEGER) AS chunk
      FROM orders"""),
      (s, dir) => graft.sinks.RosterSink.withChunkId(
          t(s, dir, "orders").select("o_orderkey"), Seq("o_orderkey"), 500)
        .withColumnRenamed("_chunk", "chunk")),

    // ---------------------------------------------------------------- S1
    // Multi-file all-string CSV ingest END-TO-END under the oracle: two
    // derived CSV directories round-trip through StringCsv.read — the
    // declared all-string schema, the per-file _provenance column
    // (normalized to the directory tag) and the NA-token → null
    // normalization ('NA' notes planted on %11) are all under the
    // compare. FileValidation/TemplateSubmittersSpec keep the
    // ragged-header arms this oracle can't express.
    QueryDef("s1_multifile_csv", Some("""
      SELECT CASE WHEN c_custkey % 2 = 0 THEN 'a' ELSE 'b' END AS src,
             CAST(c_custkey AS VARCHAR) AS rowid,
             'K' || CAST(c_custkey AS VARCHAR) AS name,
             CASE WHEN c_custkey % 11 = 0 THEN NULL
                  ELSE 'n' || CAST(c_custkey AS VARCHAR) END AS note
      FROM customer"""),
      (s, dir) => {
        val root = Tables.freshScratch("s1")
        val k = col("c_custkey")
        val rows = t(s, dir, "customer").select(
          k.cast("string").as("rowid"),
          concat(lit("K"), k.cast("string")).as("name"),
          when(k % 11 === 0, lit("NA"))
            .otherwise(concat(lit("n"), k.cast("string"))).as("note"),
          (k % 2).as("__part"))
        rows.filter(col("__part") === 0).drop("__part")
          .coalesce(1).write.option("header", "true").csv(s"$root/a")
        rows.filter(col("__part") === 1).drop("__part")
          .coalesce(1).write.option("header", "true").csv(s"$root/b")
        val schema = graft.sources.StringCsv.allStringSchema(
          Seq("rowid", "name", "note"))
        graft.sources.StringCsv
          .read(s, schema, Seq(s"$root/a", s"$root/b"))
          .select(
            regexp_extract(col("_provenance"), "/(a|b)/[^/]*$", 1).as("src"),
            col("rowid"), col("name"), col("note"))
      }),

    // ---------------------------------------------------------------- S3
    // Gzipped TSV ingest end-to-end: supplier-derived rows written as
    // gzip-compressed tab-separated files and read back through the same
    // all-string reader (sep="\t"; the .gz codec is transparent to the
    // source) — the tab framing, compression round trip and NA-token
    // normalization are all under the compare.
    QueryDef("s3_tsv_gz", Some("""
      SELECT CAST(s_suppkey AS VARCHAR) AS rowid,
             'S' || CAST(s_suppkey AS VARCHAR) AS name,
             CASE WHEN s_suppkey % 7 = 0 THEN NULL
                  ELSE 'm' || CAST(s_suppkey AS VARCHAR) END AS memo
      FROM supplier"""),
      (s, dir) => {
        val root = Tables.freshScratch("s3")
        val k = col("s_suppkey")
        t(s, dir, "supplier").select(
            k.cast("string").as("rowid"),
            concat(lit("S"), k.cast("string")).as("name"),
            when(k % 7 === 0, lit("NA"))
              .otherwise(concat(lit("m"), k.cast("string"))).as("memo"))
          .coalesce(1).write
          .option("header", "true").option("sep", "\t")
          .option("compression", "gzip")
          .csv(s"$root/tsv")
        graft.sources.StringCsv.read(s,
            graft.sources.StringCsv.allStringSchema(
              Seq("rowid", "name", "memo")),
            Seq(s"$root/tsv"), sep = "\t")
          .select(col("rowid"), col("name"), col("memo"))
      }),

    // ---------------------------------------------------------------- S12
    // File-move commit protocol END-TO-END: submission files (one per %50
    // customer key) staged in scratch, committed via the copy → manifest
    // → delete protocol, and the row hashes what the FILESYSTEM then
    // says — completed copy present, manifest entry present, original
    // gone, pending discovery empty. Driver-side by design (dozens of
    // control-plane files per run, the reference's cadence); the crash /
    // deferred-delete arms live in FileCommitSpec.
    QueryDef("s12_commit_manifest", Some("""
      SELECT 'sub_' || CAST(c_custkey AS VARCHAR) || '.csv' AS fname,
             1 AS in_completed, 1 AS in_manifest, 0 AS still_present
      FROM customer WHERE c_custkey % 50 = 0"""),
      (s, dir) => {
        import java.nio.file.{Files, Paths}
        val root = Tables.freshScratch("s12")
        val subDir = Paths.get(root, "submissions")
        Files.createDirectories(subDir)
        val names = t(s, dir, "customer")
          .filter(col("c_custkey") % 50 === 0)
          .select(concat(lit("sub_"), col("c_custkey").cast("string"),
            lit(".csv")).as("f"))
          .collect().map(_.getString(0)).toSeq
        val staged = names.map { n =>
          val p = subDir.resolve(n)
          Files.writeString(p, "rowid\n1\n")
          p.toString
        }
        val manifest = s"$root/manifest.txt"
        graft.sources.FileCommit.commitProcessed(
          staged, s"$root/completed", routes = Seq.empty,
          default = "Completed_Submissions", manifestPath = manifest)
        val committed = graft.sources.FileCommit.readManifest(manifest)
          .map(f => Paths.get(f).getFileName.toString)
        val pending = graft.sources.FileCommit
          .pendingFiles(Seq(subDir.toString), manifest)
        require(pending.isEmpty,
          s"files still pending after commit: $pending")
        val rows = names.map { n =>
          val inCompleted = Files.exists(
            Paths.get(root, "completed", "Completed_Submissions", n))
          val stillPresent = Files.exists(subDir.resolve(n))
          (n, if (inCompleted) 1 else 0, if (committed(n)) 1 else 0,
            if (stillPresent) 1 else 0)
        }
        import s.implicits._
        rows.toDF("fname", "in_completed", "in_manifest", "still_present")
      }),

    // ---------------------------------------------------------------- S11
    // Versioned object store END-TO-END under the oracle: publish two
    // versions of a derived table into a scratch store, then read BOTH
    // the pinned historical version and the atomic _CURRENT pointer
    // back from disk. The row hashes what the store actually returns, so
    // the publish → pointer-flip → historical-read contract (and the
    // parquet round trip) is all under the compare — the SnapshotStoreSpec
    // covers crash/vacuum arms this oracle can't express.
    QueryDef("s11_snapshot_roundtrip", Some("""
      SELECT 'v1' AS ver, o_orderkey FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT 'current' AS ver, o_orderkey FROM orders WHERE o_orderkey % 3 = 0"""),
      (s, dir) => {
        val store = new graft.sources.SnapshotStore(s, Tables.freshScratch("s11"))
        val orders = t(s, dir, "orders").select(col("o_orderkey"))
        val v1 = store.publish("tbl", orders.filter(col("o_orderkey") % 2 === 0))
        store.publish("tbl", orders.filter(col("o_orderkey") % 3 === 0))
        store.readVersion("tbl", v1)
          .select(lit("v1").as("ver"), col("o_orderkey"))
          .unionByName(store.read("tbl")
            .select(lit("current").as("ver"), col("o_orderkey")))
      }),

    // ---------------------------------------------------------------- O3
    QueryDef("o3_latest_snapshot", Some("""
      SELECT event_type, event_id AS latest_event FROM (
        SELECT event_type, event_id,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events) WHERE rn = 1"""),
      (s, dir) => t(s, dir, "events")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("event_type"))
            .orderBy(col("ts").desc, col("event_id").desc)))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("event_id").as("latest_event"))),

    // ---------------------------------------------------------------- A5
    QueryDef("a5_percent_of_total", Some("""
      SELECT o_orderstatus,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) /
               CAST(SUM(SUM(CAST(o_totalprice AS DECIMAL(18,2)))) OVER () AS DOUBLE) AS pct
      FROM orders GROUP BY o_orderstatus"""),
      (s, dir) => t(s, dir, "orders")
        .groupBy("o_orderstatus")
        .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("__t"))
        .select(col("o_orderstatus"),
          col("__t").cast("double").as("total"),
          // divide in DOUBLE: decimal/decimal result scale is engine-specific
          (col("__t").cast("double") /
            sum(col("__t")).over(Window.partitionBy()).cast("double")).as("pct"))),

    // ---------------------------------------------------------------- Q4
    // seq_qa_checks shape (wdrs_qa_functions.R:44-228): per-row _warn
    // flags united into one flag string via concat_ws of non-null warns.
    QueryDef("q4_united_warns", Some("""
      SELECT o_orderkey,
             concat_ws('; ',
               CASE WHEN o_orderstatus NOT IN ('O','F','P') THEN 'status_warn' END,
               CASE WHEN o_totalprice <= 0 THEN 'price_warn' END,
               CASE WHEN o_orderpriority NOT LIKE '%-%' THEN 'priority_warn' END) AS warns
      FROM orders"""),
      (s, dir) => t(s, dir, "orders").select(col("o_orderkey"),
        concat_ws("; ",
          when(!col("o_orderstatus").isin("O", "F", "P"), "status_warn"),
          when(col("o_totalprice") <= 0, "price_warn"),
          when(!col("o_orderpriority").like("%-%"), "priority_warn")).as("warns"))),

    // ------------------------------------------------- session_window
    // Spark's native streaming session operator, batch-checked: sessions
    // close after a 30-minute gap (window end exclusive => a gap of
    // exactly 1800s starts a NEW session; oracle uses >=). The gap must
    // be measured as ELAPSED microseconds (epoch_us diff — each value
    // truncated ns->us exactly like Tables.load does for Spark), NOT
    // datediff('second'): that counts second-BOUNDARY crossings, and with
    // fractional-second timestamps a 1799.9s gap that crosses 1800
    // boundaries would split a session the native operator keeps open
    // (one such gap exists at sf0.1 — caught by an off-gate sweep).
    QueryDef("ev_session_window", Some("""
      WITH gaps AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) >= 1800000000
                    THEN 1 ELSE 0 END AS new_session
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      sessions AS (
        SELECT user_id, ts,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM gaps)
      SELECT user_id, strftime(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
             COUNT(*) AS n_events
      FROM sessions GROUP BY user_id, session_id"""),
      (s, dir) => t(s, dir, "events")
        .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          date_format(min(col("ts")), "yyyy-MM-dd HH:mm:ss").as("session_start"))
        .select("user_id", "session_start", "n_events")),

    // ---------------------------------------------------------------- F4
    QueryDef("f4_excel_date", Some("""
      SELECT o_orderkey,
             strftime(DATE '1899-12-30' + CAST(o_orderkey % 50000 AS INTEGER),
                      '%Y-%m-%d') AS excel_parsed
      FROM orders"""),
      (s, dir) => t(s, dir, "orders").select(col("o_orderkey"),
        date_format(graft.functions.GraftFunctions.excelDate(
          (col("o_orderkey") % 50000).cast("string")), "yyyy-MM-dd")
          .as("excel_parsed"))),

    // ---------------------------------------------------------------- A6
    QueryDef("a6_rowwise_sum", Some("""
      SELECT l_orderkey, l_linenumber,
             (CASE WHEN l_quantity > 30 THEN 1 ELSE 0 END
              + CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END
              + CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS flag_sum
      FROM lineitem"""),
      (s, dir) => t(s, dir, "lineitem").select(col("l_orderkey"), col("l_linenumber"),
        graft.functions.GraftFunctions.rowSum(Seq(
          when(col("l_quantity") > 30, 1),
          when(col("l_discount") > 0.05, 1),
          when(col("l_returnflag") === "R", 1))).as("flag_sum"))),

    // ---------------------------------------------------------------- O1
    QueryDef("o1_order_for_review", Some("""
      SELECT s_suppkey, s_name FROM supplier ORDER BY s_name DESC, s_suppkey"""),
      (s, dir) => t(s, dir, "supplier")
        .orderBy(col("s_name").desc, col("s_suppkey"))
        .select("s_suppkey", "s_name")),

    // ---------------------------------------------------------------- P6
    // Conditional row-level cleanup (QA_for_review.Rmd:743-896): repair
    // single-error records programmatically — fill a missing status from
    // other evidence, normalize a flag, regenerate a note.
    QueryDef("p6_cleanup_fixes", Some("""
      SELECT o_orderkey,
             CASE WHEN o_orderstatus IS NULL AND o_totalprice > 0 THEN 'O'
                  ELSE o_orderstatus END AS status_fixed,
             CASE WHEN upper(o_orderpriority) LIKE '%URGENT%' THEN '1-URGENT'
                  ELSE o_orderpriority END AS priority_fixed,
             'Order ' || CAST(o_orderkey AS VARCHAR) || ' reviewed.' AS note_fixed
      FROM orders"""),
      (s, dir) => t(s, dir, "orders").select(col("o_orderkey"),
        when(col("o_orderstatus").isNull && col("o_totalprice") > 0, "O")
          .otherwise(col("o_orderstatus")).as("status_fixed"),
        when(upper(col("o_orderpriority")).like("%URGENT%"), "1-URGENT")
          .otherwise(col("o_orderpriority")).as("priority_fixed"),
        concat(lit("Order "), col("o_orderkey").cast("string"),
          lit(" reviewed.")).as("note_fixed"))),

    // ---------------------------------------------------------------- Q9
    // Missing-roster audit (rosters_wdrs.Rmd:205-265): key falls back to
    // the clinical accession when the primary is null (coalesce key),
    // anti-joined against the present set.
    QueryDef("q9_missing_audit", Some("""
      WITH archived AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL
                    ELSE 'SA-' || CAST(o_orderkey AS VARCHAR) END AS sa,
               'SCA-' || CAST(o_orderkey AS VARCHAR) AS sca
        FROM orders),
      present AS (
        SELECT DISTINCT 'SA-' || CAST(l_orderkey AS VARCHAR) AS k FROM lineitem
        WHERE l_orderkey % 2 = 0)
      SELECT a.o_orderkey FROM archived a
      WHERE NOT EXISTS (SELECT 1 FROM present p WHERE COALESCE(a.sa, a.sca) = p.k)"""),
      (s, dir) => {
        val archived = t(s, dir, "orders").select(col("o_orderkey"),
          when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("SA-"), col("o_orderkey").cast("string"))).as("sa"),
          concat(lit("SCA-"), col("o_orderkey").cast("string")).as("sca"))
        val present = t(s, dir, "lineitem")
          .filter(col("l_orderkey") % 2 === 0)
          .select(concat(lit("SA-"), col("l_orderkey").cast("string")).as("k"))
          .distinct()
        archived
          .withColumn("__k", coalesce(col("sa"), col("sca")))
          .join(present, col("__k") === col("k"), "left_anti")
          .select("o_orderkey")
      }),

    // ---------------------------------------------------------------- F9
    // Vocab-validated extraction (elr.Rmd:407-443): extract then keep only
    // values in the controlled list, else null.
    QueryDef("f9_validated_extract", Some("""
      SELECT event_id,
             CASE WHEN regexp_extract(props, '"k": (\d+)', 1) IN ('1','2','3','5','8','13')
                  THEN regexp_extract(props, '"k": (\d+)', 1) END AS k_validated
      FROM events"""),
      (s, dir) => {
        val ex = regexp_extract(col("props"), "\"k\": (\\d+)", 1)
        t(s, dir, "events")
          .withColumn("__ex", ex)
          .select(col("event_id"),
            when(col("__ex").isin("1", "2", "3", "5", "8", "13"), col("__ex"))
              .as("k_validated"))
      }),

    // ---------------------------------------------------------------- Q3
    // File-level validation battery (template_submitters.Rmd:394-538):
    // synthetic submission files derived from orders — 4 submitters x 3
    // files, each submitter exhibiting one characteristic defect (Helix:
    // GISAID format; Labcorp: lab vocabulary; NW_Genomics: date shape) —
    // folded to one verdict row per file by FileValidation.validate.
    QueryDef("q3_file_validation", Some("""
      WITH base AS (
        SELECT o_orderkey,
               CASE CAST(o_orderkey % 4 AS INTEGER)
                 WHEN 0 THEN 'Aegis' WHEN 1 THEN 'Helix'
                 WHEN 2 THEN 'Labcorp' ELSE 'NW_Genomics' END AS sub,
               CASE CAST(o_orderkey % 3 AS INTEGER)
                 WHEN 0 THEN 'COMPLETE' WHEN 1 THEN 'LOW QUALITY'
                 ELSE 'FAILED' END AS status
        FROM orders),
      src AS (
        SELECT
          'Submissions/' || sub || '/f' || CAST(o_orderkey % 3 AS VARCHAR)
            || '.csv' AS _provenance,
          sub, status,
          CASE WHEN status <> 'FAILED' THEN
            CASE WHEN sub IN ('Aegis', 'Helix')
                   THEN 'ASC' || CAST(o_orderkey AS VARCHAR) || '-B.1'
                 WHEN sub = 'Labcorp' THEN 'LC' || CAST(o_orderkey AS VARCHAR)
                 ELSE 'USA/WA-NWG-' || CAST(o_orderkey AS VARCHAR) || '/2021'
            END END AS gisaid_id,
          CASE WHEN sub = 'Labcorp' THEN 'Labcorp Inc' ELSE sub END AS lab,
          'SENTINEL SURVEILLANCE' AS reason,
          CASE WHEN sub = 'NW_Genomics' THEN 'Jan 15, 2021'
               ELSE '01-15-2021' END AS cdate,
          'B.1.1.7' AS lineage
        FROM base),
      checked AS (
        SELECT _provenance,
          coalesce(regexp_matches(cdate,
            '[0-9]{1,2}[[:punct:]][0-9]{1,2}[[:punct:]][0-9]{4}|[0-9]{4}[[:punct:]][0-9]{1,2}[[:punct:]][0-9]{1,2}|[0-9]{5}'),
            FALSE) AS r_date,
          ((upper(status) IN ('COMPLETE', 'LOW QUALITY') AND
            coalesce(regexp_matches(gisaid_id,
              CASE WHEN sub = 'Aegis' THEN '^ASC([0-9])*-B.*'
                   WHEN sub = 'Helix' THEN 'USA/WA-CDC-STM-.*'
                   WHEN sub = 'Labcorp' THEN '^LC[0-9]*$'
                   ELSE '^(hCoV-19/)?USA/WA-.*/[0-9]{4}$' END), FALSE))
           OR (coalesce(upper(status) <> 'COMPLETE', TRUE) AND gisaid_id IS NULL))
            AS r_gisaid,
          coalesce(lab IN ('Aegis', 'Helix', 'Labcorp', 'NW_Genomics'), FALSE) AS r_lab,
          coalesce(upper(lineage) IN ('B.1.1.7', 'XBB.1.5'), FALSE) AS r_lineage,
          coalesce(upper(reason) IN ('SENTINEL SURVEILLANCE', 'OUTBREAK'), FALSE) AS r_reason,
          coalesce(upper(status) IN ('COMPLETE', 'LOW QUALITY', 'FAILED'), FALSE) AS r_status
        FROM src)
      SELECT _provenance,
             bool_and(r_date) AS coll_date_ok,
             bool_and(r_gisaid) AS gisaid_ok,
             bool_and(r_lab) AS lab_ok,
             bool_and(r_lineage) AS lineage_ok,
             bool_and(r_reason) AS reason_ok,
             bool_and(r_status) AS status_ok,
             bool_and(r_date) AND bool_and(r_gisaid) AND bool_and(r_lab)
               AND bool_and(r_lineage) AND bool_and(r_reason)
               AND bool_and(r_status) AS valid
      FROM checked GROUP BY _provenance"""),
      (s, dir) => {
        val o = t(s, dir, "orders")
        val sub = element_at(
          array(lit("Aegis"), lit("Helix"), lit("Labcorp"), lit("NW_Genomics")),
          (col("o_orderkey") % 4).cast("int") + 1)
        val status = element_at(
          array(lit("COMPLETE"), lit("LOW QUALITY"), lit("FAILED")),
          (col("o_orderkey") % 3).cast("int") + 1)
        val gid = when(sub.isin("Aegis", "Helix"),
          concat(lit("ASC"), col("o_orderkey"), lit("-B.1")))
          .when(sub === "Labcorp", concat(lit("LC"), col("o_orderkey")))
          .otherwise(concat(lit("USA/WA-NWG-"), col("o_orderkey"), lit("/2021")))
        val src = o.select(
          concat(lit("Submissions/"), sub, lit("/f"),
            (col("o_orderkey") % 3).cast("string"), lit(".csv")).as("_provenance"),
          when(status =!= "FAILED", gid).as("GISAID_ID"),
          status.as("SEQUENCE_STATUS"),
          when(sub === "Labcorp", "Labcorp Inc").otherwise(sub).as("SUBMITTING_LAB"),
          lit("SENTINEL SURVEILLANCE").as("SEQUENCE_REASON"),
          when(sub === "NW_Genomics", "Jan 15, 2021").otherwise("01-15-2021")
            .as("SPECIMEN_COLLECTION_DATE"),
          lit("B.1.1.7").as("PANGO_LINEAGE"))
        graft.qa.FileValidation.validate(src,
          labValues = Seq("Aegis", "Helix", "Labcorp", "NW_Genomics"),
          reasonValues = Seq("SENTINEL SURVEILLANCE", "OUTBREAK"),
          statusValues = Seq("COMPLETE", "LOW QUALITY", "FAILED"),
          lineageValues = Seq("B.1.1.7", "XBB.1.5"))
      }),

    // ---------------------------------------------------------------- Q2
    // Fuzzy pre-match battery (FuzzyMatch.preMatchRules, fuzzy.Rmd:399-462):
    // usable-name / real-DOB / collection-date flags over a customer-derived
    // demographic frame (Excel-epoch DOBs and digit-bearing names seeded by
    // key arithmetic).
    QueryDef("q2_prematch_checks", Some("""
      WITH src AS (
        SELECT c_custkey,
               CASE WHEN c_custkey % 7 = 0 THEN NULL
                    WHEN c_custkey % 7 = 1 THEN 'JO3HN' || CAST(c_custkey AS VARCHAR)
                    ELSE 'FIRST' END AS first_name,
               CASE WHEN c_custkey % 5 = 0 THEN '' ELSE 'LAST' END AS last_name,
               CASE WHEN c_custkey % 3 = 0 THEN DATE '1899-12-30'
                    WHEN c_custkey % 3 = 1 THEN NULL
                    ELSE DATE '1980-06-01' END AS dob,
               CASE WHEN c_custkey % 2 = 0 THEN DATE '2021-03-01' END AS collection_date
        FROM customer)
      SELECT c_custkey,
             CASE WHEN first_name IS NULL OR trim(first_name) = ''
                    OR last_name IS NULL OR trim(last_name) = ''
                    OR regexp_matches(first_name, '[0-9]')
                    OR regexp_matches(last_name, '[0-9]')
                  THEN 1 ELSE 0 END AS QA_NAME_NA,
             CASE WHEN dob IS NULL OR dob = DATE '1899-12-30'
                  THEN 1 ELSE 0 END AS QA_DOB_NA,
             CASE WHEN collection_date IS NULL THEN 1 ELSE 0 END AS QA_COLLECT_DATE_NA
      FROM src"""),
      (s, dir) => {
        val src = t(s, dir, "customer").select(
          col("c_custkey"),
          when(col("c_custkey") % 7 === 0, lit(null).cast("string"))
            .when(col("c_custkey") % 7 === 1,
              concat(lit("JO3HN"), col("c_custkey").cast("string")))
            .otherwise(lit("FIRST")).as("first_name"),
          when(col("c_custkey") % 5 === 0, lit("")).otherwise(lit("LAST"))
            .as("last_name"),
          when(col("c_custkey") % 3 === 0, to_date(lit("1899-12-30")))
            .when(col("c_custkey") % 3 === 1, lit(null).cast("date"))
            .otherwise(to_date(lit("1980-06-01"))).as("dob"),
          when(col("c_custkey") % 2 === 0, to_date(lit("2021-03-01")))
            .as("collection_date"))
        graft.qa.QaRules.applyBattery(src,
            graft.pipelines.FuzzyMatch.preMatchRules())
          .select("c_custkey", "QA_NAME_NA", "QA_DOB_NA", "QA_COLLECT_DATE_NA")
      }),

    // ------------------------------------------------------------ Q2+J8
    // The CROSS-RUN saved_rows state machine (FuzzyMatch.runWithSavedRows,
    // fuzzy.Rmd:1078-1086), oracled end-to-end: two fuzzy-match runs over
    // one temp SnapshotStore. Run 1 = odd custkeys vs cases %3=0; run 2 =
    // even custkeys PLUS resubmissions (%10=1, collection date shifted
    // +10 days — the keep-new rule must take today's row) vs the grown
    // target (%3 in (0,1)), with run 1's unmatched rows re-entering from
    // the published state. The output is every rowid ever submitted with
    // its FINAL disposition and the run whose judgment stands — per-rowid
    // conservation is the row count itself. Construction keeps the oracle
    // exact: names are letter-encoded keys (no digits, so the QA battery
    // only fires on the %37 null-name arm), DOBs are unique per key (the
    // exact-DOB post-filter makes candidate sets singletons, so a row
    // matched in run 1 gains nothing from the grown target), %11 bumps
    // distance to 2 (manual_review tier), %13 to >=4 (no match -> saved
    // despite a case existing), %40 drives the ±14-day window flag.
    QueryDef("q2_saved_rows_rerun", Some("""
      WITH subs AS (
        SELECT CAST(c_custkey AS BIGINT) AS rowid,
               CASE WHEN c_custkey % 37 = 0 THEN NULL
                    ELSE 'FN' || translate(CAST(c_custkey % 50 AS VARCHAR), '0123456789', 'ABCDEFGHIJ') END AS first_name,
               'LN' || translate(CAST(c_custkey AS VARCHAR), '0123456789', 'ABCDEFGHIJ') AS last_name,
               DATE '1970-01-01' + CAST(c_custkey AS INTEGER) AS dob,
               DATE '2021-01-01' + CAST(c_custkey % 300 AS INTEGER) AS coll0
        FROM customer),
      eff AS (
        SELECT rowid, first_name, last_name, dob,
               CASE WHEN rowid % 2 = 1 AND rowid % 10 = 1 THEN coll0 + 10 ELSE coll0 END AS coll
        FROM subs),
      cases AS (
        SELECT CAST(c_custkey AS BIGINT) AS case_id,
               CASE WHEN c_custkey % 11 = 0 THEN 'F' ELSE 'FN' END ||
                 translate(CAST(c_custkey % 50 AS VARCHAR), '0123456789', 'ABCDEFGHIJ') AS r_first,
               CASE WHEN c_custkey % 13 = 0 THEN 'ZZZZ' ELSE 'LM' END ||
                 translate(CAST(c_custkey AS VARCHAR), '0123456789', 'ABCDEFGHIJ') AS r_last,
               DATE '1970-01-01' + CAST(c_custkey AS INTEGER) AS r_dob,
               DATE '2021-01-01' + CAST(c_custkey % 300 AS INTEGER)
                 + CAST(c_custkey % 40 - 20 AS INTEGER) AS wdrs
        FROM customer WHERE c_custkey % 3 IN (0, 1)),
      cand AS (
        SELECT e.rowid, c.case_id,
               CAST(damerau_levenshtein(e.first_name || '_' || e.last_name,
                                        c.r_first || '_' || c.r_last) AS INTEGER) AS distance,
               e.coll, c.wdrs
        FROM eff e JOIN cases c ON e.dob = c.r_dob
        WHERE e.first_name IS NOT NULL
          AND damerau_levenshtein(e.first_name || '_' || e.last_name,
                                  c.r_first || '_' || c.r_last) <= 3),
      matched AS (
        SELECT rowid, case_id, distance,
               CASE WHEN distance <= 1 THEN 'roster' ELSE 'manual_review' END AS tier,
               CASE WHEN abs(date_diff('day', wdrs, coll)) <= 14 THEN 0 ELSE 1 END AS qa_collect,
               coll
        FROM cand)
      SELECT e.rowid, 'bad' AS disposition,
             CASE WHEN e.rowid % 2 = 0 OR e.rowid % 10 = 1 THEN 2 ELSE 1 END AS run,
             CAST(NULL AS BIGINT) AS case_id, CAST(NULL AS INTEGER) AS distance,
             CAST(NULL AS VARCHAR) AS tier, CAST(NULL AS INTEGER) AS qa_collect,
             strftime(e.coll, '%Y-%m-%d') AS coll_date
      FROM eff e WHERE e.first_name IS NULL
      UNION ALL
      SELECT m.rowid, 'matched',
             CASE WHEN m.rowid % 2 = 1 AND m.rowid % 10 <> 1 AND m.rowid % 3 = 0 THEN 1 ELSE 2 END,
             m.case_id, m.distance, m.tier, m.qa_collect, strftime(m.coll, '%Y-%m-%d')
      FROM matched m
      UNION ALL
      SELECT e.rowid, 'saved', 2,
             CAST(NULL AS BIGINT), CAST(NULL AS INTEGER),
             CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER), strftime(e.coll, '%Y-%m-%d')
      FROM eff e
      WHERE e.first_name IS NOT NULL
        AND e.rowid NOT IN (SELECT rowid FROM matched)"""),
      (s, dir) => {
        val digits = "0123456789"; val letters = "ABCDEFGHIJ"
        val base = t(s, dir, "customer")
          .select(col("c_custkey").cast("long").as("k"))
        val subsAll = base.select(
          col("k").as("rowid"),
          when(col("k") % 37 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("FN"),
              translate((col("k") % 50).cast("string"), digits, letters)))
            .as("first_name"),
          concat(lit("LN"), translate(col("k").cast("string"), digits, letters))
            .as("last_name"),
          date_add(to_date(lit("1970-01-01")), col("k").cast("int")).as("dob"),
          date_add(to_date(lit("2021-01-01")), (col("k") % 300).cast("int"))
            .as("collection_date"))
        val batch1 = subsAll.filter(col("rowid") % 2 === 1)
        val resub = batch1.filter(col("rowid") % 10 === 1)
          .withColumn("collection_date", date_add(col("collection_date"), 10))
        val batch2 = subsAll.filter(col("rowid") % 2 === 0).unionByName(resub)
        def cases(keyFilter: org.apache.spark.sql.Column): DataFrame =
          base.filter(keyFilter).select(
            col("k").as("case_id"),
            concat(when(col("k") % 11 === 0, "F").otherwise("FN"),
              translate((col("k") % 50).cast("string"), digits, letters))
              .as("first_name"),
            concat(when(col("k") % 13 === 0, "ZZZZ").otherwise("LM"),
              translate(col("k").cast("string"), digits, letters))
              .as("last_name"),
            lit(null).cast("string").as("alt_first_name"),
            lit(null).cast("string").as("alt_last_name"),
            date_add(to_date(lit("1970-01-01")), col("k").cast("int")).as("dob"),
            date_add(
              date_add(to_date(lit("2021-01-01")), (col("k") % 300).cast("int")),
              (col("k") % 40 - 20).cast("int")).as("wdrs_collection"))
        val target1 = cases(col("k") % 3 === 0)
        val target2 = cases(col("k") % 3 === 0 || col("k") % 3 === 1)
        val store = new graft.sources.SnapshotStore(s,
          Tables.freshScratch("saved_rows"))
        val (bad1, m1, _) =
          graft.pipelines.FuzzyMatch.runWithSavedRows(batch1, target1, store)
        val (bad2, m2, un2) =
          graft.pipelines.FuzzyMatch.runWithSavedRows(batch2, target2, store)
        val batch2Ids = batch2.select("rowid")
        def mOut(m: DataFrame, run: Int): DataFrame = m.select(col("rowid"),
          lit("matched").as("disposition"), lit(run).as("run"), col("case_id"),
          col("distance"), col("tier"), col("QA_COLLECT_DATE").as("qa_collect"),
          date_format(col("collection_date"), "yyyy-MM-dd").as("coll_date"))
        def noMatchOut(d: DataFrame, disposition: String, run: Int): DataFrame =
          d.select(col("rowid"), lit(disposition).as("disposition"),
            lit(run).as("run"), lit(null).cast("long").as("case_id"),
            lit(null).cast("int").as("distance"),
            lit(null).cast("string").as("tier"),
            lit(null).cast("int").as("qa_collect"),
            date_format(col("collection_date"), "yyyy-MM-dd").as("coll_date"))
        mOut(m2, 2)
          .unionByName(noMatchOut(bad2, "bad", 2))
          .unionByName(noMatchOut(un2, "saved", 2))
          .unionByName(mOut(m1.join(batch2Ids, Seq("rowid"), "left_anti"), 1))
          .unionByName(noMatchOut(bad1.join(batch2Ids, Seq("rowid"), "left_anti"), "bad", 1))
      }),

    // ---------------------------------------------------------------- Q9b
    // Per-lab missing-SEQUENCE_REASON rollup (missing_sequence_reason.Rmd:
    // 106-116): one row per lab that HAS missing reasons, carrying the
    // missing count, lab total, and missing fraction. Reason nulls are
    // keyed off order arithmetic; lab = priority class.
    QueryDef("q9_missing_reason_pct", Some("""
      WITH src AS (
        SELECT o_orderpriority AS lab,
               CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE 'SENTINEL SURVEILLANCE' END AS reason
        FROM orders),
      g AS (
        SELECT lab,
               CAST(SUM(CASE WHEN reason IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS is_missing,
               CAST(COUNT(*) AS BIGINT) AS lab_total
        FROM src GROUP BY lab)
      SELECT lab, is_missing, lab_total,
             round(is_missing / CAST(lab_total AS DOUBLE), 6) AS percent_missing
      FROM g WHERE is_missing > 0"""),
      (s, dir) => t(s, dir, "orders")
        .select(col("o_orderpriority").as("lab"),
          when(col("o_orderkey") % 7 === 0, lit(null).cast("string"))
            .otherwise(lit("SENTINEL SURVEILLANCE")).as("reason"))
        .groupBy("lab")
        .agg(sum(when(col("reason").isNull, 1).otherwise(0)).as("is_missing"),
          count(lit(1)).as("lab_total"))
        .filter(col("is_missing") > 0)
        .select(col("lab"), col("is_missing"), col("lab_total"),
          round(col("is_missing").cast("double") / col("lab_total"), 6)
            .as("percent_missing"))),

    // ---------------------------------------------------------------- Q9c
    // Silently-filtered observation audit (check_for_filtered_observations
    // .Rmd:370-392): submitted rows not in the clean roster nor ANY manual
    // review bucket (chained anti-joins), split into the SA arm (accession
    // present, not in WDRS flat) and the SA-null arm (checked against the
    // clinical accession instead). Every row the pipeline dropped must be
    // explainable — these are the unexplained ones.
    QueryDef("q9_filtered_obs", Some("""
      WITH sub AS (
        SELECT o_orderkey AS k,
               CASE WHEN o_orderkey % 11 = 0 THEN NULL
                    ELSE 'SA' || CAST(o_orderkey AS VARCHAR) END AS sa,
               'SCA' || CAST(o_orderkey AS VARCHAR) AS sca
        FROM orders),
      leftover AS (
        SELECT DISTINCT * FROM sub
        WHERE k % 2 <> 0 AND k % 3 <> 0 AND k % 5 <> 0 AND k % 7 <> 0),
      arm_sa AS (
        SELECT k, sa, sca, 'no_wdrs_sa' AS arm FROM leftover
        WHERE sa IS NOT NULL AND k % 13 <> 0),
      arm_sca AS (
        SELECT k, sa, sca, 'no_wdrs_sca' AS arm FROM leftover
        WHERE sa IS NULL AND k % 17 <> 0)
      SELECT * FROM arm_sa UNION ALL SELECT * FROM arm_sca"""),
      (s, dir) => {
        val sub = t(s, dir, "orders").select(
          col("o_orderkey").as("k"),
          when(col("o_orderkey") % 11 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("SA"), col("o_orderkey").cast("string"))).as("sa"),
          concat(lit("SCA"), col("o_orderkey").cast("string")).as("sca"))
        // rostered + three manual-review buckets, as key frames
        def bucket(m: Int) = sub.filter(col("k") % m === 0).select("k")
        val leftover = Seq(2, 3, 5, 7).map(bucket)
          .foldLeft(sub)((d, b) => d.join(b, Seq("k"), "left_anti"))
          .distinct()
        // WDRS membership sets (anti-join, not isin: the value sets are
        // table-sized at scale, never a literal list)
        val wdrsSa = sub.filter(col("k") % 13 === 0)
          .select(col("sa")).filter(col("sa").isNotNull)
        val wdrsSca = sub.filter(col("k") % 17 === 0).select(col("sca"))
        val armSa = leftover.filter(col("sa").isNotNull)
          .join(wdrsSa, Seq("sa"), "left_anti")
          .select(col("k"), col("sa"), col("sca"), lit("no_wdrs_sa").as("arm"))
        val armSca = leftover.filter(col("sa").isNull)
          .join(wdrsSca, Seq("sca"), "left_anti")
          .select(col("k"), col("sa"), col("sca"), lit("no_wdrs_sca").as("arm"))
        armSa.unionByName(armSca)
      }),

    // ---------------------------------------------------------------- U4
    // Column-name-intersection union (Joins.harmonizedUnion(intersectOnly),
    // read_all_data.Rmd's schema harmonization): two feeds sharing only a
    // key subset union on the common columns.
    QueryDef("u4_harmonized_union", Some("""
      SELECT o_orderkey AS k, o_orderstatus AS status FROM orders WHERE o_orderkey % 2 = 0
      UNION ALL
      SELECT o_orderkey AS k, o_orderpriority AS status FROM orders WHERE o_orderkey % 2 = 1"""),
      (s, dir) => {
        val o = t(s, dir, "orders")
        val a = o.filter(col("o_orderkey") % 2 === 0)
          .select(col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
            col("o_totalprice").as("only_in_a"))
        val b = o.filter(col("o_orderkey") % 2 === 1)
          .select(col("o_orderkey").as("k"), col("o_orderpriority").as("status"),
            col("o_orderdate").as("only_in_b"))
        graft.operators.Joins.harmonizedUnion(Seq(a, b), intersectOnly = true)
      }),

    // ---------------------------------------------------------------- Q6
    // Duplicate-resolution decision tree (DupResolution.resolve,
    // QA_for_review.Rmd routing): unique -> roster, same-case dup -> one
    // deterministic survivor + removals, cross-case dup -> manual review.
    QueryDef("q6_dup_resolution", Some("""
      WITH src AS (
        SELECT o_orderkey,
               'ACC-' || CAST(o_orderkey // 4 AS VARCHAR) AS acc,
               CASE WHEN o_orderkey % 16 < 8
                    THEN 'C' || CAST(o_orderkey // 4 AS VARCHAR)
                    ELSE 'C' || CAST(o_orderkey AS VARCHAR) END AS case_id
        FROM orders),
      grp AS (
        SELECT acc, count(*) AS n, count(DISTINCT case_id) AS ncase
        FROM src GROUP BY acc),
      graded AS (
        SELECT src.*, grp.n, grp.ncase,
               row_number() OVER (PARTITION BY src.acc ORDER BY o_orderkey) AS rn
        FROM src JOIN grp USING (acc))
      SELECT o_orderkey, acc, case_id,
             CASE WHEN n = 1 THEN 'unique'
                  WHEN ncase = 1 THEN 'same_case'
                  ELSE 'cross_case' END AS dup_grade,
             CASE WHEN n = 1 THEN 'roster'
                  WHEN ncase = 1 AND rn = 1 THEN 'roster'
                  WHEN ncase = 1 THEN 'remove'
                  ELSE 'manual_review' END AS resolution
      FROM graded"""),
      (s, dir) => {
        // ACC groups of ~4 orders; half the groups share one case
        // (same_case), half span distinct cases (cross_case)
        val src = t(s, dir, "orders").select(
          col("o_orderkey"),
          concat(lit("ACC-"), (col("o_orderkey") / 4).cast("long").cast("string"))
            .as("acc"),
          when(col("o_orderkey") % 16 < 8,
            concat(lit("C"), (col("o_orderkey") / 4).cast("long").cast("string")))
            .otherwise(concat(lit("C"), col("o_orderkey").cast("string")))
            .as("case_id"))
        graft.qa.DupResolution.resolve(src, col("acc"), col("case_id"),
          order = Seq(col("o_orderkey")))
      }),

    // ------------------------------------------------------- separate_rows
    // Parallel-column comma-list explode (SURVEY §2.9, tidyr::separate_rows;
    // QA_for_review.Rmd:144-156) — unpacks the WDRS flattened sequence
    // columns before dedup. DuckDB zips parallel unnests positionally, the
    // exact semantics of the operator.
    QueryDef("sep_rows_explode", Some("""
      WITH src AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 2 = 0
                    THEN 'A' || CAST(o_orderkey AS VARCHAR) ||
                         ',B' || CAST(o_orderkey AS VARCHAR) ||
                         ',C' || CAST(o_orderkey AS VARCHAR)
                    ELSE 'A' || CAST(o_orderkey AS VARCHAR) END AS accs,
               CASE WHEN o_orderkey % 2 = 0 THEN 'd1,d2,d3' ELSE 'd1' END AS dates,
               'YES' AS specimen
        FROM orders)
      SELECT o_orderkey, unnest(string_split(accs, ',')) AS accs,
             unnest(string_split(dates, ',')) AS dates, specimen
      FROM src"""),
      (s, dir) => {
        val okey = col("o_orderkey").cast("string")
        val src = t(s, dir, "orders").select(
          col("o_orderkey"),
          when(col("o_orderkey") % 2 === 0,
            concat(lit("A"), okey, lit(",B"), okey, lit(",C"), okey))
            .otherwise(concat(lit("A"), okey)).as("accs"),
          when(col("o_orderkey") % 2 === 0, lit("d1,d2,d3"))
            .otherwise(lit("d1")).as("dates"),
          lit("YES").as("specimen"))
        graft.operators.SeparateRows.separateRows(src, ",", "accs", "dates")
      }),

    // ---------------------------------------------------------------- J12
    // External-repo enrichment join (RosterCompile.enrichEpiIsl,
    // ROSTER_COMPILE.Rmd:229-254): fill missing EPI_ISL from the GISAID
    // snapshot keyed by accession; existing values win via coalesce.
    QueryDef("j12_epi_enrich", Some("""
      WITH roster AS (
        SELECT 'C' || CAST(o_orderkey AS VARCHAR) AS case_id,
               'USA/WA-NWG-' || CAST(o_orderkey AS VARCHAR) || '/2021' AS acc,
               CASE WHEN o_orderkey % 5 = 0
                    THEN 'EPI_EXISTING_' || CAST(o_orderkey AS VARCHAR) END AS epi
        FROM orders),
      g AS (
        SELECT 'USA/WA-NWG-' || CAST(o_orderkey AS VARCHAR) || '/2021' AS vn,
               'EPI_ISL_' || CAST(o_orderkey AS VARCHAR) AS epi2
        FROM orders WHERE o_orderkey % 3 = 0)
      SELECT roster.case_id AS CASE_ID, roster.acc AS SEQUENCE_ACCESSION,
             coalesce(roster.epi, g.epi2) AS SEQUENCE_EPI_ISL
      FROM roster LEFT JOIN g ON roster.acc = g.vn"""),
      (s, dir) => {
        val o = t(s, dir, "orders")
        val okey = col("o_orderkey").cast("string")
        val roster = o.select(
          concat(lit("C"), okey).as("CASE_ID"),
          concat(lit("USA/WA-NWG-"), okey, lit("/2021")).as("SEQUENCE_ACCESSION"),
          when(col("o_orderkey") % 5 === 0,
            concat(lit("EPI_EXISTING_"), okey)).as("SEQUENCE_EPI_ISL"))
        val gisaid = o.filter(col("o_orderkey") % 3 === 0).select(
          concat(lit("USA/WA-NWG-"), okey, lit("/2021")).as("virus_name"),
          concat(lit("EPI_ISL_"), okey).as("epi_isl"))
        graft.pipelines.RosterCompile.enrichEpiIsl(roster, gisaid)
          .select("CASE_ID", "SEQUENCE_ACCESSION", "SEQUENCE_EPI_ISL")
      }),

    // --------------------------------------------------- Q8 full: gap report
    // Repository-vs-WDRS gap with lab attribution from the virus-name ID
    // parts and per-lab x year share of all submissions
    // (gap_data.Rmd:160-452): virus names synthesized from orders in the
    // reference's wire formats; 'F'-status orders stand in for WDRS-known
    // accessions; pct in basis points (floor) for exact cross-engine
    // arithmetic.
    QueryDef("gap_lab_report", Some("""
      WITH pop AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               'USA/WA-' ||
               CASE CAST(o_orderkey % 6 AS INTEGER)
                 WHEN 0 THEN 'UW' WHEN 1 THEN 'CDC-STM' WHEN 2 THEN 'CDC-LC'
                 WHEN 3 THEN 'PHL' WHEN 4 THEN 'QDX' ELSE 'CDC' END ||
               '-' || CAST(o_orderkey AS VARCHAR) || '/2023' AS virus_name
        FROM orders),
      wdrs AS (SELECT lower(virus_name) AS acc FROM pop WHERE o_orderstatus = 'F'),
      gap AS (
        SELECT * FROM pop
        WHERE lower(virus_name) NOT IN (SELECT acc FROM wdrs)),
      attr AS (
        SELECT yr,
               coalesce(regexp_replace(string_split(virus_name, '-')[2],
                                       '[^A-Za-z_]', '', 'g'), '') AS p1,
               CASE WHEN string_split(virus_name, '-')[3] = '2' THEN '2'
                    ELSE coalesce(regexp_replace(string_split(virus_name, '-')[3],
                                                 '[^A-Za-z_]', '', 'g'), '') END AS p2
        FROM gap),
      labeled AS (
        SELECT yr,
               CASE WHEN p1 = 'UW' THEN 'UW Virology'
                    WHEN p1 = 'CDC' AND p2 = 'STM' THEN 'Helix'
                    WHEN p1 = 'CDC' AND p2 = 'LC' THEN 'Labcorp'
                    WHEN p1 = 'PHL' THEN 'PHL'
                    WHEN p1 = 'QDX' THEN 'Quest'
                    WHEN p1 = 'CDC' AND p2 = '' THEN 'CDC-ORIG'
                    ELSE 'OTHER' END AS gap_lab
        FROM attr),
      popyr AS (SELECT yr, count(*) AS pop_n FROM pop GROUP BY yr)
      SELECT l.gap_lab, l.yr, count(*) AS n,
             CAST(floor(count(*) * 10000.0 / max(p.pop_n)) AS BIGINT) AS pct_bp
      FROM labeled l JOIN popyr p ON l.yr = p.yr
      GROUP BY l.gap_lab, l.yr"""),
      (s, dir) => {
        import graft.pipelines.GapReport
        val o = t(s, dir, "orders")
        val token = element_at(
          array(lit("UW"), lit("CDC-STM"), lit("CDC-LC"),
            lit("PHL"), lit("QDX"), lit("CDC")),
          (col("o_orderkey") % 6).cast("int") + 1)
        val pop = o.select(
          col("o_orderstatus"),
          year(col("o_orderdate")).as("yr"),
          concat(lit("USA/WA-"), token, lit("-"),
            col("o_orderkey").cast("string"), lit("/2023")).as("virus_name"))
        val wdrs = pop.filter(col("o_orderstatus") === "F")
          .select(col("virus_name"))
        val gap = GapReport.gapAgainstWdrs(pop, "virus_name", wdrs, "virus_name")
        val labeled = GapReport.withVirusIdParts(gap, "virus_name")
          .withColumn("gap_lab", GapReport.gapLab(
            col("VIRUS_ID_PART1"), col("VIRUS_ID_PART2"),
            lit("CDC-ORIG"), lit("OTHER")))
        GapReport.gapCounts(labeled, "gap_lab", "yr", pop, "yr")
      }),

    // --------------------------------------------------------------- S10
    // The styled gap workbook's conditional-format DECISIONS
    // (gap_data.Rmd:694-851) replayed as data: effective color of every
    // value cell on the two summary sheets (the last-added rule wins a
    // bgFill conflict, so effective = highest threshold cleared — green
    // >=0, yellow >3, orange >5, red >10 in percent; the count sheet's
    // ladder rescaled to 3/5/10% of the total gap count), plus the col-1
    // Grand_Total grey. Same orders-derived gap staging as
    // gap_lab_report; the oracle replays the ladder as CASE expressions
    // in exact integer arithmetic.
    QueryDef("s10_style_rules", Some("""
      WITH pop AS (
        SELECT o_orderkey, o_orderstatus,
               CAST(year(o_orderdate) AS INTEGER) AS yr,
               'USA/WA-' ||
               CASE CAST(o_orderkey % 6 AS INTEGER)
                 WHEN 0 THEN 'UW' WHEN 1 THEN 'CDC-STM' WHEN 2 THEN 'CDC-LC'
                 WHEN 3 THEN 'PHL' WHEN 4 THEN 'QDX' ELSE 'CDC' END ||
               '-' || CAST(o_orderkey AS VARCHAR) || '/2023' AS virus_name
        FROM orders),
      wdrs AS (SELECT lower(virus_name) AS acc FROM pop WHERE o_orderstatus = 'F'),
      gap AS (
        SELECT * FROM pop
        WHERE lower(virus_name) NOT IN (SELECT acc FROM wdrs)),
      attr AS (
        SELECT yr,
               coalesce(regexp_replace(string_split(virus_name, '-')[2],
                                       '[^A-Za-z_]', '', 'g'), '') AS p1,
               CASE WHEN string_split(virus_name, '-')[3] = '2' THEN '2'
                    ELSE coalesce(regexp_replace(string_split(virus_name, '-')[3],
                                                 '[^A-Za-z_]', '', 'g'), '') END AS p2
        FROM gap),
      labeled AS (
        SELECT yr,
               CASE WHEN p1 = 'UW' THEN 'UW Virology'
                    WHEN p1 = 'CDC' AND p2 = 'STM' THEN 'Helix'
                    WHEN p1 = 'CDC' AND p2 = 'LC' THEN 'Labcorp'
                    WHEN p1 = 'PHL' THEN 'PHL'
                    WHEN p1 = 'QDX' THEN 'Quest'
                    WHEN p1 = 'CDC' AND p2 = '' THEN 'CDC-ORIG'
                    ELSE 'OTHER' END AS gap_lab
        FROM attr),
      popyr AS (SELECT yr, count(*) AS pop_n FROM pop GROUP BY yr),
      counts AS (
        SELECT l.gap_lab, l.yr, count(*) AS n,
               CAST(floor(count(*) * 10000.0 / max(p.pop_n)) AS BIGINT) AS pct_bp
        FROM labeled l JOIN popyr p ON l.yr = p.yr
        GROUP BY l.gap_lab, l.yr),
      wt AS (
        SELECT gap_lab, yr, n, pct_bp FROM counts
        UNION ALL
        SELECT 'Grand_Total', yr, CAST(SUM(n) AS BIGINT),
               CAST(SUM(pct_bp) AS BIGINT) FROM counts GROUP BY yr),
      tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total_n FROM counts)
      SELECT 'Summary Proportion' AS sheet, gap_lab, yr, pct_bp AS val,
             CASE WHEN pct_bp > 1000 THEN 'red'
                  WHEN pct_bp > 500 THEN 'orange'
                  WHEN pct_bp > 300 THEN 'yellow'
                  WHEN pct_bp >= 0 THEN 'green' ELSE 'none' END AS color,
             CASE WHEN gap_lab = 'Grand_Total' THEN 'grey' ELSE 'none' END
               AS label_color
      FROM wt
      UNION ALL
      SELECT 'Summary Count', gap_lab, yr, n AS val,
             CASE WHEN n * 100 > 10 * t.total_n THEN 'red'
                  WHEN n * 100 > 5 * t.total_n THEN 'orange'
                  WHEN n * 100 > 3 * t.total_n THEN 'yellow'
                  WHEN n >= 0 THEN 'green' ELSE 'none' END AS color,
             CASE WHEN gap_lab = 'Grand_Total' THEN 'grey' ELSE 'none' END
               AS label_color
      FROM wt, tot t"""),
      (s, dir) => {
        import graft.pipelines.GapReport
        val o = t(s, dir, "orders")
        val token = element_at(
          array(lit("UW"), lit("CDC-STM"), lit("CDC-LC"),
            lit("PHL"), lit("QDX"), lit("CDC")),
          (col("o_orderkey") % 6).cast("int") + 1)
        val pop = o.select(
          col("o_orderstatus"),
          year(col("o_orderdate")).as("yr"),
          concat(lit("USA/WA-"), token, lit("-"),
            col("o_orderkey").cast("string"), lit("/2023")).as("virus_name"))
        val wdrs = pop.filter(col("o_orderstatus") === "F")
          .select(col("virus_name"))
        val gap = GapReport.gapAgainstWdrs(pop, "virus_name", wdrs, "virus_name")
        val labeled = GapReport.withVirusIdParts(gap, "virus_name")
          .withColumn("gap_lab", GapReport.gapLab(
            col("VIRUS_ID_PART1"), col("VIRUS_ID_PART2"),
            lit("CDC-ORIG"), lit("OTHER")))
        GapReport.summaryStyleMatrix(
          GapReport.gapCounts(labeled, "gap_lab", "yr", pop, "yr"))
      }),

    // ---------------------------------------------------------------- S4
    // JDBC pull END-TO-END under the oracle: customer-derived rows staged
    // into an embedded Derby database (driver-side inserts — control
    // plane, the reference's ODBC source scale), read back through
    // Jdbc.pull with the fuzzy.Rmd:213-228 predicate shape
    // (CODE = 'SARS' AND STATUS != 6), and REQUIRED to carry
    // PushedFilters on the scan — a Spark-side filter over a full table
    // dump would throw, not pass. The rows that exit the database are
    // under the hash.
    QueryDef("s4_jdbc_pushdown", Some("""
      SELECT c_custkey AS id,
             'lab' || CAST(c_custkey % 5 AS VARCHAR) AS lab
      FROM customer WHERE c_custkey % 3 = 0 AND c_custkey % 7 <> 6"""),
      (s, dir) => {
        import java.sql.DriverManager
        val root = Tables.freshScratch("s4")
        val url = s"jdbc:derby:$root/db;create=true"
        val keys = t(s, dir, "customer").select(col("c_custkey").cast("long"))
          .collect().map(_.getLong(0))
        val conn = DriverManager.getConnection(url)
        try {
          val st = conn.createStatement()
          st.execute("""CREATE TABLE submissions (
            id BIGINT PRIMARY KEY, code VARCHAR(16), status INT,
            lab VARCHAR(32))""")
          val ins = conn.prepareStatement(
            "INSERT INTO submissions VALUES (?, ?, ?, ?)")
          keys.foreach { i =>
            ins.setLong(1, i)
            ins.setString(2, if (i % 3 == 0) "SARS" else "FLU")
            ins.setInt(3, (i % 7).toInt)
            ins.setString(4, s"lab${i % 5}")
            ins.addBatch()
          }
          ins.executeBatch()
        } finally conn.close()
        val df = graft.sources.Jdbc.pull(s, url, "submissions",
          Some(col("CODE") === "SARS" && col("STATUS") =!= 6))
        val plan = df.queryExecution.executedPlan.toString
        require(plan.contains("PushedFilters:") &&
          plan.contains("EqualTo(CODE,SARS)"),
          s"WHERE did not reach the JDBC scan:\n$plan")
        // materialize the pull, then SHUT DOWN the embedded engine: each
        // execution boots a fresh scratch database, and Derby keeps its
        // page cache, lock manager and background threads alive until JVM
        // exit otherwise — repeated verify/bench executions would
        // accumulate live engines in the driver
        val out = df.select(col("ID").as("id"), col("LAB").as("lab"))
          .localCheckpoint(true)
        try { DriverManager.getConnection(s"jdbc:derby:$root/db;shutdown=true"); () }
        catch { case _: java.sql.SQLException => () } // shutdown SIGNALS via SQLException
        out
      }),

    // ---------------------------------------------------------------- S7
    // CSV sink NA-as-empty + deterministic chunking END-TO-END: an
    // orders-derived roster (with planted nulls) goes through
    // RosterSink.writeChunked (null→empty on write, ≤500-row chunk
    // directories) and is read back from the FILESYSTEM — the null round
    // trip, the header, and the global-order chunk assignment are all
    // under the hash (DuckDB recomputes the chunk from the same string
    // ordering).
    QueryDef("s7_csv_na_empty", Some("""
      SELECT CAST(o_orderkey AS VARCHAR) AS rowid,
             CASE WHEN o_orderkey % 3 = 0 THEN NULL
                  ELSE 'n' || CAST(o_orderkey AS VARCHAR) END AS note,
             o_orderstatus AS status,
             CAST(CEIL(ROW_NUMBER() OVER (ORDER BY CAST(o_orderkey AS VARCHAR))
                       / 500.0) AS INTEGER) AS chunk
      FROM orders"""),
      (s, dir) => {
        val root = Tables.freshScratch("s7")
        val roster = t(s, dir, "orders").select(
          col("o_orderkey").cast("string").as("rowid"),
          when(col("o_orderkey") % 3 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("n"), col("o_orderkey").cast("string")))
            .as("note"),
          col("o_orderstatus").as("status"))
        // distributedAbove = MaxValue PINS the global-order chunk path:
        // the DuckDB mirror computes dense ROW_NUMBER chunks, which only
        // the global variant produces — at >1M input rows writeChunked's
        // default would switch to withChunkIdDistributed, whose sparse
        // partition-local ids are correct but not ROW_NUMBER-replayable
        // (that variant is spec-covered in TemplateSubmittersSpec).
        graft.sinks.RosterSink.writeChunked(
          roster, s"$root/out", Seq("rowid"), maxRows = 500,
          distributedAbove = Long.MaxValue)
        s.read.option("header", "true").csv(s"$root/out")
          .select(col("rowid"), col("note"), col("status"),
            col("_chunk").cast("int").as("chunk"))
      }),

    // ---------------------------------------------------------------- S2
    // XLSX round trip END-TO-END: a supplier-derived sheet written by the
    // workbook sink (real zip + sheet XML), read back by the XLSX source
    // with a declared all-string schema — header row, by-name column
    // matching, and NA-token normalization ('NA' cells → null) all under
    // the hash. Styled/multi-sheet arms stay in XlsxSpec/GapReportSpec.
    QueryDef("s2_xlsx_roundtrip", Some("""
      SELECT CAST(s_suppkey AS VARCHAR) AS skey,
             'X' || CAST(s_suppkey AS VARCHAR) AS name,
             CASE WHEN s_suppkey % 5 = 0 THEN NULL
                  ELSE 'm' || CAST(s_suppkey AS VARCHAR) END AS memo
      FROM supplier"""),
      (s, dir) => {
        val root = Tables.freshScratch("s2")
        val k = col("s_suppkey")
        val sheet = t(s, dir, "supplier").select(
          k.cast("string").as("skey"),
          concat(lit("X"), k.cast("string")).as("name"),
          when(k % 5 === 0, lit("NA"))
            .otherwise(concat(lit("m"), k.cast("string"))).as("memo"))
        graft.sinks.XlsxSink.write(s"$root/wb.xlsx", Seq(("data", sheet)))
        graft.sources.Xlsx.read(s,
            graft.sources.StringCsv.allStringSchema(
              Seq("skey", "name", "memo")),
            Seq(s"$root/wb.xlsx"))
          .select(col("skey"), col("name"), col("memo"))
      }),

    // -------------------------------------- pipeline: template e2e
    // The reference's flagship run END-TO-END under the oracle
    // (template_submitters.Rmd:619-917, the notebook's own golden-diff
    // discipline): customer-derived template CSVs staged to scratch →
    // StringCsv all-string ingest (NA tokens, provenance) → P2 empty-row
    // drop → normalize (multi-format dates, GISAID prefix strip) → J1
    // match vs a constructed ENTIRE (with a planted 1-to-many fan for
    // the J2 keep-first dedup) → full Q1 battery → P5 routing. DuckDB
    // replays the whole chain from the same customer table: every
    // disposition arm, every QA flag, and the J2 winner are under the
    // hash. Key plan: %17 → shared accession 'ADUP' (dup flag, matched);
    // %13 → blank accession (never matches); %3 → absent from ENTIRE;
    // %10 → two ENTIRE rows (keep-first = min CASE_ID); %7/%5 → bad
    // status/reason; %28 ≥ 24 → collection date outside the 14-day
    // window; %4 → demographics present (fuzzy vs keep_na).
    QueryDef("pipeline_template_e2e", Some("""
      WITH sub AS (
        SELECT c_custkey AS k,
          CASE WHEN c_custkey % 17 = 0 THEN 'ADUP'
               WHEN c_custkey % 13 = 0 THEN NULL
               ELSE 'A' || CAST(c_custkey AS VARCHAR) END AS accession,
          'USA/WA-' || CAST(c_custkey AS VARCHAR) || '/2021' AS gisaid_id,
          DATE '2021-03-01' + CAST(c_custkey % 28 AS INTEGER) AS coll,
          CASE WHEN c_custkey % 7 = 0 THEN 1 ELSE 0 END AS qa_stat,
          CASE WHEN c_custkey % 5 = 0 THEN 1 ELSE 0 END AS qa_reason,
          CASE WHEN c_custkey % 4 <> 0 THEN 1 ELSE 0 END AS has_demo
        FROM customer),
      m AS (
        SELECT *,
          CASE WHEN accession = 'ADUP' THEN 9999
               WHEN accession IS NOT NULL AND k % 3 <> 0 THEN 1000 + k
               ELSE NULL END AS case_id,
          CASE WHEN accession = 'ADUP' OR (accession IS NOT NULL AND k % 3 <> 0)
               THEN DATE '2021-03-10' ELSE NULL END AS wdrs_coll
        FROM sub),
      f AS (
        SELECT *,
          CASE WHEN case_id IS NULL THEN 1 ELSE 0 END
            + qa_stat + qa_reason
            + CASE WHEN accession IS NOT NULL
                   AND COUNT(*) OVER (PARTITION BY accession) > 1
                   THEN 1 ELSE 0 END
            + CASE WHEN coll IS NOT NULL AND wdrs_coll IS NOT NULL
                   AND ABS(DATEDIFF('day', wdrs_coll, coll)) > 14
                   THEN 1 ELSE 0 END AS qa_sum
        FROM m)
      SELECT gisaid_id AS rowid, CAST(case_id AS BIGINT) AS case_id, qa_sum,
        CASE WHEN case_id IS NULL AND has_demo = 1 THEN 'fuzzy'
             WHEN case_id IS NULL THEN 'keep_na'
             WHEN qa_sum > 0 THEN 'for_review'
             ELSE 'roster' END AS disposition
      FROM f"""),
      (s, dir) => {
        val routed = PipelineE2e.templateRouted(s, dir)
        routed.select(col("gisaid_id").as("rowid"),
          col("CASE_ID").cast("long").as("case_id"),
          col("qa_sum").cast("int").as("qa_sum"),
          col("disposition"))
      }),

    // ------------------------------- pipeline: template roster build
    // The same e2e run carried through to the 17-column positional
    // roster (template_submitters.Rmd:794-810): only clean matched rows
    // survive, every literal/derived roster column — canonical dates,
    // initcap reason, lineage note with the injected run date, the
    // dotted `Case.Note` header — is under the hash.
    QueryDef("pipeline_template_roster", Some("""
      WITH r AS (
        SELECT c_custkey AS k FROM customer
        WHERE c_custkey % 3 <> 0 AND c_custkey % 13 <> 0
          AND c_custkey % 17 <> 0 AND c_custkey % 7 <> 0
          AND c_custkey % 5 <> 0 AND (c_custkey % 28) < 24)
      SELECT CAST(1000 + k AS VARCHAR) AS "CASE_ID",
             CAST(NULL AS VARCHAR) AS "SEQUENCE_SGTF",
             'YES' AS "SEQUENCE_SPECIMEN",
             CAST(NULL AS VARCHAR) AS "SEQUENCE_DATE",
             'Other' AS "SEQUENCE_REASON",
             'Lab' || CAST(k % 3 AS VARCHAR) AS "SEQUENCE_LAB",
             'COMPLETE' AS "SEQUENCE_STATUS",
             'GISAID' AS "SEQUENCE_REPOSITORY",
             'USA/WA-' || CAST(k AS VARCHAR) || '/2021' AS "SEQUENCE_ACCESSION",
             CAST(NULL AS VARCHAR) AS "SEQUENCE_EPI_ISL",
             'B.1' AS "SEQUENCE_VARIANT_OPEN_TEXT",
             'A' || CAST(k AS VARCHAR) AS "SEQUENCE_CLINICAL_ACCESSION",
             '03/' || lpad(CAST(1 + k % 28 AS VARCHAR), 2, '0') || '/2021'
               AS "SEQUENCE_SPECIMEN_COLLECTION_DATE",
             '04/01/2021' AS "SEQUENCE_ROSTER_PREPARE_DATE",
             'Lineage identified as B.1 on 4/1/2021. Lineage assignments may change over time.'
               AS "SEQUENCE_NOTES",
             CAST(NULL AS VARCHAR) AS "SEQUENCE_REVIEWED",
             'External data question package updated by COVID19 Sequencing Roster.'
               AS "Case.Note"
      FROM r"""),
      (s, dir) => {
        val routed = PipelineE2e.templateRouted(s, dir)
        graft.pipelines.TemplateSubmitters.toRoster(
          routed.filter(col("disposition") === "roster"),
          to_date(lit("2021-04-01")))
      }),

    // ------------------------------------------- pipeline: PHL e2e
    // The internal-lab run END-TO-END (phl.Rmd:515-796): status
    // normalization + PT drop, processed-list dedup, REDCap reason
    // override, Epi name coalesce, the specimen→accession fallback
    // match (J4, inner: unmatched rows drop), positional reason
    // translation, and the None→Unassigned→LOW QUALITY cascade with
    // the FAILED-repository rule — all replayed by DuckDB from part.
    // Key plan: %5 → status variants (PENDING drops, prefixes/case
    // normalize); %7 → PT (drops) / SURV (translated) / NULL; %9 →
    // already processed; %11 → REDCap override; %3 → lineage
    // None/B.1/NULL; odd k → primary match + own names; k%4==0 →
    // fallback match + Epi-coalesced names; k≡2 (mod 4) → unmatched.
    QueryDef("pipeline_phl_e2e", Some("""
      WITH d AS (
        SELECT p_partkey AS k,
          'SP' || CAST(p_partkey AS VARCHAR) AS specimen_id,
          CASE CAST(p_partkey % 5 AS INTEGER)
               WHEN 2 THEN 'FAILED' WHEN 3 THEN 'PENDING'
               ELSE 'COMPLETE' END AS status0,
          CASE CAST(p_partkey % 7 AS INTEGER)
               WHEN 0 THEN 'PT' WHEN 1 THEN 'SURV' WHEN 2 THEN NULL
               ELSE 'OTHER' END AS reason0,
          CASE CAST(p_partkey % 3 AS INTEGER)
               WHEN 0 THEN 'None' WHEN 1 THEN 'B.1' ELSE NULL END AS lineage0
        FROM part),
      kept AS (
        SELECT * FROM d
        WHERE (reason0 IS NULL OR reason0 <> 'PT')
          AND status0 IN ('COMPLETE', 'FAILED')
          AND k % 9 <> 0
          AND (k % 2 = 1 OR k % 4 = 0)),
      e AS (
        SELECT k, specimen_id, status0,
          CASE WHEN k % 11 = 0 THEN 'SENTINEL SURVEILLANCE'
               WHEN reason0 = 'SURV' THEN 'SENTINEL SURVEILLANCE'
               ELSE reason0 END AS reason,
          CASE WHEN lineage0 = 'None' THEN 'Unassigned'
               ELSE lineage0 END AS lineage,
          CASE WHEN k % 2 = 1 THEN 5000 + k ELSE 6000 + k END AS case_id,
          CASE WHEN k % 2 = 1 THEN 'FN' || CAST(k AS VARCHAR)
               ELSE 'EF' || CAST(k AS VARCHAR) END AS first_name
        FROM kept)
      SELECT specimen_id, CAST(case_id AS BIGINT) AS case_id,
        CASE WHEN lineage = 'Unassigned' AND status0 = 'COMPLETE'
             THEN 'LOW QUALITY' ELSE status0 END AS status,
        reason, lineage,
        CASE WHEN status0 = 'FAILED' THEN NULL ELSE 'GISAID' END AS repository,
        first_name
      FROM e"""),
      (s, dir) => {
        val k = col("p_partkey")
        val p = t(s, dir, "part")
        val dash = p.select(
          concat(lit("SP"), k.cast("string")).as("specimen_id"),
          concat(lit("AC"), k.cast("string")).as("accession_id"),
          element_at(array(lit("Completed"), lit("COMPLETE"), lit("FAILED"),
            lit("PENDING"), lit("complete")), (k % 5).cast("int") + 1)
            .as("status"),
          when(k % 7 === 0, "PT").when(k % 7 === 1, "SURV")
            .when(k % 7 === 2, lit(null).cast("string"))
            .otherwise(lit("OTHER")).as("reason"),
          when(k % 3 === 0, "None").when(k % 3 === 1, "B.1")
            .otherwise(lit(null).cast("string")).as("lineage"),
          when(k % 2 === 1, concat(lit("FN"), k.cast("string"))).as("first_name"),
          when(k % 2 === 1, concat(lit("LN"), k.cast("string"))).as("last_name"),
          when(k % 2 === 1, lit("1990-01-01")).as("dob"))
        val redcap = p.filter(k % 11 === 0).select(
          concat(lit("SP"), k.cast("string")).as("specimen_id"),
          lit("p").as("project"))
        val epi = p.filter(k % 4 === 0).select(
          concat(lit("SP"), k.cast("string")).as("specimen_id"),
          concat(lit("EF"), k.cast("string")).as("first_name"),
          concat(lit("EL"), k.cast("string")).as("last_name"),
          lit("1985-05-05").as("dob"))
        val wdrs = p.filter(k % 2 === 1)
          .select((k + 5000).cast("long").as("case_id"),
            concat(lit("SP"), k.cast("string")).as("wdrs_key"))
          .unionByName(p.filter(k % 4 === 0)
            .select((k + 6000).cast("long").as("case_id"),
              concat(lit("AC"), k.cast("string")).as("wdrs_key")))
        val reasonMap = s.range(1).select(lit("SURV").as("input"),
          lit("SENTINEL SURVEILLANCE").as("output"))
        val processed = p.filter(k % 9 === 0).select(
          concat(lit("SP"), k.cast("string")).as("specimen_id"))
        graft.pipelines.Phl.run(dash, redcap, epi, wdrs, reasonMap, processed)
          .select(col("specimen_id"), col("case_id"), col("status"),
            col("reason"), col("lineage"), col("repository"),
            col("first_name"))
      }),

    // ------------------------------------------- pipeline: ELR e2e (r15)
    // The ELR run END-TO-END (elr.Rmd:296-637) — the fourth of the five
    // core workflow scripts to get a driver-gated composed-output row:
    // new-record detection by DOUBLE anti-join (rostered set on
    // accession+collection_date, processed list on accession,
    // elr.Rmd:296-310,531-546) → per-submitter accession synthesis (the
    // Aegis pre/post-2022-05-01 prefix switch, the Helix CDC-STM prefix,
    // the GISAID-prefix strip, elr.Rmd:189-283) → lineage extraction
    // with WITHDRAWN-ALIAS vocabulary resolution (elr.Rmd:407-443) →
    // the Helix preferred-observation collation dedup
    // (elr.Rmd:493-520) → sentinel scan split (elr.Rmd:558-584), every
    // stage's effect under one disposition-labeled hash. Key plan:
    // %2=0 → already rostered (anti-joined away); %9=0 → processed;
    // %3 → submitter (aegis/helix/quest); %13 → null Aegis raw id (null
    // accession); coll = 2022-03-01 + k%120 straddles the Aegis cutoff;
    // %8 → lineage arms on the ODD residues (only odd keys survive the
    // rostered anti-join): 1 → extractable, 3 → withdrawn alias
    // 'BA.5.9'→'BA.5', 5 → Unassigned, 7 → none, with %16=1 →
    // extractable-but-not-in-vocab; helix
    // rows carry TWO observation rows with the preferred row rotating
    // on %5 (SSI-first / NULL-beats-other / SSI-second); %19 → planted
    // 'QA CHECK FAIL' sentinel → disposition 'invalid'.
    QueryDef("pipeline_elr_e2e", Some("""
      WITH b AS (
        SELECT o_orderkey AS k,
          'ACC' || CAST(o_orderkey AS VARCHAR) AS accession,
          DATE '2022-03-01' + CAST(o_orderkey % 120 AS INTEGER) AS coll,
          CASE CAST(o_orderkey % 3 AS INTEGER)
            WHEN 0 THEN 'aegis' WHEN 1 THEN 'helix' ELSE 'quest' END AS submitter
        FROM orders
        WHERE o_orderkey % 2 = 1 AND o_orderkey % 9 <> 0),
      e AS (
        SELECT *,
          CASE WHEN submitter = 'aegis' THEN
                 CASE WHEN k % 13 = 0 THEN NULL
                      ELSE 'LAB-ASC' || CAST(k AS VARCHAR) END
               WHEN submitter = 'helix' THEN 'H' || CAST(k AS VARCHAR)
               ELSE 'hCoV-19/USA/WA-Q' || CAST(k AS VARCHAR) || '/2022' END AS raw_id
        FROM b),
      w AS (
        SELECT *,
          CASE WHEN submitter <> 'helix' THEN NULL
               WHEN k % 5 = 1 THEN NULL
               ELSE 'Sequencing study identifier' END AS obs,
          CASE WHEN submitter <> 'helix' THEN 'N0'
               WHEN k % 5 = 0 THEN 'N1' ELSE 'N2' END AS note
        FROM e),
      g AS (
        SELECT *,
          CASE WHEN submitter = 'aegis' AND raw_id IS NOT NULL
                    AND coll < DATE '2022-05-01'
                 THEN 'USA/WA-CDC-ASC' || CAST(k AS VARCHAR) || '/' ||
                      CAST(year(coll) AS VARCHAR)
               WHEN submitter = 'aegis' AND raw_id IS NOT NULL
                 THEN 'USA/WA-ASC-' || CAST(k AS VARCHAR) || '/' ||
                      CAST(year(coll) AS VARCHAR)
               WHEN submitter = 'helix'
                 THEN 'USA/WA-CDC-STM-' || raw_id || '/' ||
                      CAST(year(coll) AS VARCHAR)
               WHEN submitter = 'aegis' THEN NULL
               ELSE regexp_replace(raw_id, '^hCoV-19/', '') END AS gisaid_id,
          CASE WHEN k % 8 = 1 AND k % 16 <> 1 THEN 'B.1.1.7'
               WHEN k % 8 = 3 THEN 'BA.5'
               WHEN k % 8 = 5 THEN 'Unassigned' END AS lineage
        FROM w)
      SELECT accession, gisaid_id, lineage, obs, note,
             CASE WHEN k % 19 = 0 THEN 'invalid' ELSE 'roster' END AS disposition
      FROM g"""),
      (s, dir) => {
        import s.implicits._
        val k = col("o_orderkey")
        val o = t(s, dir, "orders")
        val submitter = element_at(
          array(lit("aegis"), lit("helix"), lit("quest")),
          (k % 3).cast("int") + 1)
        val coll = date_add(to_date(lit("2022-03-01")), (k % 120).cast("int"))
        val rawId = when(submitter === "aegis",
            when(k % 13 === 0, lit(null).cast("string"))
              .otherwise(concat(lit("LAB-ASC"), k.cast("string"))))
          .when(submitter === "helix", concat(lit("H"), k.cast("string")))
          .otherwise(concat(lit("hCoV-19/USA/WA-Q"), k.cast("string"),
            lit("/2022")))
        val testResult = when(k % 8 === 1,
            when(k % 16 === 1, lit("SARS-CoV-2 XYZ.99 lineage detected"))
              .otherwise(lit("SARS-CoV-2 B.1.1.7 lineage detected")))
          .when(k % 8 === 3, lit("Other; BA.5.9"))
          .when(k % 8 === 5, lit("result Unassigned"))
          .otherwise(lit("inconclusive"))
        val base = o.select(
          concat(lit("ACC"), k.cast("string")).as("accession"),
          coll.as("collection_date"), submitter.as("submitter"),
          rawId.as("raw_id"), testResult.as("test_result"),
          when(k % 19 === 0, lit("QA CHECK FAIL")).otherwise(lit("ok"))
            .as("result_note"),
          k.as("k"))
        // the ELR feed carries one row per Helix PATIENT__CENTRIC__
        // OBSERVATION — two observation rows per Helix record, with the
        // preferred row rotating so ALL THREE collation ranks decide
        val helix = base.filter(col("submitter") === "helix")
        val obsA = helix.withColumn("obs",
            when(col("k") % 5 === 0, lit("Sequencing study identifier"))
              .when(col("k") % 5 === 1, lit("Zother"))
              .otherwise(lit(null).cast("string")))
          .withColumn("obs_note", lit("N1"))
        val obsB = helix.withColumn("obs",
            when(col("k") % 5 === 0 || col("k") % 5 === 1,
              lit(null).cast("string"))
              .otherwise(lit("Sequencing study identifier")))
          .withColumn("obs_note", lit("N2"))
        val elr = obsA.unionByName(obsB).unionByName(
          base.filter(col("submitter") =!= "helix")
            .withColumn("obs", lit(null).cast("string"))
            .withColumn("obs_note", lit("N0")))
        val rostered = o.filter(k % 2 === 0).select(
          concat(lit("ACC"), k.cast("string")).as("accession"),
          coll.as("collection_date"))
        val processed = o.filter(k % 9 === 0).select(
          concat(lit("ACC"), k.cast("string")).as("accession"))
        // vocabulary with a WITHDRAWN alias: BA.5.9 resolves to BA.5
        val vocab = Seq(("B.1.1.7", "B.1.1.7"), ("BA.5", "BA.5"),
          ("BA.5.9", "BA.5")).toDF("lineage", "canonical")
        val fresh = graft.pipelines.Elr.newRecords(elr, rostered, processed)
        val lin = graft.pipelines.Elr.extractLineageResolved(
          graft.pipelines.Elr.synthesizeAccession(fresh), vocab)
        val deduped = graft.pipelines.Elr.preferredRowDedup(
          lin, Seq("accession"), col("obs"), col("obs_note"))
        val (ok, invalid) = graft.pipelines.Elr.sentinelSplit(
          deduped, Seq(col("result_note"), col("test_result")))
        ok.withColumn("disposition", lit("roster"))
          .unionByName(invalid.withColumn("disposition", lit("invalid")))
          .select(col("accession"), col("gisaid_id"), col("lineage"),
            col("obs"), col("obs_note").as("note"), col("disposition"))
      }),

    // ----------------------------------------- pipeline: fuzzy e2e (r15)
    // The fuzzy-match run END-TO-END (fuzzy.Rmd:79-1086) — the LAST core
    // workflow script to get a driver-gated composed-output row:
    // saved_rows ∪ today's CSV batch (a real CSV round trip through the
    // all-string reader + a pre-seeded SnapshotStore state table) →
    // pre-match QA battery → alternate-name/DOB row MULTIPLICATION
    // (fuzzy.Rmd:252-341: alt-name variants, DOB null-fill, disagreeing
    // alt-DOB variants) → birth-year-blocked OSA join with the flipped-
    // name union (≤3 straight / ≤2 flipped, exact-DOB post-filter) →
    // ±14-day collection-date filter WITH the flagged add-back → multi-
    // candidate resolution (QA_MULTIPLE_MATCH) → distance tiering. Every
    // rowid ever submitted lands in exactly one of bad/matched/saved —
    // the rows_printed conservation FuzzyMatchSpec proves is now under
    // the oracle hash. Key plan: %37 → null name (bad); %23 → submission
    // names FLIPPED (only the flipped-name arm can match); %3=2 → no
    // case (saved); %7 → last-name prefix distance tiers 0/1/2/3/4+;
    // %11 → garbage primary names, REAL names only in the alternates;
    // %31 → null case DOB null-filled from alt_dob; %29 → disagreeing
    // alt_dob (only the multiplied DOB variant matches); %17 → twin case
    // (QA_MULTIPLE_MATCH); %40 → ±14d window in/out (out → flagged
    // add-back); %43 → null WDRS date (candidates drop → saved); %53 →
    // pre-seeded saved_rows re-entering. DuckDB replays the whole chain
    // with damerau_levenshtein — verified OSA-equal at every threshold
    // over this construction's full pair space (tools, round 15).
    QueryDef("pipeline_fuzzy_e2e", Some {
      val L = (x: String) =>
        s"translate(CAST($x AS VARCHAR), '0123456789', 'ABCDEFGHIJ')"
      s"""
      WITH base AS (SELECT CAST(c_custkey AS BIGINT) AS k FROM customer),
      subs AS (
        SELECT k AS rowid,
          CASE WHEN k % 37 = 0 THEN NULL
               WHEN k % 23 = 0 THEN 'LB' || ${L("k")}
               ELSE 'FA' || ${L("k % 50")} END AS first_name,
          CASE WHEN k % 23 = 0 THEN 'FA' || ${L("k % 50")}
               ELSE 'LB' || ${L("k")} END AS last_name,
          DATE '1970-01-01' + CAST(k AS INTEGER) AS dob,
          DATE '2021-01-01' + CAST(k % 200 AS INTEGER) AS coll
        FROM base),
      eff AS (
        SELECT * FROM subs
        UNION ALL
        SELECT k + 5000000, 'FA' || ${L("k % 50")}, 'LB' || ${L("k")},
               DATE '1970-01-01' + CAST(k AS INTEGER),
               DATE '2021-01-01' + CAST(k % 200 AS INTEGER)
        FROM base WHERE k % 53 = 0),
      c0 AS (
        SELECT k,
          CASE WHEN k % 11 = 0 THEN 'QQQQQQ'
               ELSE 'FA' || ${L("k % 50")} END AS f,
          CASE WHEN k % 11 = 0 THEN 'WWWWWW'
               ELSE lp || ${L("k")} END AS l,
          CASE WHEN k % 11 = 0 THEN 'FA' || ${L("k % 50")} END AS af,
          CASE WHEN k % 11 = 0 THEN lp || ${L("k")} END AS al,
          CASE WHEN k % 31 = 0 THEN NULL
               WHEN k % 29 = 0 THEN DATE '1900-01-01'
               ELSE DATE '1970-01-01' + CAST(k AS INTEGER) END AS dob0,
          CASE WHEN k % 31 = 0 OR k % 29 = 0
               THEN DATE '1970-01-01' + CAST(k AS INTEGER) END AS alt_dob,
          CASE WHEN k % 43 = 0 THEN NULL
               ELSE DATE '2021-01-01' + CAST(k % 200 AS INTEGER)
                    + CAST(k % 40 - 20 AS INTEGER) END AS wdrs
        FROM (SELECT k, CASE CAST(k % 7 AS INTEGER)
                WHEN 1 THEN 'LQ' WHEN 2 THEN 'MQ' WHEN 3 THEN 'MQX'
                WHEN 4 THEN 'ZZZZ' WHEN 5 THEN 'ZZZZ'
                ELSE 'LB' END AS lp FROM base)
        WHERE k % 3 <> 2),
      cases AS (
        SELECT k AS case_id, f, l, af, al, dob0, alt_dob, wdrs FROM c0
        UNION ALL
        SELECT k + 9000000, f, l, af, al, dob0, alt_dob, wdrs
        FROM c0 WHERE k % 17 = 0),
      filled AS (
        SELECT case_id, f, l, af, al, coalesce(dob0, alt_dob) AS dob,
               alt_dob, wdrs
        FROM cases),
      named AS (
        SELECT case_id, f, l, dob, alt_dob, wdrs FROM filled
        UNION ALL
        SELECT case_id, af AS f, al AS l, dob, alt_dob, wdrs FROM filled
        WHERE af IS NOT NULL AND al IS NOT NULL),
      variants AS (
        SELECT case_id, f, l, dob, wdrs FROM named
        UNION ALL
        SELECT case_id, f, l, alt_dob AS dob, wdrs FROM named
        WHERE alt_dob IS NOT NULL AND alt_dob <> dob),
      cand AS (
        SELECT e.rowid, v.case_id, v.wdrs, e.coll,
          damerau_levenshtein(e.first_name || '_' || e.last_name,
                              v.f || '_' || v.l) AS ds,
          damerau_levenshtein(e.first_name || '_' || e.last_name,
                              v.l || '_' || v.f) AS dfp
        FROM eff e JOIN variants v ON e.dob = v.dob
        WHERE e.first_name IS NOT NULL),
      qual AS (
        SELECT rowid, case_id, wdrs, coll,
          CAST(CASE WHEN ds <= 3 AND dfp <= 2 THEN least(ds, dfp)
                    WHEN ds <= 3 THEN ds ELSE dfp END AS INTEGER) AS d
        FROM cand WHERE ds <= 3 OR dfp <= 2),
      best AS (
        SELECT rowid, case_id, min(d) AS distance,
               max(wdrs) AS wdrs, max(coll) AS coll
        FROM qual GROUP BY rowid, case_id),
      dated AS (
        SELECT *,
          CASE WHEN abs(date_diff('day', wdrs, coll)) <= 14
               THEN 1 ELSE 0 END AS in_w,
          abs(date_diff('day', wdrs, coll)) AS dd
        FROM best WHERE wdrs IS NOT NULL),
      flagged AS (
        SELECT *, max(in_w) OVER (PARTITION BY rowid) AS any_w,
               min(dd) OVER (PARTITION BY rowid) AS min_dd
        FROM dated),
      kept AS (
        SELECT rowid, case_id, distance, coll,
               CASE WHEN any_w = 0 THEN 1 ELSE 0 END AS qa_collect
        FROM flagged
        WHERE (any_w = 1 AND in_w = 1) OR (any_w = 0 AND dd = min_dd)),
      fm AS (
        SELECT rowid, case_id, distance, coll, qa_collect,
               CASE WHEN count(*) OVER (PARTITION BY rowid) > 1
                    THEN 1 ELSE 0 END AS qa_multi,
               CASE WHEN distance <= 1 THEN 'roster'
                    ELSE 'manual_review' END AS tier
        FROM kept)
      SELECT rowid, 'matched' AS disposition, CAST(case_id AS BIGINT) AS case_id,
             distance, tier, qa_collect, qa_multi,
             strftime(coll, '%Y-%m-%d') AS coll_date
      FROM fm
      UNION ALL
      SELECT rowid, 'bad', CAST(NULL AS BIGINT), CAST(NULL AS INTEGER),
             CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER),
             CAST(NULL AS INTEGER), strftime(coll, '%Y-%m-%d')
      FROM eff WHERE first_name IS NULL
      UNION ALL
      SELECT rowid, 'saved', CAST(NULL AS BIGINT), CAST(NULL AS INTEGER),
             CAST(NULL AS VARCHAR), CAST(NULL AS INTEGER),
             CAST(NULL AS INTEGER), strftime(coll, '%Y-%m-%d')
      FROM eff WHERE first_name IS NOT NULL
        AND rowid NOT IN (SELECT rowid FROM fm)"""
    },
      (s, dir) => {
        val digits = "0123456789"; val letters = "ABCDEFGHIJ"
        def L(c: org.apache.spark.sql.Column) =
          translate(c.cast("string"), digits, letters)
        val base = t(s, dir, "customer")
          .select(col("c_custkey").cast("long").as("k"))
        val k = col("k")
        val subs0 = base.select(
          k.as("rowid"),
          when(k % 37 === 0, lit(null).cast("string"))
            .when(k % 23 === 0, concat(lit("LB"), L(k)))
            .otherwise(concat(lit("FA"), L(k % 50))).as("first_name"),
          when(k % 23 === 0, concat(lit("FA"), L(k % 50)))
            .otherwise(concat(lit("LB"), L(k))).as("last_name"),
          date_add(to_date(lit("1970-01-01")), k.cast("int")).as("dob"),
          date_add(to_date(lit("2021-01-01")), (k % 200).cast("int"))
            .as("collection_date"))
        // today's batch arrives as CSV files, like the reference's
        // Submissions/Fuzzy_Match inbox — all-string ingest, then typed
        val root = Tables.freshScratch("pipe_fuzzy")
        subs0.select(col("rowid").cast("string").as("rowid"),
            col("first_name"), col("last_name"),
            col("dob").cast("string").as("dob"),
            col("collection_date").cast("string").as("collection_date"))
          .coalesce(1).write.option("header", "true").csv(s"$root/subs")
        val subs = graft.sources.StringCsv.read(s,
            graft.sources.StringCsv.allStringSchema(Seq("rowid",
              "first_name", "last_name", "dob", "collection_date")),
            Seq(s"$root/subs"))
          .select(col("rowid").cast("long").as("rowid"),
            col("first_name"), col("last_name"),
            col("dob").cast("date").as("dob"),
            col("collection_date").cast("date").as("collection_date"))
        val lastPfx = when(k % 7 === 1, "LQ").when(k % 7 === 2, "MQ")
          .when(k % 7 === 3, "MQX")
          .when(k % 7 === 4 || k % 7 === 5, "ZZZZ").otherwise("LB")
        def caseRows(idOffset: Long): DataFrame = base
          .filter(k % 3 =!= 2)
          .filter(if (idOffset == 0L) lit(true) else k % 17 === 0)
          .select(
            (k + idOffset).as("case_id"),
            when(k % 11 === 0, lit("QQQQQQ"))
              .otherwise(concat(lit("FA"), L(k % 50))).as("first_name"),
            when(k % 11 === 0, lit("WWWWWW"))
              .otherwise(concat(lastPfx, L(k))).as("last_name"),
            when(k % 11 === 0, concat(lit("FA"), L(k % 50)))
              .otherwise(lit(null).cast("string")).as("alt_first_name"),
            when(k % 11 === 0, concat(lastPfx, L(k)))
              .otherwise(lit(null).cast("string")).as("alt_last_name"),
            when(k % 31 === 0, lit(null).cast("date"))
              .when(k % 29 === 0, to_date(lit("1900-01-01")))
              .otherwise(date_add(to_date(lit("1970-01-01")), k.cast("int")))
              .as("dob"),
            when(k % 31 === 0 || k % 29 === 0,
                date_add(to_date(lit("1970-01-01")), k.cast("int")))
              .otherwise(lit(null).cast("date")).as("alt_dob"),
            when(k % 43 === 0, lit(null).cast("date"))
              .otherwise(date_add(
                date_add(to_date(lit("2021-01-01")), (k % 200).cast("int")),
                (k % 40 - 20).cast("int"))).as("wdrs_collection"))
        val target = caseRows(0L).unionByName(caseRows(9000000L))
        // the saved_rows state table, pre-seeded: rowids from a PRIOR run
        // that matched nothing then — they re-enter today's run
        val seeds = base.filter(k % 53 === 0).select(
          (k + 5000000L).as("rowid"),
          concat(lit("FA"), L(k % 50)).as("first_name"),
          concat(lit("LB"), L(k)).as("last_name"),
          date_add(to_date(lit("1970-01-01")), k.cast("int")).as("dob"),
          date_add(to_date(lit("2021-01-01")), (k % 200).cast("int"))
            .as("collection_date"))
        val store = new graft.sources.SnapshotStore(s,
          Tables.freshScratch("pipe_fuzzy_store"))
        store.publish("fuzzy_saved_rows", seeds)
        val (bad, matched, unmatched) =
          graft.pipelines.FuzzyMatch.runWithSavedRows(subs, target, store)
        def noMatch(d: DataFrame, disp: String): DataFrame = d.select(
          col("rowid"), lit(disp).as("disposition"),
          lit(null).cast("long").as("case_id"),
          lit(null).cast("int").as("distance"),
          lit(null).cast("string").as("tier"),
          lit(null).cast("int").as("qa_collect"),
          lit(null).cast("int").as("qa_multi"),
          date_format(col("collection_date"), "yyyy-MM-dd").as("coll_date"))
        matched.select(col("rowid"), lit("matched").as("disposition"),
            col("case_id").cast("long").as("case_id"),
            col("distance").cast("int").as("distance"), col("tier"),
            col("QA_COLLECT_DATE").cast("int").as("qa_collect"),
            col("QA_MULTIPLE_MATCH").cast("int").as("qa_multi"),
            date_format(col("collection_date"), "yyyy-MM-dd").as("coll_date"))
          .unionByName(noMatch(bad, "bad"))
          .unionByName(noMatch(unmatched, "saved"))
      })
  )

  /**
   * Shared staging for the two template-pipeline oracle rows: write the
   * customer-derived 12-column submission CSV to scratch, ingest it
   * through the real all-string reader, construct the ENTIRE snapshot
   * (one row per matchable accession, a second row per %10 key for the
   * J2 fan, one shared-accession 'ADUP' row), and run the full
   * TemplateSubmitters chain.
   */
  private[graft] object PipelineE2e {
    def templateRouted(s: SparkSession, dir: String): DataFrame = {
      val root = Tables.freshScratch("pipe_tmpl")
      val k = col("c_custkey")
      t(s, dir, "customer").select(
          when(k % 17 === 0, lit("ADUP"))
            .when(k % 13 === 0, lit(null).cast("string"))
            .otherwise(concat(lit("A"), k.cast("string")))
            .as("LAB_ACCESSION_ID"),
          when(k % 2 === 0,
            concat(lit("hCoV-19/USA/WA-"), k.cast("string"), lit("/2021")))
            .otherwise(concat(lit("USA/WA-"), k.cast("string"), lit("/2021")))
            .as("GISAID_ID"),
          concat(lit("3/"), (k % 28 + 1).cast("string"), lit("/2021"))
            .as("SPECIMEN_COLLECTION_DATE"),
          concat(lit("Lab"), (k % 3).cast("string")).as("SUBMITTING_LAB"),
          when(k % 5 === 0, lit("NOT A REASON")).otherwise(lit("OTHER"))
            .as("SEQUENCE_REASON"),
          when(k % 7 === 0, lit("NOT A STATUS")).otherwise(lit("COMPLETE"))
            .as("SEQUENCE_STATUS"),
          lit("B.1").as("PANGO_LINEAGE"),
          when(k % 4 =!= 0, concat(lit("F"), k.cast("string"))).as("FIRST_NAME"),
          when(k % 4 =!= 0, concat(lit("L"), k.cast("string"))).as("LAST_NAME"),
          lit(null).cast("string").as("MIDDLE_NAME"),
          when(k % 4 =!= 0, lit("1/2/1980")).otherwise(lit("NA")).as("DOB"),
          lit(null).cast("string").as("ALTERNATIVE_ID"))
        .coalesce(1).write.option("header", "true").csv(s"$root/subs")
      val subs = graft.sources.StringCsv.dropEmptyRows(
        graft.sources.StringCsv.read(s,
          graft.model.Schemas.templateSchema, Seq(s"$root/subs")),
        graft.model.Schemas.templateColumns)
      val k2 = col("k2")
      val base = t(s, dir, "customer").select(k.as("k2"))
        .filter(k2 % 3 =!= 0 && k2 % 13 =!= 0 && k2 % 17 =!= 0)
      def entireRows(offset: Int)(d: DataFrame): DataFrame =
        d.select((k2 + offset).cast("long").as("CASE_ID"),
          concat(lit("A"), k2.cast("string")).as("FILLER__ORDER__NUM"),
          lit("2021-03-10 00:00:00").cast("timestamp")
            .as("SPECIMEN__COLLECTION__DTTM"))
      val entire = entireRows(1000)(base)
        .unionByName(entireRows(2000)(base.filter(k2 % 10 === 0)))
        .unionByName(s.range(1).select(lit(9999L).as("CASE_ID"),
          lit("ADUP").as("FILLER__ORDER__NUM"),
          lit("2021-03-10 00:00:00").cast("timestamp")
            .as("SPECIMEN__COLLECTION__DTTM")))
      graft.pipelines.TemplateSubmitters.run(subs, entire)
    }
  }
}
