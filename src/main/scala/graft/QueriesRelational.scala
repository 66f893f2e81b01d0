package graft

import graft.functions.GraftFunctions._
import graft.operators.{Joins, Routing}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/**
 * Relational operator inventory (SURVEY.md §2.2-§2.6) exercised on the
 * driver's TPC-H-ish tables. Money sums go through decimal so Spark and
 * the DuckDB oracle agree bit-for-bit (see GraftFunctions.exactSum).
 */
object QueriesRelational {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** decimal(18,2) view of a money column. */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 2))

  val defs: Seq[QueryDef] = Seq(

    // ---------------------------------------------------------------- A2
    QueryDef("q1_agg", Some("""
      SELECT l_returnflag, l_linestatus,
             SUM(l_quantity) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
                      (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc,
             SUM(l_quantity) / COUNT(*) AS avg_qty,
             COUNT(*) AS count_order
      FROM lineitem WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
      GROUP BY l_returnflag, l_linestatus"""),
      (s, dir) => t(s, dir, "lineitem")
        .filter(col("l_shipdate").cast("date") <= lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(col("l_quantity")).as("sum_qty"),
          exactSum(col("l_extendedprice")).as("sum_base"),
          sum(dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
            .cast("double").as("sum_disc"),
          (sum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
          count(lit(1)).as("count_order"))),

    // ---------------------------------------------------------------- P1
    QueryDef("p1_project", Some("""
      SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) *
                  (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS net_price
      FROM lineitem"""),
      (s, dir) => t(s, dir, "lineitem").select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("line_no"),
        (dec(col("l_extendedprice")) * (lit(1).cast(DecimalType(18, 2)) - dec(col("l_discount"))))
          .cast("double").as("net_price"))),

    // ---------------------------------------------------------------- P2
    QueryDef("p2_nonempty", Some("""
      SELECT doc_id FROM documents
      WHERE len(list_filter([text, lang, source],
                            x -> x IS NOT NULL AND trim(x) <> '')) >= 2"""),
      (s, dir) => t(s, dir, "documents")
        .filter(size(filter(array(col("text"), col("lang"), col("source")),
          c => c.isNotNull && trim(c) =!= "")) >= 2)
        .select("doc_id")),

    // ---------------------------------------------------------------- P3
    QueryDef("p3_filter", Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
      WHERE o_orderstatus = 'F' AND o_orderpriority <> '1-URGENT'"""),
      (s, dir) => t(s, dir, "orders")
        .filter(col("o_orderstatus") === "F" && col("o_orderpriority") =!= "1-URGENT")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")),

    // ---------------------------------------------------------------- P4
    QueryDef("p4_semi_join", Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""),
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name")),

    QueryDef("p4_anti_join", Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)"""),
      (s, dir) => t(s, dir, "customer")
        .join(t(s, dir, "orders"), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")),

    // ---------------------------------------------------------------- P5
    QueryDef("p5_route", Some("""
      SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent'
                  WHEN o_orderstatus = 'O' THEN 'open'
                  WHEN o_orderstatus = 'F' THEN 'finished'
                  ELSE 'other' END AS disposition,
             COUNT(*) AS n
      FROM orders GROUP BY 1"""),
      (s, dir) => Routing.route(t(s, dir, "orders"), Seq(
          "urgent" -> (col("o_orderpriority") === "1-URGENT"),
          "open" -> (col("o_orderstatus") === "O"),
          "finished" -> (col("o_orderstatus") === "F")), "other")
        .groupBy("disposition").agg(count(lit(1)).as("n"))),

    // ---------------------------------------------------------------- J1
    QueryDef("j1_left_join", Some("""
      SELECT e.event_id, e.user_id, c.c_name, e.value
      FROM events e LEFT JOIN customer c ON e.user_id = c.c_custkey"""),
      (s, dir) => {
        val e = t(s, dir, "events")
        val c = t(s, dir, "customer")
        e.join(c, e("user_id") === c("c_custkey"), "left")
          .select(e("event_id"), e("user_id"), c("c_name"), e("value"))
      }),

    // ---------------------------------------------------------------- J2
    QueryDef("j2_postjoin_dedup", Some("""
      SELECT DISTINCT o.o_orderkey, o.o_orderstatus, l.l_returnflag
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey"""),
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        o.join(l, o("o_orderkey") === l("l_orderkey"))
          .select(o("o_orderkey"), o("o_orderstatus"), l("l_returnflag"))
          .dropDuplicates()
      }),

    // ---------------------------------------------------------------- J3
    QueryDef("j3_enrich_coalesce", Some("""
      SELECT c.c_custkey, n.n_name, COALESCE(r.r_name, 'UNKNOWN') AS region_name
      FROM customer c
      LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
      LEFT JOIN region r ON n.n_regionkey = r.r_regionkey"""),
      (s, dir) => {
        val c = t(s, dir, "customer")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"), "left")
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"), "left")
          .select(c("c_custkey"), n("n_name"),
            coalesce(r("r_name"), lit("UNKNOWN")).as("region_name"))
      }),

    // ---------------------------------------------------------------- J4
    QueryDef("j4_fallback_join", Some("""
      WITH m1 AS (
        SELECT e.event_id, e.user_id, c.c_custkey, c.c_name
        FROM events e JOIN customer c ON e.user_id + 1400 = c.c_custkey),
      miss AS (
        SELECT * FROM events e
        WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE e.user_id + 1400 = c.c_custkey)),
      m2 AS (
        SELECT e.event_id, e.user_id, c.c_custkey, c.c_name
        FROM miss e JOIN customer c ON e.user_id = c.c_custkey)
      SELECT * FROM m1 UNION ALL SELECT * FROM m2"""),
      (s, dir) => {
        val e = t(s, dir, "events").withColumn("__alt", col("user_id") + 1400)
        val c = t(s, dir, "customer")
        Joins.fallbackJoin(e, c, ("__alt", "c_custkey"), ("user_id", "c_custkey"))
          .select("event_id", "user_id", "c_custkey", "c_name")
      }),

    // ---------------------------------------------------------------- J5
    QueryDef("j5_full_outer", Some("""
      SELECT COALESCE(u.user_id, c.c_custkey) AS id,
             CASE WHEN u.user_id IS NULL THEN 'customer_only'
                  WHEN c.c_custkey IS NULL THEN 'event_only'
                  ELSE 'both' END AS presence
      FROM (SELECT DISTINCT user_id FROM events) u
      FULL OUTER JOIN (SELECT DISTINCT c_custkey FROM customer) c
        ON u.user_id = c.c_custkey"""),
      (s, dir) => {
        val u = t(s, dir, "events").select("user_id").distinct()
        val c = t(s, dir, "customer").select("c_custkey").distinct()
        u.join(c, u("user_id") === c("c_custkey"), "full_outer")
          .select(coalesce(u("user_id"), c("c_custkey")).as("id"),
            when(u("user_id").isNull, "customer_only")
              .when(c("c_custkey").isNull, "event_only")
              .otherwise("both").as("presence"))
      }),

    // ---------------------------------------------------------------- J6
    QueryDef("j6_anti_composite", Some("""
      SELECT o_orderkey FROM orders o
      WHERE NOT EXISTS (SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND CAST(l.l_shipdate AS DATE) = CAST(o.o_orderdate AS DATE))"""),
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        o.join(l, o("o_orderkey") === l("l_orderkey") &&
            o("o_orderdate").cast("date") === l("l_shipdate").cast("date"), "left_anti")
          .select("o_orderkey")
      }),

    // ---------------------------------------------------------------- J7/U3
    QueryDef("j7_snapshot_diff", Some("""
      WITH today AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
      yesterday AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
        FROM orders WHERE o_orderkey % 10 <> 0)
      SELECT o_orderkey, 'added' AS diff_kind FROM (SELECT * FROM today EXCEPT SELECT * FROM yesterday)
      UNION ALL
      SELECT o_orderkey, 'removed' AS diff_kind FROM (SELECT * FROM yesterday EXCEPT SELECT * FROM today)"""),
      (s, dir) => {
        val o = t(s, dir, "orders")
        val today = o.select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
        val yesterday = o.filter(col("o_orderkey") % 10 =!= 0)
          .select(col("o_orderkey"), col("o_orderstatus"),
            when(col("o_orderkey") % 13 === 0, col("o_totalprice") * 2)
              .otherwise(col("o_totalprice")).as("o_totalprice"))
        // single-shuffle set diff (see Joins.snapshotDiff): tag sides,
        // group by all columns, keep one-sided rows — not two except()s
        // (4 shuffles)
        val tagged = today.withColumn("__side", lit(1))
          .unionByName(yesterday.withColumn("__side", lit(2)))
        tagged
          .groupBy("o_orderkey", "o_orderstatus", "o_totalprice")
          .agg(max(when(col("__side") === 1, 1).otherwise(0)).as("__t"),
            max(when(col("__side") === 2, 1).otherwise(0)).as("__y"))
          .filter(col("__t") =!= col("__y"))
          .select(col("o_orderkey"),
            when(col("__t") === 1, "added").otherwise("removed").as("diff_kind"))
      }),

    // ------------------------------------------------------- J7 causes
    // The wdrs_daily_diffs cause taxonomy (scripts/QA/wdrs_daily_diffs.R:
    // 71-148) over synthesized prev/current snapshots of orders: each
    // order falls in exactly one class (merge / lineage / price change /
    // add-only / remove-only / unchanged), and the oracle mirrors the
    // reference's classification joins — roster removal first, then the
    // all-but-id merge join, then the all-but-lineage join; whatever
    // remains is unexpected.
    QueryDef("j7_diff_classes", Some(s"WITH $diffCausesCtes\n      $diffCausesSelect"),
      (s, dir) => {
        val (cur, prv, roster) = diffInputs(s, dir)
        Joins.snapshotDiffCauses(cur, prv, "id", Seq("lin"), Some(roster))
      }),

    // ---------------------------------------------------- Q12 composed run
    // The DailyDiffs job END-TO-END (scripts/QA/wdrs_daily_diffs.R:150-199):
    // the same synthesized snapshots flow through a real SnapshotStore —
    // prev published as v1, current as v2, the roster alongside — and the
    // pipeline picks the published version + predecessor, classifies, and
    // publishes the report back; the row hashes the report AS RE-READ from
    // its published version dir, so the store round-trip itself is under
    // the oracle (the j7_diff_classes row covers the classification
    // in-memory; this one covers the composed job, the way
    // q2_saved_rows_rerun and q11_* wrap their stateful pipelines).
    QueryDef("q12_daily_diffs", Some(s"WITH $diffCausesCtes\n      $diffCausesSelect"),
      (s, dir) => {
        val (cur, prv, roster) = diffInputs(s, dir)
        val store = new graft.sources.SnapshotStore(s,
          Tables.freshScratch("daily_diffs"))
        store.publish("seq_snapshot", prv)
        store.publish("seq_snapshot", cur)
        store.publish("compiled_roster", roster)
        graft.pipelines.DailyDiffs.run(store, "seq_snapshot", "id", Seq("lin"))
          .select("id", "acc", "lin", "price", "diff_side", "cause")
      }),

    // Per-(cause, side) counts — the reference's email-body summary table,
    // over the same published report.
    QueryDef("q12_diffs_summary", Some(s"""
      WITH $diffCausesCtes,
      report AS ($diffCausesSelect)
      SELECT cause, diff_side, CAST(COUNT(*) AS BIGINT) AS n
      FROM report GROUP BY cause, diff_side"""),
      (s, dir) => {
        val (cur, prv, roster) = diffInputs(s, dir)
        val store = new graft.sources.SnapshotStore(s,
          Tables.freshScratch("daily_diffs_s"))
        store.publish("seq_snapshot", prv)
        store.publish("seq_snapshot", cur)
        store.publish("compiled_roster", roster)
        graft.pipelines.DailyDiffs.summarize(
          graft.pipelines.DailyDiffs.run(store, "seq_snapshot", "id", Seq("lin")))
      }),

    // ---------------------------------------------------------------- J9
    QueryDef("j9_range_join", Some("""
      SELECT o.o_orderkey, l.l_linenumber
      FROM orders o JOIN lineitem l
        ON o.o_orderkey = l.l_orderkey
       AND CAST(l.l_shipdate AS DATE) >= CAST(o.o_orderdate AS DATE)
       AND CAST(l.l_shipdate AS DATE) <= CAST(o.o_orderdate AS DATE) + 30"""),
      (s, dir) => {
        val o = t(s, dir, "orders").withColumnRenamed("o_orderkey", "k")
        val l = t(s, dir, "lineitem")
        Joins.dateRangeJoin(
            o.withColumn("l_orderkey", col("k")), l, Seq("l_orderkey"),
            col("o_orderdate"), col("l_shipdate"), 0, 30)
          .select(col("k").as("o_orderkey"), col("l_linenumber"))
      }),

    // ---------------------------------------------------------------- J10
    QueryDef("j10_asof_closest", Some("""
      WITH cand AS (
        SELECT o.o_orderkey, l.l_linenumber,
               abs(datediff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))) AS dist
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey)
      SELECT o_orderkey, l_linenumber, dist FROM (
        SELECT *, MIN(dist) OVER (PARTITION BY o_orderkey) AS min_dist FROM cand)
      WHERE dist = min_dist"""),
      (s, dir) => {
        val o = t(s, dir, "orders")
        val l = t(s, dir, "lineitem")
        val cand = o.join(l, o("o_orderkey") === l("l_orderkey"))
          .select(o("o_orderkey"), l("l_linenumber"),
            abs(datediff(l("l_shipdate"), o("o_orderdate"))).as("dist"))
        Joins.closestDateMatch(cand, "o_orderkey", "dist")
      }),

    // ---------------------------------------------------------------- A1
    QueryDef("a1_count_distinct", Some("""
      SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS n_custs
      FROM orders GROUP BY o_orderstatus"""),
      (s, dir) => t(s, dir, "orders").groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_custs"))),

    // ---------------------------------------------------------------- A2
    QueryDef("a2_freq_table", Some("""
      SELECT l_returnflag, l_linestatus, COUNT(*) AS n
      FROM lineitem GROUP BY 1, 2"""),
      (s, dir) => t(s, dir, "lineitem").groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"))),

    // ---------------------------------------------------------------- A3
    QueryDef("a3_pivot", Some("""
      SELECT o_orderpriority,
             COUNT(CASE WHEN year(o_orderdate) = 1995 THEN 1 END) AS y1995,
             COUNT(CASE WHEN year(o_orderdate) = 1996 THEN 1 END) AS y1996,
             COUNT(CASE WHEN year(o_orderdate) = 1997 THEN 1 END) AS y1997,
             COUNT(CASE WHEN year(o_orderdate) = 1998 THEN 1 END) AS y1998
      FROM orders GROUP BY 1"""),
      (s, dir) => {
        val years = Seq("1995", "1996", "1997", "1998")
        val p = t(s, dir, "orders")
          .groupBy("o_orderpriority")
          .pivot(year(col("o_orderdate")).cast("string"), years)
          .count().na.fill(0L)
        years.foldLeft(p)((d, y) => d.withColumnRenamed(y, s"y$y"))
      }),

    // ---------------------------------------------------------------- A4
    QueryDef("a4_unpivot", Some("""
      SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      UNION ALL
      SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part"""),
      (s, dir) => t(s, dir, "part").select(col("p_partkey"),
        expr("stack(2, 'p_size', CAST(p_size AS DOUBLE), 'p_retailprice', p_retailprice) AS (metric, value)"))),

    // ---------------------------------------------------------------- A5
    QueryDef("a5_rollup_total", Some("""
      SELECT o_orderstatus, COUNT(*) AS n,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
      FROM orders GROUP BY ROLLUP(o_orderstatus)"""),
      (s, dir) => t(s, dir, "orders").rollup(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), exactSum(col("o_totalprice")).as("total"))),

    // ---------------------------------------------------------------- A8
    QueryDef("a8_dup_flag", Some("""
      SELECT event_id,
             CASE WHEN COUNT(*) OVER (PARTITION BY user_id, event_type) > 1
                  THEN 1 ELSE 0 END AS is_dup
      FROM events"""),
      (s, dir) => t(s, dir, "events").select(col("event_id"),
        when(count(lit(1)).over(Window.partitionBy(col("user_id"), col("event_type"))) > 1, 1)
          .otherwise(0).as("is_dup"))),

    // ---------------------------------------------------------------- A9/A12
    QueryDef("a9_dup_grades", Some("""
      SELECT grade, COUNT(*) AS n FROM (
        SELECT CASE WHEN cnt = 1 THEN 'unique'
                    WHEN cnt <= 3 THEN 'small_group'
                    ELSE 'large_group' END AS grade
        FROM (SELECT COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey, l_suppkey))
      GROUP BY grade"""),
      (s, dir) => t(s, dir, "lineitem")
        .groupBy("l_partkey", "l_suppkey").agg(count(lit(1)).as("cnt"))
        .select(when(col("cnt") === 1, "unique")
          .when(col("cnt") <= 3, "small_group")
          .otherwise("large_group").as("grade"))
        .groupBy("grade").agg(count(lit(1)).as("n"))),

    // ---------------------------------------------------------------- A10
    QueryDef("a10_dedup_first", Some("""
      SELECT o_custkey, o_orderkey FROM (
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS rn
        FROM orders) WHERE rn = 1"""),
      (s, dir) => t(s, dir, "orders")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey")),

    // ---------------------------------------------------------------- A11
    QueryDef("a11_conditional_dedup", Some("""
      SELECT doc_id FROM (
        SELECT doc_id, source,
               ROW_NUMBER() OVER (PARTITION BY source, lang ORDER BY doc_id) AS rn
        FROM documents)
      WHERE source <> 'src0' OR rn = 1"""),
      (s, dir) => t(s, dir, "documents")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("source"), col("lang")).orderBy(col("doc_id"))))
        .filter(col("source") =!= "src0" || col("rn") === 1)
        .select("doc_id")),

    // ---------------------------------------------------------------- O2
    QueryDef("o2_collation_pick", Some("""
      SELECT user_id, event_id FROM (
        SELECT user_id, event_id,
               ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY CASE WHEN event_type = 'signup' THEN 0 ELSE 1 END,
                          ts, event_id) AS rn
        FROM events) WHERE rn = 1"""),
      (s, dir) => t(s, dir, "events")
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("user_id")).orderBy(
            when(col("event_type") === "signup", 0).otherwise(1),
            col("ts"), col("event_id"))))
        .filter(col("rn") === 1)
        .select("user_id", "event_id")),

    // ---------------------------------------------------------------- O4
    QueryDef("o4_min_per_group", Some("""
      SELECT event_type, strftime(MIN(CAST(ts AS DATE)), '%Y-%m-%d') AS first_day
      FROM events GROUP BY event_type"""),
      (s, dir) => t(s, dir, "events").groupBy("event_type")
        .agg(date_format(min(col("ts").cast("date")), "yyyy-MM-dd").as("first_day"))),

    // ---------------------------------------------------------------- U1
    QueryDef("u1_union_all", Some("""
      SELECT o_orderkey, 'urgent' AS branch FROM orders WHERE o_orderpriority = '1-URGENT'
      UNION ALL
      SELECT o_orderkey, 'finished' AS branch FROM orders WHERE o_orderstatus = 'F'"""),
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderpriority") === "1-URGENT")
          .select(col("o_orderkey"), lit("urgent").as("branch"))
          .unionByName(o.filter(col("o_orderstatus") === "F")
            .select(col("o_orderkey"), lit("finished").as("branch")))
      }),

    // ---------------------------------------------------------------- U2
    QueryDef("u2_union_fill", Some("""
      SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
      FROM orders WHERE o_orderstatus = 'O'
      UNION ALL
      SELECT o_orderkey, CAST(NULL AS DOUBLE) AS o_totalprice, o_orderpriority
      FROM orders WHERE o_orderstatus = 'F'"""),
      (s, dir) => {
        val o = t(s, dir, "orders")
        o.filter(col("o_orderstatus") === "O").select("o_orderkey", "o_totalprice")
          .unionByName(
            o.filter(col("o_orderstatus") === "F").select("o_orderkey", "o_orderpriority"),
            allowMissingColumns = true)
      }),

    // ---------------------------------------------------------------- U3
    QueryDef("u3_except", Some("""
      SELECT c_custkey AS id FROM customer
      EXCEPT
      SELECT user_id AS id FROM events"""),
      (s, dir) => t(s, dir, "customer").select(col("c_custkey").as("id"))
        .except(t(s, dir, "events").select(col("user_id").as("id")))),

    // ---------------------------------------------------------------- U5
    QueryDef("u5_intersect", Some("""
      SELECT c_custkey AS id FROM customer
      INTERSECT
      SELECT user_id AS id FROM events"""),
      (s, dir) => t(s, dir, "customer").select(col("c_custkey").as("id"))
        .intersect(t(s, dir, "events").select(col("user_id").as("id"))))
  )

  /** The wdrs_daily_diffs cause-taxonomy oracle (CTE block + final
    * select), shared verbatim by the in-memory classification row
    * (j7_diff_classes) and the composed-run rows (q12_daily_diffs /
    * q12_diffs_summary) — the published report must hash-match the
    * direct classification. */
  private def diffCausesCtes: String = """base AS (
        SELECT o_orderkey AS id, o_orderpriority AS acc, o_orderstatus AS lin,
               o_totalprice AS price,
               CASE WHEN o_orderkey % 23 = 0 THEN 'merge'
                    WHEN o_orderkey % 19 = 0 THEN 'lineage'
                    WHEN o_orderkey % 13 = 0 THEN 'price'
                    WHEN o_orderkey % 10 = 0 THEN 'addonly'
                    WHEN o_orderkey % 11 = 0 THEN 'rmonly'
                    ELSE 'same' END AS klass
        FROM orders),
      cur AS (
        SELECT CASE WHEN klass = 'merge' THEN id + 10000000 ELSE id END AS id,
               acc,
               CASE WHEN klass = 'lineage' THEN lin || '_X' ELSE lin END AS lin,
               CASE WHEN klass = 'price' THEN price * 2 ELSE price END AS price
        FROM base WHERE klass <> 'rmonly'),
      prv AS (SELECT id, acc, lin, price FROM base WHERE klass <> 'addonly'),
      roster AS (
        SELECT id, acc, lin, price FROM base
        WHERE klass = 'addonly' OR (klass = 'same' AND id % 29 = 0)),
      dcur AS (SELECT *, 'current' AS diff_side
               FROM (SELECT * FROM cur EXCEPT SELECT * FROM prv)),
      dprev AS (SELECT *, 'prev' AS diff_side
                FROM (SELECT * FROM prv EXCEPT SELECT * FROM cur)),
      rexp AS (
        SELECT d.id, d.acc, d.lin, d.price FROM dcur d
        WHERE EXISTS (SELECT 1 FROM roster r
          WHERE r.id IS NOT DISTINCT FROM d.id AND r.acc IS NOT DISTINCT FROM d.acc
            AND r.lin IS NOT DISTINCT FROM d.lin AND r.price IS NOT DISTINCT FROM d.price)),
      rmiss AS (
        SELECT r.id, r.acc, r.lin, r.price FROM roster r
        WHERE NOT EXISTS (SELECT 1 FROM dcur d
          WHERE r.id IS NOT DISTINCT FROM d.id AND r.acc IS NOT DISTINCT FROM d.acc
            AND r.lin IS NOT DISTINCT FROM d.lin AND r.price IS NOT DISTINCT FROM d.price)),
      dcur1 AS (
        SELECT d.* FROM dcur d
        WHERE NOT EXISTS (SELECT 1 FROM roster r
          WHERE r.id IS NOT DISTINCT FROM d.id AND r.acc IS NOT DISTINCT FROM d.acc
            AND r.lin IS NOT DISTINCT FROM d.lin AND r.price IS NOT DISTINCT FROM d.price)),
      merges AS (
        SELECT p.id AS prev_id, c.id AS cur_id
        FROM dprev p JOIN dcur1 c
          ON p.acc IS NOT DISTINCT FROM c.acc
         AND p.lin IS NOT DISTINCT FROM c.lin
         AND p.price IS NOT DISTINCT FROM c.price),
      dprev1 AS (SELECT * FROM dprev WHERE id NOT IN (SELECT prev_id FROM merges)),
      dcur2 AS (SELECT * FROM dcur1 WHERE id NOT IN (SELECT cur_id FROM merges)),
      lins AS (
        SELECT DISTINCT p.id
        FROM dprev1 p JOIN dcur2 c
          ON p.id IS NOT DISTINCT FROM c.id
         AND p.acc IS NOT DISTINCT FROM c.acc
         AND p.price IS NOT DISTINCT FROM c.price)"""

  private def diffCausesSelect: String =
    """SELECT id, acc, lin, price, diff_side, 'case_id_merge' AS cause
        FROM dcur1 WHERE id IN (SELECT cur_id FROM merges)
      UNION ALL
      SELECT id, acc, lin, price, diff_side, 'lineage_update' AS cause
        FROM dcur2 WHERE id IN (SELECT id FROM lins)
      UNION ALL
      SELECT id, acc, lin, price, diff_side, 'case_id_merge' AS cause
        FROM dprev WHERE id IN (SELECT prev_id FROM merges)
      UNION ALL
      SELECT id, acc, lin, price, diff_side, 'lineage_update' AS cause
        FROM dprev1 WHERE id IN (SELECT id FROM lins)
      UNION ALL
      SELECT id, acc, lin, price, diff_side, 'unexpected' AS cause
        FROM dcur2 WHERE id NOT IN (SELECT id FROM lins)
      UNION ALL
      SELECT id, acc, lin, price, diff_side, 'unexpected' AS cause
        FROM dprev1 WHERE id NOT IN (SELECT id FROM lins)
      UNION ALL
      SELECT id, acc, lin, price, 'current' AS diff_side, 'roster_expected' AS cause
        FROM rexp
      UNION ALL
      SELECT id, acc, lin, price, 'roster' AS diff_side, 'roster_missing' AS cause
        FROM rmiss"""

  /** The synthesized (current, prev, roster) snapshot inputs behind the
    * J7/Q12 rows — every order falls in exactly one churn class. */
  private def diffInputs(s: SparkSession, dir: String)
      : (DataFrame, DataFrame, DataFrame) = {
        val o = t(s, dir, "orders")
        val base = o.select(col("o_orderkey").as("id"),
            col("o_orderpriority").as("acc"), col("o_orderstatus").as("lin"),
            col("o_totalprice").as("price"))
          .withColumn("klass",
            when(col("id") % 23 === 0, "merge")
              .when(col("id") % 19 === 0, "lineage")
              .when(col("id") % 13 === 0, "price")
              .when(col("id") % 10 === 0, "addonly")
              .when(col("id") % 11 === 0, "rmonly")
              .otherwise("same"))
        val cur = base.filter(col("klass") =!= "rmonly")
          .select(
            when(col("klass") === "merge", col("id") + 10000000)
              .otherwise(col("id")).as("id"),
            col("acc"),
            when(col("klass") === "lineage", concat(col("lin"), lit("_X")))
              .otherwise(col("lin")).as("lin"),
            when(col("klass") === "price", col("price") * 2)
              .otherwise(col("price")).as("price"))
        val prv = base.filter(col("klass") =!= "addonly")
          .select("id", "acc", "lin", "price")
        val roster = base.filter(col("klass") === "addonly" ||
            (col("klass") === "same" && col("id") % 29 === 0))
          .select("id", "acc", "lin", "price")
    (cur, prv, roster)
  }
}
