package graft

import graft.functions.GraftFunctions.exactSum
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-table operators: the reference's incremental-batch "streaming"
 * semantics (SURVEY §1.6 — high-watermark new-data detection, processed-list
 * anti-join) plus event-time windowing / sessionization. The same logic runs
 * under Structured Streaming in graft.streaming (watermark + window); these
 * batch forms are the oracle-checkable equivalents.
 */
object QueriesEvents {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val defs: Seq[QueryDef] = Seq(

    // --------------------------------------------- high-watermark pickup
    QueryDef("ev_high_watermark", Some("""
      SELECT event_id FROM events e
      WHERE ts > TIMESTAMP '2024-01-25 00:00:00'
        AND NOT EXISTS (SELECT 1 FROM events p
                        WHERE p.ts <= TIMESTAMP '2024-01-25 00:00:00'
                          AND p.event_id = e.event_id)"""),
      (s, dir) => {
        val e = t(s, dir, "events")
        val cutoff = lit("2024-01-25 00:00:00").cast("timestamp")
        val processed = e.filter(col("ts") <= cutoff).select("event_id")
        e.filter(col("ts") > cutoff)
          .join(processed, Seq("event_id"), "left_anti")
          .select("event_id")
      }),

    // --------------------------------------------- tumbling window agg
    QueryDef("ev_tumbling_window", Some("""
      SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day, event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
      FROM events GROUP BY 1, 2"""),
      (s, dir) => t(s, dir, "events")
        .groupBy(
          date_format(window(col("ts"), "1 day").getField("start"), "yyyy-MM-dd").as("day"),
          col("event_type"))
        .agg(count(lit(1)).as("n"), exactSum(col("value")).as("total_value"))),

    // --------------------------------------------- sessionization
    QueryDef("ev_sessionize", Some("""
      WITH gaps AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                      OR datediff('second', lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id), ts) > 1800
                    THEN 1 ELSE 0 END AS new_session
        FROM events)
      SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions
      FROM gaps GROUP BY user_id"""),
      (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        t(s, dir, "events")
          .withColumn("prev_ts", lag(col("ts"), 1).over(w))
          .withColumn("new_session",
            when(col("prev_ts").isNull ||
              col("ts").cast("long") - col("prev_ts").cast("long") > 1800, 1).otherwise(0))
          .groupBy("user_id")
          .agg(sum(col("new_session")).as("n_sessions"))
      }),

    // --------------------------------------------- top spenders (window+agg)
    QueryDef("ev_top_spenders", Some("""
      WITH spend AS (
        SELECT user_id, CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM events WHERE event_type = 'purchase' GROUP BY user_id)
      SELECT user_id, total, CAST(rank() OVER (ORDER BY total DESC, user_id) AS BIGINT) AS rnk
      FROM spend QUALIFY rnk <= 20"""),
      (s, dir) => t(s, dir, "events")
        .filter(col("event_type") === "purchase")
        .groupBy("user_id")
        .agg(exactSum(col("value")).as("total"))
        // rank over (total desc, user_id) is a strict total order (user_id
        // unique after the groupBy), so rnk <= 20 is exactly the first 20
        // rows of that order: orderBy+limit gives TakeOrderedAndProject
        // (per-partition top-k + driver merge of 20-row heaps) instead of
        // a global Window funneling every user aggregate through one task.
        // The rank is then recomputed over the 20 surviving rows — a
        // single-partition window over a driver-sized result.
        .orderBy(col("total").desc, col("user_id"))
        .limit(20)
        .withColumn("rnk",
          rank().over(Window.orderBy(col("total").desc, col("user_id"))).cast("long")))
  )
}
