package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Join patterns beyond plain equi-joins (SURVEY §2.3): fallback joins,
 * range joins, as-of (closest-date) matches, and snapshot diffs. Each is
 * expressed so Catalyst keeps an equi component in the join condition —
 * the range / distance predicate rides along as a post-filter on the
 * hash/sort-merge join, never forcing a nested-loop plan.
 */
object Joins {

  /**
   * U4 schema harmonization (SURVEY §2.6, scripts/Auto_seq/read_all_data
   * .Rmd:192,211-216): union frames with drifting schemas. `intersectOnly`
   * keeps just the shared columns (the reference's column-name
   * intersection); otherwise missing columns null-fill
   * (rbind.fill / unionByName(allowMissingColumns)).
   */
  def harmonizedUnion(dfs: Seq[DataFrame], intersectOnly: Boolean = false): DataFrame = {
    require(dfs.nonEmpty, "harmonizedUnion of zero frames")
    if (intersectOnly) {
      val shared = dfs.map(_.columns.toSeq).reduce((a, b) => a.filter(b.contains))
      dfs.map(_.select(shared.map(col): _*)).reduce(_.unionByName(_))
    } else {
      dfs.reduce(_.unionByName(_, allowMissingColumns = true))
    }
  }

  /**
   * Fallback join on an alternate key (SURVEY J4, docs/notebooks/phl.Rmd:
   * 614-646): rows that miss on key1 are retried on key2; both matched sets
   * union. One pass each; the anti side reuses the first join's shuffle.
   */
  def fallbackJoin(
      left: DataFrame, right: DataFrame,
      key1: (String, String), key2: (String, String)): DataFrame = {
    val m1 = left.join(right, left(key1._1) === right(key1._2), "inner")
    val misses = left.join(right, left(key1._1) === right(key1._2), "left_anti")
    val m2 = misses.join(right, misses(key2._1) === right(key2._2), "inner")
    m1.unionByName(m2)
  }

  /**
   * Range join (SURVEY J9): equi keys + an event-date within [lo, hi] days
   * of the anchor date. The equi key keeps this a hash join.
   */
  def dateRangeJoin(
      left: DataFrame, right: DataFrame, equiKeys: Seq[String],
      leftDate: Column, rightDate: Column, loDays: Int, hiDays: Int): DataFrame =
    left.join(right,
      equiKeys.map(k => left(k) === right(k)).reduce(_ && _) &&
        datediff(rightDate, leftDate).between(loDays, hiDays))

  /**
   * As-of-style closest-date match (SURVEY J10, SGTF_template_matching.Rmd:
   * 448-467): among candidates per anchor row keep those at min date
   * distance — window min over the anchor id, then filter.
   */
  def closestDateMatch(candidates: DataFrame, anchorId: String,
      distCol: String): DataFrame = {
    val w = Window.partitionBy(col(anchorId))
    candidates
      .withColumn("__min_dist", min(col(distCol)).over(w))
      .filter(col(distCol) === col("__min_dist"))
      .drop("__min_dist")
  }

  /**
   * [[closestDateMatch]] with the reference's null handling
   * (SGTF_template_matching.Rmd:458-465): a candidate with an
   * uncomputable distance survives only when NO candidate of its anchor
   * has a computable one (all-null groups keep every row; mixed groups
   * drop the null rows).
   */
  def closestDateMatchKeepNull(candidates: DataFrame, anchorId: String,
      distCol: String): DataFrame = {
    val w = Window.partitionBy(col(anchorId))
    candidates
      .withColumn("__min_dist", min(col(distCol)).over(w)) // min ignores nulls
      .filter((col(distCol).isNull && col("__min_dist").isNull) ||
        col(distCol) === col("__min_dist"))
      .drop("__min_dist")
  }

  /**
   * Day-over-day snapshot diff with classification (SURVEY J7,
   * scripts/QA/wdrs_daily_diffs.R:45-148): rows only in today (added), only
   * in yesterday (removed), plus added rows whose identity key exists in
   * yesterday under different attributes (changed).
   */
  def snapshotDiff(today: DataFrame, yesterday: DataFrame,
      identityKeys: Seq[String]): DataFrame = {
    // Single-shuffle set diff: tag sides, group by ALL columns, keep rows
    // present on exactly one side (EXCEPT-distinct semantics without the
    // 4 shuffles of two except()s), then a window over the identity keys
    // marks diffs whose key exists on both sides as changed.
    val cols = today.columns.toSeq
    val tagged = today.select(cols.map(col) :+ lit(1).as("__side"): _*)
      .unionByName(yesterday.select(cols.map(col) :+ lit(2).as("__side"): _*))
    val diffs = tagged
      .groupBy(cols.map(col): _*)
      .agg(max(when(col("__side") === 1, 1).otherwise(0)).as("__in_today"),
        max(when(col("__side") === 2, 1).otherwise(0)).as("__in_yesterday"))
      .filter(col("__in_today") =!= col("__in_yesterday"))
      .withColumn("diff_kind",
        when(col("__in_today") === 1, "added").otherwise("removed"))
    val w = Window.partitionBy(identityKeys.map(col): _*)
    diffs
      .withColumn("__sides", size(collect_set(col("diff_kind")).over(w)))
      .withColumn("diff_kind",
        when(col("__sides") === 2, concat(col("diff_kind"), lit("_changed")))
          .otherwise(col("diff_kind")))
      .drop("__in_today", "__in_yesterday", "__sides")
  }
}
