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

  /**
   * Snapshot diff with the reference's CAUSE TAXONOMY (SURVEY J7 deep arm,
   * scripts/QA/wdrs_daily_diffs.R:71-148): day-over-day diffs are
   * classified into the reasons an operator acts on, in the reference's
   * own precedence order:
   *
   *  1. `roster_expected` — a current-side diff fully explained by
   *     yesterday's compiled roster upload (expected, not flagged);
   *     `roster_missing` — a roster row that did NOT appear as a new
   *     diff (upload problem, or already present in WDRS).
   *  2. `case_id_merge` — prev/current diff rows agreeing on every
   *     column EXCEPT the case id (the WDRS case-merge signature).
   *  3. `lineage_update` — remaining prev/current rows agreeing on every
   *     column except the lineage/notes columns (mol-epi manual update).
   *  4. `unexpected` — everything left; the rows the report exists for.
   *
   * Scale shape: ONE full-width shuffle (the tag-and-group set diff of
   * [[snapshotDiff]]) touches snapshot-sized data; the day-over-day diff
   * set it yields is churn-sized, gets locally checkpointed, and every
   * classification join below it broadcasts an id set — no second pass
   * over the snapshots.
   *
   * @param lineageCols columns a lineage update may change (the
   *        reference's SEQUENCE_VARIANT_OPEN_TEXT + SEQUENCE_NOTES).
   * @param roster optional compiled-roster upload from yesterday; its
   *        columns must be a subset of the snapshot columns (the
   *        reference's `select(any_of(...))`).
   * @return all snapshot columns + `diff_side` (current/prev/roster) +
   *         `cause`. Rows with a null id are never merge/lineage
   *         classified (no id to correlate on), matching the reference's
   *         `%in%` membership filters.
   */
  def snapshotDiffCauses(current: DataFrame, prev: DataFrame, idCol: String,
      lineageCols: Seq[String], roster: Option[DataFrame] = None): DataFrame = {
    val cols = current.columns.toSeq
    val tagged = current.select(cols.map(col) :+ lit(1).as("__s"): _*)
      .unionByName(prev.select(cols.map(col) :+ lit(2).as("__s"): _*))
    // churn-sized; checkpointed so the classification joins below don't
    // each replay the snapshot-wide shuffle (GC-tracked, nothing persists
    // past this call — same lifecycle discipline as the dedup operators)
    val diffs = tagged.groupBy(cols.map(col): _*)
      .agg(max(when(col("__s") === 1, 1).otherwise(0)).as("__c"),
        max(when(col("__s") === 2, 1).otherwise(0)).as("__p"))
      .filter(col("__c") =!= col("__p"))
      .withColumn("diff_side", when(col("__c") === 1, "current").otherwise("prev"))
      .drop("__c", "__p")
      .localCheckpoint(true)
    val dCur0 = diffs.filter(col("diff_side") === "current")
    val dPrev = diffs.filter(col("diff_side") === "prev")

    // 1. roster arm: expected uploads out, missing uploads flagged
    val (dCur, rosterParts) = roster match {
      case Some(r0) =>
        val rCols = r0.columns.toSeq.filter(cols.contains)
        // in-place aliases force fresh attribute ids: the caller's roster
        // often shares lineage with the snapshots (same source frame), and
        // a pass-through column would otherwise carry the SAME exprId as a
        // diff column — the join condition then resolves trivially-true /
        // ambiguous (localCheckpoint preserves exprIds, so the checkpoint
        // alone doesn't detach them)
        val r = r0.select(rCols.map(c => col(c).as(c)): _*).dropDuplicates()
        def onR(l: DataFrame, rr: DataFrame) =
          rCols.map(c => l(c) <=> rr(c)).reduce(_ && _)
        val expected = dCur0.join(broadcast(r), onR(dCur0, r), "left_semi")
          .withColumn("cause", lit("roster_expected"))
        val unexplained = dCur0.join(broadcast(r), onR(dCur0, r), "left_anti")
        val missing = r.join(dCur0, onR(r, dCur0), "left_anti")
          .select(cols.map(c =>
            if (rCols.contains(c)) col(c)
            else lit(null).cast(current.schema(c).dataType).as(c)): _*)
          .withColumn("diff_side", lit("roster"))
          .withColumn("cause", lit("roster_missing"))
        (unexplained, Seq(expected, missing))
      case None => (dCur0, Seq.empty[DataFrame])
    }

    // membership marking: matched id sets are tiny -> broadcast semi/anti
    def mark(side: DataFrame, ids: DataFrame, cause: String): (DataFrame, DataFrame) =
      (side.join(broadcast(ids), Seq(idCol), "left_semi")
        .withColumn("cause", lit(cause)),
        side.join(broadcast(ids), Seq(idCol), "left_anti"))

    // 2. case-id merges: same attributes, different id. The current side
    // is column-renamed before the join — both sides descend from the
    // same checkpointed plan, and a rename beats relying on self-join
    // attribute disambiguation.
    val attrs = cols.filterNot(_ == idCol)
    def ren(df: DataFrame) = df.select(cols.map(c => col(c).as(s"__c_$c")): _*)
    val mergePairs = dPrev.join(ren(dCur),
      attrs.map(c => col(c) <=> col(s"__c_$c")).reduce(_ && _), "inner")
      .select(col(idCol).as("__prev_id"), col(s"__c_$idCol").as("__cur_id"))
    val (prevMerged, prevRest1) =
      mark(dPrev, mergePairs.select(col("__prev_id").as(idCol)).distinct(), "case_id_merge")
    val (curMerged, curRest1) =
      mark(dCur, mergePairs.select(col("__cur_id").as(idCol)).distinct(), "case_id_merge")

    // 3. lineage updates among the remainder: same row except lineageCols
    val linAttrs = cols.filterNot(lineageCols.contains)
    val linIds = prevRest1.join(ren(curRest1),
      linAttrs.map(c => col(c) <=> col(s"__c_$c")).reduce(_ && _), "inner")
      .select(col(idCol)).distinct()
    val (prevLin, prevRest2) = mark(prevRest1, linIds, "lineage_update")
    val (curLin, curRest2) = mark(curRest1, linIds, "lineage_update")

    // 4. remainder is the actionable report
    val unexpected = Seq(prevRest2, curRest2)
      .map(_.withColumn("cause", lit("unexpected")))
    (Seq(curMerged, curLin, prevMerged, prevLin) ++ unexpected ++ rosterParts)
      .reduce(_.unionByName(_))
  }
}
