package graft.pipelines

import graft.functions.GraftFunctions._
import graft.operators.FuzzyJoin
import graft.qa.QaRules
import graft.qa.QaRules.Rule
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The reference's fuzzy-matching run end-to-end (SURVEY §3.3,
 * docs/notebooks/fuzzy.Rmd): pre-match QA (Q2), alternate-name/DOB row
 * multiplication, birth-year-blocked OSA join with name-flip union (J8),
 * exact-DOB post-filter, ±14-day collection-date filter with flagged
 * add-back, multi-candidate blanking (A1), and distance-tiered routing
 * (0-1 → roster, 2-3 → manual review).
 *
 * Scale shape: ONE shuffle keyed by birth year (the block), window
 * functions for per-row accounting — no driver-side collections. Skewed
 * years are AQE-split; the reference shipped year-slices to a PSOCK pool
 * (fuzzy.Rmd:585-603) — here that parallelism is partition parallelism.
 */
object FuzzyMatch {

  /** Q2 pre-match battery (fuzzy.Rmd:399-462): usable names (non-null, no
    * digits), real DOB (not the 1899-12-30 Excel epoch), collection date. */
  def preMatchRules(): Seq[Rule] = Seq(
    Rule("QA_NAME_NA",
      QaRules.required(col("first_name")) || QaRules.required(col("last_name")) ||
        col("first_name").rlike("[0-9]") || col("last_name").rlike("[0-9]")),
    Rule("QA_DOB_NA",
      col("dob").isNull || col("dob") === to_date(lit("1899-12-30"))),
    Rule("QA_COLLECT_DATE_NA", col("collection_date").isNull))

  /**
   * Alternate-demographics row multiplication (fuzzy.Rmd:252-341, SURVEY
   * §7.4#7): the match target gets a second candidate row per record for
   * the alternate name, and — when an `alt_dob` column is present (the
   * flattened table's BIRTH_DATE, fuzzy.Rmd:325-341) — the DOB is first
   * null-filled from it and a further duplicate row is added per name
   * variant where the two DOBs differ. Matched output is then deduped on
   * the ORIGINAL identity, not the multiplied rows.
   *
   * The DOB arm composes over the name arm (reference order: name rbind
   * at fuzzy.Rmd:260-266, DOB rbind at :335-341 on the already-multiplied
   * frame), so a record with both alternates yields up to 4 variants. The
   * caller recomputes the birth-year block AFTER multiplication, so each
   * DOB variant lands in its own block.
   */
  def multiplyAlternates(target: DataFrame): DataFrame = {
    val hasAltDob = target.columns.contains("alt_dob")
    // DOB null-fill from the flattened table (fuzzy.Rmd:329-333)
    val filled =
      if (hasAltDob) target.withColumn("dob", coalesce(col("dob"), col("alt_dob")))
      else target
    val base = filled
      .withColumn("__variant", lit("primary"))
    val altName = filled
      .filter(col("alt_first_name").isNotNull && col("alt_last_name").isNotNull)
      .withColumn("first_name", col("alt_first_name"))
      .withColumn("last_name", col("alt_last_name"))
      .withColumn("__variant", lit("alternate"))
    val named = base.unionByName(altName)
    if (!hasAltDob) named
    else {
      // duplicate row with the alternate DOB where it disagrees
      // (fuzzy.Rmd:335-338); R's filter drops the NA comparisons, hence
      // the explicit isNotNull guard.
      val altDob = named
        .filter(col("alt_dob").isNotNull && col("alt_dob") =!= col("dob"))
        .withColumn("dob", col("alt_dob"))
        .withColumn("__variant", concat(col("__variant"), lit("+dob")))
      named.unionByName(altDob)
    }
  }

  /**
   * The blocked match: submissions (clean rows) vs multiplied target on
   * birth-year block, straight ≤3 / flipped ≤2, exact-DOB equality after
   * (fuzzy.Rmd:651-658).
   *
   * Auto-salting is ON by default (round 12): the reference's real
   * birth-year distribution is heavy-headed (cohort years,
   * fuzzy.Rmd:562-579) and a block's join work is the PRODUCT of its two
   * side counts — beyond AQE's split granularity once one block's pair
   * mass dwarfs a task budget. [[FuzzyJoin.planSalts]] measures per-block
   * pair mass with one block-cardinality-bounded aggregate per side (the
   * gate is itself the cheap pre-check: on an unskewed corpus it returns
   * the un-replicated plan and the only cost is two tiny count aggs), so
   * the production path self-salts exactly when the measured mass demands
   * it, with an identical result set either way.
   *
   * @param targetPairsPerBlock pair-mass threshold above which a block is
   *   salted (default 4M — ~a task budget of OSA evaluations); exposed so
   *   tests and scale probes can trigger the salted plan on small corpora.
   */
  def matchCandidates(clean: DataFrame, target: DataFrame,
      autoSalt: Boolean = true,
      targetPairsPerBlock: Long = 4000000L): DataFrame = {
    val l = clean
      .withColumn("block", year(col("dob")))
      .select(col("rowid"), col("block"),
        col("first_name").as("l_first"), col("last_name").as("l_last"),
        col("dob").as("l_dob"), col("collection_date"))
    val r = multiplyAlternates(target)
      .withColumn("block", year(col("dob")))
      .select(col("case_id"), col("block"),
        col("first_name").as("r_first"), col("last_name").as("r_last"),
        col("dob").as("r_dob"), col("wdrs_collection"), col("__variant"))
    FuzzyJoin.fuzzyNameMatch(
        l, col("l_first"), col("l_last"),
        r, col("r_first"), col("r_last"),
        "block", maxDist = 3, flippedMaxDist = 2,
        autoSalt = autoSalt, targetPairsPerBlock = targetPairsPerBlock)
      .filter(col("l_dob") === col("r_dob")) // exact DOB equality post-filter
  }

  /**
   * ±14-day collection-date filter with add-back (fuzzy.Rmd:844-879): in-
   * window candidates pass clean; rows whose ONLY candidates are out of
   * window keep their closest candidate flagged QA_COLLECT_DATE=1.
   *
   * Candidates with a NULL wdrs_collection date evaluate every predicate
   * to null and are dropped — the submission then surfaces in the
   * `unmatched` output for review. This matches the reference: R's
   * interval() yields NA on NA dates and dplyr::filter drops NA rows
   * (fuzzy.Rmd:845-859), routing the row to the did-not-match print.
   */
  def collectionDateFilter(cands: DataFrame, tolDays: Int = 14): DataFrame = {
    val w = Window.partitionBy(col("rowid"))
    val flagged = cands
      .withColumn("__in_window",
        when(withinDays(col("collection_date"), col("wdrs_collection"), tolDays), 1)
          .otherwise(0))
      .withColumn("__any_in_window", max(col("__in_window")).over(w))
      .withColumn("__date_dist",
        abs(datediff(col("collection_date"), col("wdrs_collection"))))
      .withColumn("__min_dist", min(col("__date_dist")).over(w))
    flagged
      .filter(
        (col("__any_in_window") === 1 && col("__in_window") === 1) ||
        (col("__any_in_window") === 0 && col("__date_dist") === col("__min_dist")))
      .withColumn("QA_COLLECT_DATE",
        when(col("__any_in_window") === 0, 1).otherwise(0))
      .drop("__in_window", "__any_in_window", "__date_dist", "__min_dist")
  }

  /**
   * A1 multi-candidate handling (fuzzy.Rmd:883-913): a submission matching
   * >1 distinct CASE_ID keeps the match at patient level: candidates
   * deduped to one row per (rowid, case_id), then rows with multiple
   * case_ids flagged QA_MULTIPLE_MATCH.
   */
  def resolveMultiMatch(cands: DataFrame): DataFrame = {
    val wr = Window.partitionBy(col("rowid"), col("case_id"))
      .orderBy(col("distance"), col("__variant"))
    val w = Window.partitionBy(col("rowid"))
    cands
      .withColumn("__rn", row_number().over(wr))
      .filter(col("__rn") === 1)
      .withColumn("QA_MULTIPLE_MATCH",
        when(count(lit(1)).over(w) > 1, 1).otherwise(0))
      .drop("__rn")
  }

  /** Distance tiering (fuzzy.Rmd:923-1070): 0-1 roster, 2-3 review. */
  def tier(): Column =
    when(col("distance") <= 1, "roster").otherwise("manual_review")

  /**
   * Whole run: QA-split, match, date-filter, multi-match resolve, tier.
   * Returns (bad_rows, matched-with-tier, unmatched-rowids): every input
   * rowid lands in exactly one of the three (the rows_printed conservation
   * property, fuzzy.Rmd:77,163,1078-1086 — tested, not assumed).
   */
  def run(submissions: DataFrame, target: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    // Checkpoint the two stages every downstream output shares. The three
    // returned frames are consumed as SEPARATE actions by every real
    // caller (print bad, publish matched, persist saved — the reference
    // writes three files), and `unmatched` itself re-derives `matched`
    // through its anti-join — left lazy, the blocked OSA join (the run's
    // dominant cost) re-executes once per output plus once for the
    // saved-rows publish (measured on the composed e2e row: 12.8 s →
    // 4.7 s checkpointed). Eager localCheckpoints are bounded: `flagged`
    // is submission-sized, `matched` is match-mass-sized.
    val flagged = QaRules.applyBattery(submissions, preMatchRules(), "qa_sum")
      .localCheckpoint(true)
    val bad = flagged.filter(col("qa_sum") > 0)
    val clean = flagged.filter(col("qa_sum") === 0)
    val matched = resolveMultiMatch(
      collectionDateFilter(matchCandidates(clean, target)))
      .withColumn("tier", tier())
      .localCheckpoint(true)
    // explicit broadcast (r18 optimization, guide §3.1): both sides are
    // localCheckpoint'd (no plan-time stats), so the planner fell back
    // to a sort-merge anti-join — two exchanges + two sorts — for a
    // right side that is at most the distinct matched rowids of one
    // day's submissions (one long per row; roster-scale by the
    // pipeline's contract, far under any broadcast limit)
    val unmatched = clean.join(
      broadcast(matched.select("rowid").distinct()),
      Seq("rowid"), "left_anti")
    (bad, matched, unmatched)
  }

  /**
   * [[run]] with the CROSS-RUN saved-rows safety net (fuzzy.Rmd:
   * 1078-1086): records that matched nothing this run are not dropped —
   * they persist to the `saved_rows` state table and re-enter the next
   * run's submissions, retrying until the target catches up (a WDRS case
   * often lands days after the lab submission). The reference implements
   * this as delete-old-file + `saved_rows_<date>.csv`; here the state
   * table is a [[graft.sources.SnapshotStore]] publish — same
   * replace-the-whole-file semantics, atomic `_CURRENT` flip, versions
   * retained for audit.
   *
   * A rowid present in BOTH the saved state and today's submissions (a
   * resubmission) is taken from today's batch — deterministic keep-new —
   * so conservation stays per-rowid exact: every rowid ever submitted is
   * in exactly one of bad / matched / saved after each run.
   */
  def runWithSavedRows(submissions: DataFrame, target: DataFrame,
      store: graft.sources.SnapshotStore, table: String = "fuzzy_saved_rows")
      : (DataFrame, DataFrame, DataFrame) = {
    val cols = submissions.columns.toSeq
    val saved = store.readOrEmpty(table, submissions.schema)
      .select(cols.map(col): _*)
    val todays = submissions.select(cols.map(col): _*)
    val allSubs = todays
      .unionByName(saved.join(todays.select("rowid"), Seq("rowid"), "left_anti"))
    val (bad, matched, unmatched) = run(allSubs, target)
    // persist the original submission columns only (QA flags are
    // per-run judgments, recomputed on every retry)
    store.publish(table, unmatched.select(cols.map(col): _*))
    (bad, matched, unmatched)
  }
}
