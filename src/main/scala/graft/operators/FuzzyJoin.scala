package graft.operators

import graft.functions.GraftFunctions.annihilate
import graft.functions.osa_distance
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * The reference's crown-jewel matcher (SURVEY J8): a *blocked* fuzzy
 * string-distance join. The reference blocks on DOB birth-year and ships
 * year-slices to a PSOCK worker pool
 * (scripts/Roster_scripts/fuzzy_matching_functions.R:2-50,
 * docs/notebooks/fuzzy.Rmd:560-606). Here the block is encoded structurally
 * as an equi-join key so Catalyst plans a shuffled hash / sort-merge join —
 * NOT a BroadcastNestedLoopJoin — and the OSA predicate only runs inside
 * each block (SURVEY §4 "the one place naive porting produces an accidental
 * O(n*m) plan"). Skewed blocks (common birth years) are handled by AQE
 * skew-join splitting.
 */
object FuzzyJoin {

  /**
   * Generic blocked fuzzy join.
   *
   * @param left/right    inputs
   * @param blockKey      exact-match blocking column present on both sides
   * @param leftName      name column on the left (already normalized)
   * @param rightName     name column on the right (already normalized)
   * @param maxDistance   OSA distance threshold (reference: 3)
   * @param salts         >1 spreads each block over `salts` reducers:
   *                      left rows get a deterministic salt (hash of the
   *                      whole row), right rows replicate once per salt,
   *                      and the equi key becomes (block, salt) — SAME
   *                      result rows, `salts`× the right side's shuffle
   *                      volume. The structural fallback for a block so
   *                      hot (the reference's real birth-year
   *                      distribution, fuzzy.Rmd:562-579) that even
   *                      AQE's runtime skew-split bottlenecks; leave at 1
   *                      and let AQE handle ordinary skew.
   * @return left columns + right columns + "distance"
   */
  def blockedFuzzyJoin(
      left: DataFrame, right: DataFrame, blockKey: String,
      leftName: Column, rightName: Column, maxDistance: Int,
      salts: Int = 1): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // Caller contract: column names disjoint apart from blockKey.
    val l0 = left.withColumn("__lname", leftName)
    val r0 = right.withColumn("__rname", rightName)
      .withColumnRenamed(blockKey, "__rblock")
    // Deterministic salt (hash of the left row, not rand() — SURVEY
    // §7.4#5 reproducible runs); each left row meets each right row of
    // its block exactly once, on the replica carrying its salt value.
    val (l, r, joinCond) =
      if (salts == 1) (l0, r0, col(blockKey) === col("__rblock"))
      else (
        l0.withColumn("__lsalt",
          pmod(hash(left.columns.map(col).toIndexedSeq: _*), lit(salts))),
        r0.withColumn("__rsalt", explode(sequence(lit(0), lit(salts - 1)))),
        col(blockKey) === col("__rblock") && col("__lsalt") === col("__rsalt"))
    // Pure equi-join on the block (+ salt); a CHEAP length pre-filter
    // prunes pairs before the DP kernel runs (|len(a)-len(b)| > k implies
    // osa > k), then ONE osa_distance evaluation per surviving pair
    // (putting the distance predicate in the join condition would
    // evaluate it twice: once as join filter, once for the column).
    l.join(r, joinCond)
      .filter(abs(length(col("__lname")) - length(col("__rname"))) <= maxDistance)
      .withColumn("distance", osa_distance(col("__lname"), col("__rname")))
      .filter(col("distance") <= maxDistance)
      .drop("__lname", "__rname", "__rblock", "__lsalt", "__rsalt")
  }

  /**
   * CBO-style salt plan derived from a block-size statistics pass — the
   * same measure-then-choose discipline as the ngram-blocking strategy
   * pick in [[Dedup]]. The real birth-year distribution is heavy-headed
   * (docs/notebooks/fuzzy.Rmd:562-579: cohort years carry orders of
   * magnitude more rows than the tail), and a block's *join work* is the
   * PRODUCT of its two side counts — invisible to AQE until the skewed
   * shuffle partition already exists, and beyond AQE's split granularity
   * once a single block's pair count dwarfs a task's budget. One tiny
   * aggregation per side (block → count, block-cardinality-bounded)
   * computes every block's pair mass up front; blocks past
   * `targetPairsPerBlock` get salted, the rest join un-replicated, so
   * the right-side replication cost is paid ONLY where the work is.
   *
   * @param global when the hot set outgrows `maxHotBlocks`, skew is
   *   head-heavy everywhere — per-block routing would collect an
   *   unbounded key list, so the plan degrades to salting EVERY block
   *   (the manual `salts` knob's behavior), still bounded and exact.
   */
  final case class SaltPlan(salts: Int, hotBlocks: Seq[Any], global: Boolean) {
    def isSalted: Boolean = salts > 1
  }

  def planSalts(left: DataFrame, right: DataFrame, blockKey: String,
      targetPairsPerBlock: Long = 4000000L, maxSalts: Int = 32,
      maxHotBlocks: Int = 1000): SaltPlan = {
    require(targetPairsPerBlock > 0 && maxSalts >= 1 && maxHotBlocks >= 1,
      "FuzzyJoin.planSalts: bounds must be positive")
    // BROADCAST AWARENESS (round 12, measured): when either side fits
    // the session's broadcast threshold, the unsalted join plans as a
    // broadcast hash join — and a BHJ has NO block-skew problem: probe
    // work distributes by the STREAMED side's row partitioning, which is
    // uniform whatever the block histogram, so a hot block costs CPU but
    // never serializes into one task. Salting would force the exploded
    // side past the threshold and replace that plan with a salted
    // shuffle join — measured 4x SLOWER on the 10x skew corpus (26.0s
    // salted-shuffle vs 6.5s unsalted-BHJ, FuzzySaltProbe). So: decline
    // to salt while a broadcast plan is available (also skipping the
    // stats pass entirely — the common small-pipeline case pays only
    // this size probe); the salt machinery is for the 100 TB regime
    // where BOTH sides outgrow the threshold and the shuffle join's
    // key-granularity skew is real (same probe, broadcast off: salted
    // 26.0s vs unsalted 55.7s at 10x, 2.1x; wider at 30x).
    //
    // MARGIN (round 13, advisor ask): the gate trusts CATALYST SIZE
    // ESTIMATES of frames the planner will see only after projection /
    // name derivation — estimate drift past the threshold at join-planning
    // time would decline salting here and then serialize the hot block
    // through one unsalted shuffle task anyway (the 55.7s-vs-26s case the
    // probe measured). So the decline requires a side under HALF the
    // broadcast threshold: within the drift-prone (bcast/2, bcast] band
    // the stats pass runs and may salt, whose worst case — replacing a
    // BHJ that would have materialized after all — measured a bounded 4x,
    // while the worst case of wrongly declining grows with corpus scale
    // (9.1x at 30x, unbounded beyond). Below bcast/2 a drift large enough
    // to flip the plan would need a 2x estimation error on a parquet-
    // backed size, which the statistics this gate reads don't exhibit.
    val bcast = org.apache.spark.sql.graftshim.GraftSqlShim
      .autoBroadcastThreshold(left.sparkSession)
    if (bcast > 0 &&
        (left.queryExecution.optimizedPlan.stats.sizeInBytes <= bcast / 2 ||
         right.queryExecution.optimizedPlan.stats.sizeInBytes <= bcast / 2))
      return SaltPlan(1, Seq.empty, global = false)
    // block-cardinality-sized aggregates (birth years: dozens); the
    // collect is capped at maxHotBlocks + 1 rows by the limit below
    val lc = left.groupBy(col(blockKey).as("__b")).agg(count(lit(1)).as("__ln"))
    val rc = right.groupBy(col(blockKey).as("__b")).agg(count(lit(1)).as("__rn"))
    val hot = lc.join(rc, Seq("__b"))
      .select(col("__b"), (col("__ln") * col("__rn")).as("__pairs"))
      .filter(col("__pairs") > targetPairsPerBlock)
      .orderBy(col("__pairs").desc)
      .limit(maxHotBlocks + 1)
      .collect()
    if (hot.isEmpty) SaltPlan(1, Seq.empty, global = false)
    else {
      val maxPairs = hot.map(_.getLong(1)).max
      val salts = math.min(maxSalts.toLong,
        (maxPairs + targetPairsPerBlock - 1) / targetPairsPerBlock).toInt
      if (hot.length > maxHotBlocks) SaltPlan(salts, Seq.empty, global = true)
      else SaltPlan(salts, hot.map(_.get(0)).toSeq, global = false)
    }
  }

  /**
   * [[blockedFuzzyJoin]] under a [[SaltPlan]]: hot blocks take the
   * salted path, the rest join un-replicated, results unioned — the
   * SAME result set as any uniform `salts` setting (each left row still
   * meets each right row of its block exactly once; the plan only moves
   * replication). Null block keys never survive the inner equi-join on
   * either path, so the hot/cold row routing (`isin` vs its negation,
   * both null-dropping) loses no result rows.
   */
  def blockedFuzzyJoinPlanned(left: DataFrame, right: DataFrame,
      blockKey: String, leftName: Column, rightName: Column,
      maxDistance: Int, plan: SaltPlan): DataFrame =
    if (!plan.isSalted)
      blockedFuzzyJoin(left, right, blockKey, leftName, rightName, maxDistance)
    else if (plan.global || plan.hotBlocks.isEmpty)
      blockedFuzzyJoin(left, right, blockKey, leftName, rightName, maxDistance,
        salts = plan.salts)
    else {
      val hotCond = col(blockKey).isin(plan.hotBlocks: _*)
      val hotPart = blockedFuzzyJoin(
        left.filter(hotCond), right.filter(hotCond), blockKey,
        leftName, rightName, maxDistance, salts = plan.salts)
      val coldPart = blockedFuzzyJoin(
        left.filter(!hotCond), right.filter(!hotCond), blockKey,
        leftName, rightName, maxDistance)
      coldPart.unionByName(hotPart)
    }

  /** Measure-then-join: [[planSalts]] + [[blockedFuzzyJoinPlanned]]. */
  def blockedFuzzyJoinAuto(left: DataFrame, right: DataFrame,
      blockKey: String, leftName: Column, rightName: Column,
      maxDistance: Int, targetPairsPerBlock: Long = 4000000L,
      maxSalts: Int = 32): DataFrame =
    blockedFuzzyJoinPlanned(left, right, blockKey, leftName, rightName,
      maxDistance,
      planSalts(left, right, blockKey, targetPairsPerBlock, maxSalts))

  /**
   * The reference's full fuzzy-match semantics: straight first_last match at
   * distance <= 3 UNION name-flipped (last_first) match at distance <= 2,
   * deduped (fuzzy_matching_functions.R:9,41). Both passes share the
   * birth-year block. Column contract: both frames expose first/last name
   * and the block key; right side is the match target.
   */
  def fuzzyNameMatch(
      left: DataFrame, leftFirst: Column, leftLast: Column,
      right: DataFrame, rightFirst: Column, rightLast: Column,
      blockKey: String, maxDist: Int = 3, flippedMaxDist: Int = 2,
      autoSalt: Boolean = false,
      targetPairsPerBlock: Long = 4000000L): DataFrame = {
    val lName = concat_ws("_", annihilate(leftFirst), annihilate(leftLast))
    val rName = concat_ws("_", annihilate(rightFirst), annihilate(rightLast))
    val rFlip = concat_ws("_", annihilate(rightLast), annihilate(rightFirst))

    // one stats pass serves both passes: straight and flipped share the
    // frames and the block, so their pair-mass geometry is identical
    val plan =
      if (autoSalt) planSalts(left, right, blockKey, targetPairsPerBlock)
      else SaltPlan(1, Seq.empty, global = false)
    val straight = blockedFuzzyJoinPlanned(
      left, right, blockKey, lName, rName, maxDist, plan)
    val flipped = blockedFuzzyJoinPlanned(
      left, right, blockKey, lName, rFlip, flippedMaxDist, plan)
    val unioned = straight.unionByName(flipped)
    // Dedup on PAIR IDENTITY (all columns except distance), keeping the
    // best distance: a pair matched by both passes carries two different
    // distances, which an all-column dropDuplicates cannot collapse.
    val identity = unioned.columns.filterNot(_ == "distance")
    unioned
      .withColumn("__rn", row_number().over(
        Window.partitionBy(identity.map(col).toIndexedSeq: _*)
          .orderBy(col("distance"))))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
