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
   * The reference's full fuzzy-match semantics: straight first_last match at
   * distance <= 3 UNION name-flipped (last_first) match at distance <= 2,
   * deduped (fuzzy_matching_functions.R:9,41). Both passes share the
   * birth-year block. Column contract: both frames expose first/last name
   * and the block key; right side is the match target.
   */
  def fuzzyNameMatch(
      left: DataFrame, leftFirst: Column, leftLast: Column,
      right: DataFrame, rightFirst: Column, rightLast: Column,
      blockKey: String, maxDist: Int = 3, flippedMaxDist: Int = 2): DataFrame = {
    val lName = concat_ws("_", annihilate(leftFirst), annihilate(leftLast))
    val rName = concat_ws("_", annihilate(rightFirst), annihilate(rightLast))
    val rFlip = concat_ws("_", annihilate(rightLast), annihilate(rightFirst))

    val straight = blockedFuzzyJoin(left, right, blockKey, lName, rName, maxDist)
    val flipped = blockedFuzzyJoin(left, right, blockKey, lName, rFlip, flippedMaxDist)
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
