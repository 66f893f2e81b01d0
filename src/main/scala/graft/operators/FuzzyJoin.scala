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
   * @return left columns + right columns + "distance"
   */
  def blockedFuzzyJoin(
      left: DataFrame, right: DataFrame, blockKey: String,
      leftName: Column, rightName: Column, maxDistance: Int): DataFrame = {
    // Caller contract: column names disjoint apart from blockKey.
    val l = left.withColumn("__lname", leftName)
    val r = right.withColumn("__rname", rightName)
      .withColumnRenamed(blockKey, "__rblock")
    // Pure equi-join on the block; a CHEAP length pre-filter prunes pairs
    // before the DP kernel runs (|len(a)-len(b)| > k implies osa > k),
    // then ONE osa_distance evaluation per surviving pair (putting the
    // distance predicate in the join condition would evaluate it twice:
    // once as join filter, once for the column).
    l.join(r, col(blockKey) === col("__rblock"))
      .filter(abs(length(col("__lname")) - length(col("__rname"))) <= maxDistance)
      .withColumn("distance", osa_distance(col("__lname"), col("__rname")))
      .filter(col("distance") <= maxDistance)
      .drop("__lname", "__rname", "__rblock")
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
