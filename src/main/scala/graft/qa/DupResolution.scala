package graft.qa

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Q6 — the duplicate-resolution decision tree (SURVEY §2.8,
 * scripts/QA/QA_for_review.Rmd:226-467, scripts/QA/QA_DUPLICATES.Rmd:
 * 146-372): classify duplicate groups by whether they collapse to one
 * case (same-case) or span cases (cross-case), then route each row to
 * remove / manual_review / roster, clearing flags for survivors. One
 * window pass per grading key — the shuffles are on the dup keys only.
 */
object DupResolution {

  /**
   * Grade duplicates on `dupKey` within `caseKey` scope (A9/A12):
   *  - "unique": no duplicate
   *  - "same_case": dup group confined to one case — keep first, drop rest
   *  - "cross_case": dup group spans cases — all to manual review
   */
  def grade(df: DataFrame, dupKey: Column, caseKey: Column): DataFrame = {
    val wDup = Window.partitionBy(dupKey)
    df
      .withColumn("__n", count(lit(1)).over(wDup))
      .withColumn("__ncase", size(collect_set(caseKey).over(wDup)))
      .withColumn("dup_grade",
        when(col("__n") === 1, "unique")
          .when(col("__ncase") === 1, "same_case")
          .otherwise("cross_case"))
      .drop("__n", "__ncase")
  }

  /**
   * The routing tree: unique → roster; same_case → deterministic first
   * survives to roster (flag cleared), rest removed; cross_case → manual
   * review. `order` makes the survivor deterministic (SURVEY §7.4#2).
   */
  def resolve(df: DataFrame, dupKey: Column, caseKey: Column,
      order: Seq[Column] = Seq.empty): DataFrame = {
    val graded = grade(df, dupKey, caseKey)
    // default tie-break: caseKey is CONSTANT within a same_case group, so
    // add a content hash of the whole row — otherwise the survivor is
    // non-deterministic (the exact order-dependent-dedup bug this module
    // exists to fix, SURVEY §7.4#2)
    val tieBreak =
      if (order.nonEmpty) order
      else Seq(caseKey, xxhash64(df.columns.map(col).toIndexedSeq: _*))
    val w = Window.partitionBy(dupKey).orderBy(tieBreak: _*)
    graded
      .withColumn("__rn", row_number().over(w))
      .withColumn("resolution",
        when(col("dup_grade") === "unique", "roster")
          .when(col("dup_grade") === "same_case" && col("__rn") === 1, "roster")
          .when(col("dup_grade") === "same_case", "remove")
          .otherwise("manual_review"))
      .drop("__rn")
  }
}
