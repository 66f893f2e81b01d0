package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Multi-way row routing (SURVEY P5): the reference partitions every batch
 * into roster / fuzzy / keep_na / for_review via sequential subsetting
 * (docs/notebooks/template_submitters.Rmd:687-704,836-917). Here it is one
 * `disposition` column computed in a single pass — each sink then filters
 * on its value, so the expensive upstream plan is shared (and with
 * `persist`, scanned once).
 */
object Routing {

  /**
   * First-match-wins disposition: rules are (name, predicate) evaluated in
   * order; rows matching none get `default`. Mirrors dplyr case_when.
   */
  def disposition(rules: Seq[(String, Column)], default: String): Column =
    rules.foldRight(lit(default): Column) { case ((name, pred), els) =>
      when(pred, lit(name)).otherwise(els)
    }

  /** Attach the disposition column. */
  def route(df: DataFrame, rules: Seq[(String, Column)], default: String,
      colName: String = "disposition"): DataFrame =
    df.withColumn(colName, disposition(rules, default))

  /**
   * Partition-completeness invariant (SURVEY §5#1, elr.Rmd:321-323): every
   * row lands in exactly one route. True by construction for `disposition`
   * (when/otherwise is total and exclusive); exposed for conservation
   * checks after manual splits.
   */
  def conservationHolds(whole: DataFrame, parts: Seq[DataFrame]): Boolean =
    whole.count() == parts.map(_.count()).sum
}
